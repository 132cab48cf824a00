package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Compaction planning — the small-file problem's scheduling half
  * (Delta/Iceberg OPTIMIZE, Hive concatenate): given a file census
  * (name, bytes), assign files to rewrite bins of ~`targetBytes` each.
  *
  * The assignment is cumulative-sum binning in a deterministic order:
  * bin = ⌊(exclusive prefix sum of bytes) / target⌋ within each group —
  * the in-order first-fit approximation every table-format optimizer
  * ships (a bin may overflow by at most one file; only the last bin may
  * underflow). Deterministic order makes the plan REPRODUCIBLE: two
  * planners looking at the same census emit the same bins, so a
  * re-planned retry rewrites the same files.
  *
  * Scale shape: the census input is file-count-sized (metadata, not
  * data — one row per file even at 100 TB); the prefix sum is one
  * window pass per group ordered by the file key, the same
  * partition-bounded discipline as [[GapFill]]; everything downstream
  * (the actual rewrites) is driven off the bin table. No data files
  * are read to PLAN compaction.
  */
object Compaction {

  /** Assign each file row to a bin: `bin` = exclusive-prefix-sum of
    * `bytesCol` div `targetBytes`, within `groupCol` ordered by
    * `orderCol` (must be unique per group for determinism). */
  def binBySize(census: DataFrame, groupCol: Column, orderCol: Column,
                bytesCol: Column, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"need targetBytes >= 1 (got $targetBytes)")
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
    val cumBefore = sum(bytesCol).over(w) - bytesCol
    census.withColumn("__cb", cumBefore)
      .withColumn("bin", ((col("__cb") - pmod(col("__cb"), lit(targetBytes)))
        / targetBytes).cast("long"))
      .drop("__cb")
  }
}
