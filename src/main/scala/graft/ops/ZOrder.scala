package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout compaction — the physical-design
  * operator behind multi-dimensional data skipping (Delta/Iceberg
  * `OPTIMIZE ZORDER`, the classic Morton 1966 curve): interleaving the
  * bits of two sort keys produces a 1-D order in which rows close in
  * BOTH dimensions land close on disk, so per-file/row-group min-max
  * stats prune 2-D box predicates that a lexicographic sort can only
  * prune on its leading column.
  *
  * Scale rationale: at 100 TB the scan you avoid is the cheapest scan.
  * A table range-partitioned + sorted by z-value gives every file a
  * small bounding BOX in (a, b) space — a query like
  * `a BETWEEN x AND x' AND b BETWEEN y AND y'` skips every file whose
  * box misses the query box, on BOTH dimensions at once (ZOrderSpec
  * measures the locality: z-ordered chunk bounding boxes cover a small
  * fraction of the natural-order ones). The z-value itself is a pure
  * integer bit-interleave — codegen-friendly, shuffle-free, and
  * replayable in plain SQL (query `x25_zorder`).
  */
object ZOrder {

  /** Morton z-value of the low `bits` bits of two non-negative keys:
    * z = Σ_j bit_j(a)·4^j·1 + bit_j(b)·4^j·2 — a's bits at even
    * positions, b's at odd. 2·bits ≤ 62 keeps every term exact in a
    * signed 64-bit integer in any engine. */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { j =>
      shiftright(a, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j)) +
        shiftright(b, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1))
    }.reduce(_ + _)
  }

  /** The OPTIMIZE ZORDER shape: range-partition by z-value (so files
    * hold contiguous z-runs — range boundaries come from Spark's
    * reservoir sampling of the z column) and sort within partitions (so
    * row groups inside each file are z-contiguous too). Appends `zCol`;
    * the caller writes the result. */
  def compact(df: DataFrame, a: Column, b: Column, bits: Int,
              numFiles: Int, zCol: String = "__z"): DataFrame =
    df.withColumn(zCol, zValue2(a, b, bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(col(zCol))
}
