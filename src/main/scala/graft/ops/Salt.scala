package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation: salt the grouping key, partially
  * aggregate per (key, salt), then aggregate the partials per key.
  *
  * For algebraic aggregates Spark's map-side partial aggregation already
  * combines before the shuffle, so plain `groupBy` rarely skews — the
  * salt matters when (a) per-key reduce state is heavy (holistic aggs,
  * large collect buffers, high-cardinality distinct counting under one
  * hot key) or (b) AQE skew handling is unavailable. The two-phase plan
  * bounds any single reducer's input to ~1/saltBuckets of the hot key.
  */
object Salt {

  /** Sum/count aggregation with a salted first phase. Output columns:
    * keys ++ ("n" row count) ++ one column per named sum. Results are
    * identical to the unsalted `groupBy(keys).agg(...)` (integer sums
    * are reorder-free; quantize doubles first — see Queries.quant).
    *
    * @param saltOn high-cardinality column (e.g. an id) hashed into
    *               `saltBuckets` buckets to split hot keys
    */
  def saltedSumCount(df: DataFrame,
                     keys: Seq[String],
                     sums: Seq[(String, Column)],
                     saltOn: Column,
                     saltBuckets: Int = 32): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(saltOn), lit(saltBuckets)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"),
           sums.map { case (n, c) => sum(c).as(s"__s_$n") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum("__n").as("n"),
           sums.map { case (n, _) => sum(s"__s_$n").as(n) }: _*)
  }
}
