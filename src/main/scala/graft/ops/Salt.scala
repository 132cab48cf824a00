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

  /** Sketch-driven salt factor — the skew DECISION made from data
    * instead of a caller's guess (SCALE.md's "probe join keys against
    * the sketch before choosing a salt factor", now a first-class
    * operator): build a count-min sketch over the grouping key (ONE
    * corpus pass, ≤ d·w-row model), bound the hottest key's row count
    * by min over rows of (max bucket counter) — for every hash row the
    * hot key lands in SOME bucket, so each row-max ≥ the true hot
    * count and the min of row-maxes is a certified OVER-estimate:
    * auto-salting can never under-split a hot key — then
    * factor = clamp(⌈estMax / targetRowsPerTask⌉, 1, maxFactor).
    * Driver-side decision off a bounded model (the
    * removeFrequentLines census-decision discipline). */
  def autoFactor(df: DataFrame, keyCol: Column, targetRowsPerTask: Long,
                 d: Int = 4, w: Int = 1024, maxFactor: Int = 1024): Int = {
    require(targetRowsPerTask >= 1, s"targetRowsPerTask must be >= 1")
    val cm = graft.sketch.CountMin.table(df, keyCol, d, w)
    val estMax = cm.groupBy(col("row")).agg(max(col("cnt")).as("m"))
      .agg(min(col("m")).as("est")).collect()(0).getLong(0)
    math.min(maxFactor.toLong,
      math.max(1L, (estMax + targetRowsPerTask - 1) / targetRowsPerTask)).toInt
  }

  /** Skew-safe equi-join: the big (hot-keyed) side gets a deterministic
    * salt from a high-cardinality column and the small side is
    * replicated across all salt buckets, so the effective join key
    * (keys :+ salt) spreads a hot key over `saltBuckets` reducers
    * instead of one. Costs saltBuckets× the small side's shuffle volume
    * — use when the small side is too big to broadcast outright but a
    * replication factor is still cheap, or where AQE's runtime skew
    * split can't reach (e.g. stream-static joins). Inner join; key
    * columns must share names across both sides.
    */
  def saltedJoin(big: DataFrame,
                 small: DataFrame,
                 keys: Seq[String],
                 saltOn: Column,
                 saltBuckets: Int = 32): DataFrame = {
    val b = big.withColumn("__salt", pmod(hash(saltOn), lit(saltBuckets)))
    val sm = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit(_)): _*)))
    b.join(sm, keys :+ "__salt").drop("__salt")
  }
}
