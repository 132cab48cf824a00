package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines. */
object Sample {

  /** Exact-size stratified sample: within each stratum, keep the
    * `ceil(fraction * N_stratum)` rows with the smallest md5 hash of
    * `idCol` (tiebroken by the id itself). Hash-ordered selection makes
    * the sample (a) deterministic across runs and cluster sizes,
    * (b) stable under data growth — a row stays sampled until enough
    * smaller-hash rows arrive — and (c) reproducible by any engine with
    * md5 (the DuckDB oracle recomputes it exactly).
    *
    * One shuffle (by stratum) serves both the per-stratum count and the
    * rank. Strata are assumed to fit a task's sort (documents per
    * language at 100 TB: salt-split or switch to approximate per-row
    * hash-threshold sampling via [[hashFraction]] when a stratum is a
    * significant share of the data).
    */
  def stratifiedExact(df: DataFrame,
                      strata: Seq[String],
                      idCol: Column,
                      fraction: Double): DataFrame = {
    val part = Window.partitionBy(strata.map(col): _*)
    val byHash = part.orderBy(graft.sketch.Kmv.hash60(idCol).asc, idCol.asc)
    df.withColumn("__nt", count(lit(1)).over(part))
      .withColumn("__rn", row_number().over(byHash))
      .filter(col("__rn") <= ceil(col("__nt") * fraction))
      .drop("__nt", "__rn")
  }

  /** Approximate fraction sample, fully per-row (no shuffle, no state):
    * keep rows whose hash bucket falls below `fraction` of the bucket
    * space. The scale path when exact stratum sizes don't matter. */
  def hashFraction(df: DataFrame, idCol: Column, fraction: Double, buckets: Int = 1000000): DataFrame =
    df.filter(pmod(graft.sketch.Kmv.hash60(idCol), lit(buckets.toLong)) < lit((fraction * buckets).toLong))
}
