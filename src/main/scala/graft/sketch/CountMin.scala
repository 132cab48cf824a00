package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — frequency
  * estimation with bounded state: d hash rows × w counters, every
  * estimate an over-count (min over rows), error ≤ εN with
  * w = ⌈e/ε⌉ at probability 1 − δ, d = ⌈ln(1/δ)⌉.
  *
  * Built RELATIONALLY, not as a UDAF: the counter matrix is literally
  * `groupBy(row, bucket).count()` over the (value × d hash rows)
  * explosion — Catalyst map-side-combines it automatically, the
  * shuffle carries ≤ d·w rows no matter the input size, and the
  * "sketch" is a d·w-row DataFrame any engine can replay (the md5
  * bucket hash is the [[Kmv.hash60]] construction). Point queries
  * never touch the corpus again: the probe set joins the counter
  * table and takes the per-probe min across rows.
  *
  * The classic 100 TB uses: heavy-hitter prefilters (probe candidate
  * keys cheaply before an exact pass), per-shard frequency summaries
  * shipped as KB-sized tables, and skew detection (probe join keys
  * against the sketch before choosing a salt factor).
  */
object CountMin {

  private def bucket(valueCol: Column, j: Int, w: Int): Column =
    pmod(Kmv.hash60(concat(lit(s"$j|"), valueCol.cast("string"))), lit(w.toLong))

  /** The counter matrix: (row, bucket, cnt), ≤ d·w rows. One pass,
    * map-side combined. */
  def table(df: DataFrame, valueCol: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 1, s"need d >= 1, w >= 1 (got d=$d, w=$w)")
    df.select(explode(array((0 until d).map(j =>
        struct(lit(j).as("row"), bucket(valueCol, j, w).as("bucket"))): _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch for each probe value: (value, est) with
    * est = min over rows of the probed counter (0 when a row's bucket
    * was never touched — only possible for values absent from the
    * build). The sketch and probes are both KB-sized broadcasts. */
  def estimate(cm: DataFrame, probes: DataFrame, valueCol: Column,
               d: Int, w: Int): DataFrame = {
    val pr = probes.select(valueCol.cast("string").as("value"))
      .withColumn("rb", explode(array((0 until d).map(j =>
        struct(lit(j).as("row"), bucket(col("value"), j, w).as("bucket"))): _*)))
      .select(col("value"), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
    pr.join(broadcast(cm), Seq("row", "bucket"), "left")
      .groupBy(col("value"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
