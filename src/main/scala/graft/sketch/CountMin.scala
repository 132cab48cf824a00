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

  /** Per-row sketch estimate WITHOUT a shuffle: d broadcast hash joins
    * against the ≤ d·w-row counter table (one per hash row, each keyed
    * on that row's bucket), then `least` across the d probed counters —
    * every step map-side, the stream never exchanges. Appends `est`. */
  def estimateMapSide(df: DataFrame, valueCol: Column, cm: DataFrame,
                      d: Int, w: Int): DataFrame = {
    // the scratch names below would silently REPLACE same-named input
    // columns (withColumn semantics) and corrupt downstream grouping —
    // reject up front instead (round-9 advice)
    val reserved = ("est" :: "__v" ::
      (0 until d).flatMap(j => Seq(s"__pb$j", s"__b$j", s"__c$j")).toList).toSet
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"estimateMapSide reserves column names [${clash.mkString(", ")}] — rename them in the input")
    (0 until d).foldLeft(df.withColumn("__v", valueCol.cast("string"))) {
      case (acc, j) =>
        val cmj = cm.filter(col("row") === j)
          .select(col("bucket").as(s"__b$j"), col("cnt").as(s"__c$j"))
        acc.withColumn(s"__pb$j", bucket(col("__v"), j, w))
          .join(broadcast(cmj), col(s"__pb$j") === col(s"__b$j"), "left")
          .drop(s"__pb$j", s"__b$j")
    }
      .withColumn("est",
        least((0 until d).map(j => coalesce(col(s"__c$j"), lit(0L))): _*))
      .drop(((0 until d).map(j => s"__c$j") :+ "__v"): _*)
  }

  /** Heavy hitters ≥ `threshold` via the classic sketch-prefilter
    * two-pass: pass 1 builds the sketch; pass 2 evaluates the estimate
    * MAP-SIDE ([[estimateMapSide]]) and drops every row whose
    * over-count is already below the threshold BEFORE the exact
    * groupBy — so the exact pass shuffles only candidate rows (true
    * heavy hitters + the sketch's bounded false positives), not the
    * corpus. The over-count guarantee (est ≥ true count) makes the
    * prefilter lossless: no true heavy hitter is ever dropped.
    * Returns (value, exact, est) for values with exact ≥ threshold. */
  def heavyHitters(df: DataFrame, valueCol: Column, d: Int, w: Int,
                   threshold: Long): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1 (got $threshold)")
    // materialize the ≤ d·w-row sketch ONCE: estimateMapSide broadcasts
    // one per-row slice of it per hash row, and each broadcast would
    // otherwise re-run the corpus pass that builds it (d corpus scans
    // for a 64-row table — guide §5: persist what is reused)
    val cm = table(df, valueCol, d, w).localCheckpoint(true)
    estimateMapSide(df, valueCol, cm, d, w)
      .filter(col("est") >= threshold)
      .groupBy(valueCol.cast("string").as("value"))
      .agg(count(lit(1)).as("exact"), min(col("est")).as("est"))
      .filter(col("exact") >= threshold)
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
