package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection: score every raw document by how much its
  * hashed-n-gram profile looks like a TARGET corpus (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169) — the standard recipe for skimming the in-domain
  * slice of a crawl before pretraining.
  *
  * The paper's trick, kept exactly: n-grams hash into a FIXED number of
  * buckets, so the "language model" on each side is a bounded
  * (numBuckets)-row count table no matter how big the corpus — the two
  * census passes are plain map-side-combined groupBys, the per-doc
  * scoring is one broadcast join of that tiny model table plus a
  * partial-aggregated sum per doc. At 100 TB: two corpus scans total
  * (target census + raw census — target is usually the small curated
  * side), then one scoring scan; nothing ever shuffles wider than
  * (docs × gram rows) pre-aggregated down to one row per doc.
  *
  * Two scoring forms:
  *  - [[affinityScores]]: engine-exact integer form — Laplace-smoothed
  *    bucket probabilities quantized to integers via one floor division,
  *    summed per doc. Deterministic under ANY parallelism and replayable
  *    in SQL (the x16 oracle), at the cost of scoring on probability
  *    DIFFERENCES rather than log ratios.
  *  - [[logRatioWeights]]: the paper's log-likelihood-ratio weight,
  *    with each per-gram log ratio quantized to an integer before the
  *    sum so partial-aggregation order cannot perturb the result.
  * Hash choice is the repo-wide md5-derived 60-bit gram hash
  * ([[graft.dedup.Dedup.tokenHash]] family) — no seed state, identical
  * across engines and runs.
  */
object Dsir {

  /** Exploded (keepCols..., bucket) rows: one row per n-gram occurrence
    * (duplicates kept — DSIR models occurrence frequencies). Shared with
    * [[Perplexity]], which scores under the same hashed-gram LM family. */
  private[text] def explodedBuckets(df: DataFrame, keep: Seq[String],
                              textCol: String, n: Int,
                              numBuckets: Int): DataFrame =
    df.select(keep.map(col) :+ org.apache.spark.sql.graftx.GraftExpr
        .ngramHashes(col(textCol), n, sortedDistinct = false).as("_gh"): _*)
      .select(keep.map(col) :+ explode(col("_gh")).as("_g"): _*)
      .select(keep.map(col) :+ pmod(col("_g"), lit(numBuckets.toLong)).as("bucket"): _*)

  /** Hashed-gram occurrence census: (bucket, cnt). The "LM training"
    * step — ONE corpus pass, map-side combined, ≤ numBuckets rows out. */
  def bucketCounts(df: DataFrame, textCol: String, n: Int,
                   numBuckets: Int): DataFrame =
    explodedBuckets(df, Nil, textCol, n, numBuckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** The (numBuckets)-row model table with the per-bucket integer score
    * delta d = q_target(b) − q_raw(b), where q_X(b) =
    * (scale·(cnt_X(b)+1)) div (tot_X + numBuckets) — Laplace-smoothed,
    * floor-divided: pure integer arithmetic, bit-identical in any
    * engine. `scale` must satisfy scale·(max cnt+1) < 2^63; at very
    * large totals pick a smaller scale (scores are scale-equivariant up
    * to quantization). */
  private def modelDelta(targetCounts: DataFrame, rawCounts: DataFrame,
                         numBuckets: Int, scale: Long): DataFrame = {
    val spark = targetCounts.sparkSession
    val buckets = spark.range(numBuckets).select(col("id").as("bucket"))
    val tTot = targetCounts.agg(coalesce(sum(col("cnt")), lit(0L)).as("tt"))
    val rTot = rawCounts.agg(coalesce(sum(col("cnt")), lit(0L)).as("rt"))
    buckets
      .join(targetCounts.select(col("bucket"), col("cnt").as("tc")), Seq("bucket"), "left")
      .join(rawCounts.select(col("bucket"), col("cnt").as("rc")), Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
  }

  /** Engine-exact integer affinity score per document:
    * score = Σ_grams [q_target(bucket) − q_raw(bucket)] (see
    * [[modelDelta]]). Positive = looks more like the target corpus than
    * the raw background. Returns (idCol, score, n_grams) for EVERY input
    * doc (gram-less docs score 0). */
  def affinityScores(docs: DataFrame, idCol: String, textCol: String,
                     targetCounts: DataFrame, rawCounts: DataFrame,
                     n: Int, numBuckets: Int,
                     scale: Long = 1000000000L): DataFrame = {
    val model = modelDelta(targetCounts, rawCounts, numBuckets, scale)
      .select(col("bucket"),
        expr(s"(CAST($scale AS BIGINT) * (coalesce(tc, 0) + 1)) div (tt + $numBuckets) - " +
             s"(CAST($scale AS BIGINT) * (coalesce(rc, 0) + 1)) div (rt + $numBuckets)").as("d"))
    scoreByModel(docs, idCol, textCol, n, numBuckets, model)
  }

  /** The paper's log-likelihood-ratio importance weight,
    * weight = Σ_grams [ln p̂_target(bucket) − ln p̂_raw(bucket)] with
    * Laplace smoothing, each per-gram term quantized to
    * floor(term·10^quantDigits + 0.5) BEFORE the per-doc sum — integer
    * summation makes the result independent of partial-aggregation
    * order (doubles summed in shuffle order would not be). Returned
    * `weight` is the quantized integer; divide by 10^quantDigits for
    * the real-valued weight. */
  def logRatioWeights(docs: DataFrame, idCol: String, textCol: String,
                      targetCounts: DataFrame, rawCounts: DataFrame,
                      n: Int, numBuckets: Int,
                      quantDigits: Int = 9): DataFrame = {
    val q = math.pow(10.0, quantDigits)
    val model = modelDelta(targetCounts, rawCounts, numBuckets, 1L)
      .select(col("bucket"),
        floor((log((coalesce(col("tc"), lit(0L)) + 1).cast("double") /
                   (col("tt") + numBuckets).cast("double")) -
               log((coalesce(col("rc"), lit(0L)) + 1).cast("double") /
                   (col("rt") + numBuckets).cast("double"))) * q + 0.5)
          .cast("long").as("d"))
    scoreByModel(docs, idCol, textCol, n, numBuckets, model)
      .withColumnRenamed("score", "weight")
  }

  /** DSIR's RESAMPLING step — the paper's actual selection rule (§2.3):
    * draw `k` documents WITHOUT replacement with probability ∝
    * exp(weight) via Gumbel-top-k: key_i = w_i + g_i with g_i an i.i.d.
    * Gumbel(0,1) draw, take the k largest keys. Since our `weightCol`
    * IS the log importance ratio, exp(weight) is exactly the paper's
    * importance weight. The noise is SEEDED HASH noise (the repo's
    * g1/x2 determinism discipline, md5 so any engine replays it):
    * u = (h52 + 0.5) / 2^52, h52 = first 52 md5 bits of "id:seed" —
    * strictly inside (0,1) and exactly representable as a double, so
    * g = −ln(−ln u) is always finite (52 bits, not the repo's usual 60:
    * a 60-bit h makes (h+0.5)/2^60 round to 1.0 at the top of the
    * range, where g would blow up to +∞). The selection key is
    * quantized to an integer (`keyQuantDigits`) before the top-k so
    * cross-engine last-ulp ln() drift cannot reorder it; ties break by
    * id. orderBy(...).limit(k) compiles to TakeOrderedAndProject — a
    * per-partition top-k + k-row driver merge, no full sort, no
    * corpus-sized shuffle at any scale. Returns the selected rows:
    * (idCol, weightCol, gkey). */
  def resample(weights: DataFrame, idCol: String, weightCol: String,
               k: Int, quantDigits: Int, seed: Long,
               keyQuantDigits: Int = 6): DataFrame = {
    val h52 = conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":" + seed))), 1, 13), 16, 10).cast("long")
    val u = (h52.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val g = -log(-log(u))
    val key = col(weightCol).cast("double") / math.pow(10.0, quantDigits) + g
    weights
      .withColumn("gkey",
        floor(key * math.pow(10.0, keyQuantDigits) + lit(0.5)).cast("long"))
      .orderBy(col("gkey").desc, col(idCol))
      .limit(k)
  }

  /** Shared scoring stage: explode doc grams to buckets, broadcast-join
    * the (numBuckets)-row model, sum per doc (hash-agg partials keep the
    * shuffle at one row per doc per map partition), left-join so every
    * doc keeps a row. */
  private[text] def scoreByModel(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, numBuckets: Int,
                           model: DataFrame): DataFrame = {
    val per = explodedBuckets(docs, Seq(idCol), textCol, n, numBuckets)
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("d")).as("score"), count(lit(1)).as("n_grams"))
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("score"), lit(0L)).as("score"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"))
  }
}
