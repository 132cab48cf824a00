package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality filtering (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data", arXiv:1911.00359): score every document by its perplexity
  * under a LM trained on a trusted corpus (CCNet: Wikipedia KenLM),
  * then bucket each language's documents into head/middle/tail
  * perplexity terciles — the standard crawl-quality split.
  *
  * The LM here is the repo's hashed-n-gram family ([[Dsir]] — CCNet's
  * KenLM is out of scope in a no-deps engine, and the hashed-gram model
  * keeps BOTH training and scoring at a bounded (numBuckets)-row model
  * table no matter the corpus size): train = ONE corpus pass over the
  * trusted slice ([[Dsir.bucketCounts]]), score = one broadcast join +
  * per-doc integer sum. Per-gram negative log probs are quantized to
  * positive integer micro-nats per BUCKET (numBuckets quantization
  * points), so per-doc sums are exact integers under any aggregation
  * order, and the per-doc MEAN (the length-normalized perplexity proxy:
  * ppl = exp(mean_nll)) is one positive integer division — replayable
  * bit-exactly by a SQL engine.
  *
  * Tercile assignment at 100 TB: scores are bounded integers, so exact
  * per-language thresholds come from a (value → count) census —
  * numBuckets·quantum distinct values at most, KB-sized per language —
  * never from a global sort. The declared query (t13) uses ntile() over
  * per-language partitions because the oracle needs a closed SQL form;
  * the census route is the deployment path when one language is a
  * significant share of the corpus.
  */
object Perplexity {

  /** Per-document negative log-likelihood under the hashed-n-gram LM
    * whose occurrence census is `lmCounts` ((bucket, cnt), from
    * [[Dsir.bucketCounts]] over the trusted corpus). Laplace-smoothed:
    * nll_term(b) = −ln((cnt(b)+1)/(tot+numBuckets)), quantized to
    * floor(term·10^quantDigits + 0.5) — positive integers. Returns one
    * row per input doc: (idCol, nll = Σ terms, n_grams, mean_nll = nll
    * div n_grams; gram-less docs score (0, 0, 0)). Plan: broadcast of
    * the numBuckets-row model, map-side partial sums, one row per doc
    * out — one scoring scan at any scale. */
  def nll(docs: DataFrame, idCol: String, textCol: String,
          lmCounts: DataFrame, n: Int, numBuckets: Int,
          quantDigits: Int = 6): DataFrame = {
    val spark = lmCounts.sparkSession
    val q = math.pow(10.0, quantDigits)
    val buckets = spark.range(numBuckets).select(col("id").as("bucket"))
    val tot = lmCounts.agg(coalesce(sum(col("cnt")), lit(0L)).as("tt"))
    val model = buckets
      .join(lmCounts.select(col("bucket"), col("cnt").as("c")), Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        floor(-log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
                   (col("tt") + numBuckets).cast("double")) * q + 0.5)
          .cast("long").as("d"))
    Dsir.scoreByModel(docs, idCol, textCol, n, numBuckets, model)
      .select(col(idCol), col("score").as("nll"), col("n_grams"),
        when(col("n_grams") > 0, expr("score div n_grams"))
          .otherwise(lit(0L)).as("mean_nll"))
  }
}
