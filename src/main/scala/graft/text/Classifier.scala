package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality/topic filtering — the trained-classifier stage of
  * the modern pretraining recipe (DCLM, arXiv:2406.11794, and
  * FineWeb-Edu, arXiv:2406.17557, train a fastText-family linear
  * classifier on a small labeled set, score the whole crawl, keep the
  * top slice). The reference repo has no counterpart; this rounds out
  * the engine's filter surface next to the heuristic (Gopher/C4) and
  * LM-perplexity (CCNet) stages.
  *
  * The model is multinomial Naive Bayes over hashed bag-of-n-grams —
  * the classic trained text filter (Joulin et al. 2017 §2 note that a
  * linear bag-of-words classifier with log-count features is the right
  * baseline family; NB is its closed-form member, McCallum & Nigam
  * 1998). NB was chosen over iterative training deliberately: a
  * full-batch perceptron was measured to OSCILLATE on shared-vocabulary
  * corpora (the classic batch-perceptron instability — each epoch's
  * update flips the dense shared-word weights), while NB is closed-form
  * — no epochs, no learning rate, nothing to tune or to diverge.
  *
  * Distributed shape (the whole point at 100 TB):
  *  - training is ONE corpus pass: a (label, bucket) gram census plus a
  *    (label) doc census, both map-side combined, producing a DENSE
  *    C×(numBuckets+1) weight table (C = #classes) — bounded model
  *    state regardless of corpus size, exactly like [[Dsir]]'s hashed
  *    LM censuses;
  *  - per-bucket weights are Laplace-smoothed log-probabilities
  *    quantized to integers (floor(ln(p)·10^q + 0.5), the x17/t13
  *    discipline), so per-doc class scores are INTEGER sums — exact
  *    under any aggregation order and replayable in plain SQL;
  *  - prediction is one scan: explode grams, broadcast-join the model,
  *    partial-aggregate per (doc, class), argmax with a deterministic
  *    (score, label) tiebreak. No shuffle wider than one row per doc
  *    per class.
  */
object Classifier {

  /** Hashed bag-of-n-grams feature rows (idCol, bucket, cnt) with one
    * constant bias feature at bucket = numBuckets per document — the
    * bias carries the class PRIOR at prediction time, and guarantees
    * gram-less documents still receive a score for every class. Gram
    * hashing is the repo-wide 60-bit md5 prefix
    * ([[org.apache.spark.sql.graftx.NgramHash]]) — engine-replayable. */
  def features(docs: DataFrame, idCol: String, textCol: String,
               n: Int, numBuckets: Int): DataFrame = {
    val grams = Dsir.explodedBuckets(docs, Seq(idCol), textCol, n, numBuckets)
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
    val bias = docs.select(col(idCol), lit(numBuckets.toLong).as("bucket"),
      lit(1L).as("cnt"))
    grams.unionByName(bias)
  }

  /** Train multinomial NB: returns the dense (label, bucket, w) weight
    * table — for bucket < numBuckets, w = ⌊ln((cnt_cb+1)/(tot_c+numBuckets))
    * ·10^quantDigits + 0.5⌋ (Laplace-smoothed class-conditional gram
    * log-prob); the bucket = numBuckets row carries the class prior
    * ⌊ln(ndocs_c/N)·10^quantDigits + 0.5⌋, matched to [[features]]'s
    * constant bias feature. C×(numBuckets+1) rows total — broadcastable
    * at any corpus size. One corpus pass (the gram census); every other
    * frame is class-count sized. */
  def trainNaiveBayes(labeled: DataFrame, labelCol: String, textCol: String,
                      n: Int, numBuckets: Int,
                      quantDigits: Int = 6): DataFrame = {
    val spark = labeled.sparkSession
    val q = math.pow(10.0, quantDigits)
    val grams = Dsir.explodedBuckets(labeled, Seq(labelCol), textCol, n, numBuckets)
    // ONE gram census; totals derive from it (Σ_b cnt_cb == gram count
    // per class, exact integers) instead of a second tokenize pass, and
    // the ≤ C×numBuckets-row census is materialized so neither consumer
    // re-runs the corpus pass (guide §2.3/§5)
    val counts = grams.groupBy(col(labelCol), col("bucket"))
      .agg(count(lit(1)).as("c")).localCheckpoint(true)
    val totals = counts.groupBy(col(labelCol)).agg(sum(col("c")).as("t"))
    // same collapse for the priors: N == Σ_c ndocs_c, so one labeled
    // scan feeds both (the C-row census is materialized once)
    val ndocs = labeled.groupBy(col(labelCol)).agg(count(lit(1)).as("nd"))
      .localCheckpoint(true)
    val nAll = ndocs.agg(sum(col("nd")).as("n"))
    val grid = totals.select(col(labelCol))
      .crossJoin(spark.range(numBuckets).select(col("id").as("bucket")))
    val w = grid
      .join(totals, Seq(labelCol))
      .join(counts, Seq(labelCol, "bucket"), "left")
      .select(col(labelCol).as("label"), col("bucket"),
        floor(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
                  (col("t") + numBuckets).cast("double")) * q + 0.5)
          .cast("long").as("w"))
    val prior = ndocs.crossJoin(broadcast(nAll))
      .select(col(labelCol).as("label"), lit(numBuckets.toLong).as("bucket"),
        floor(log(col("nd").cast("double") / col("n").cast("double")) * q + 0.5)
          .cast("long").as("w"))
    w.unionByName(prior)
  }

  /** Predict the NB class per document: score_c = Σ_b cnt_db·w_cb
    * (the bias feature picks up the prior row), argmax over classes
    * with ties broken toward the LARGER label — the (score, label)
    * struct max, deterministic at any parallelism. The model join is
    * an inner join on bucket: the model is dense over every bucket, so
    * every feature row pairs with all C classes. Returns
    * (idCol, pred, score) — one scan, broadcast model, one row per doc
    * out. */
  def predict(docs: DataFrame, idCol: String, textCol: String,
              n: Int, numBuckets: Int, model: DataFrame): DataFrame =
    features(docs, idCol, textCol, n, numBuckets)
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("cnt") * col("w")).as("score"))
      .groupBy(col(idCol))
      .agg(max(struct(col("score"), col("label"))).as("m"))
      .select(col(idCol), col("m.label").as("pred"), col("m.score").as("score"))
}
