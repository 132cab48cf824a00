package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sketch.Kmv

/** Stupid Backoff LM scoring (Brants et al. 2007, "Large Language
  * Models in Machine Translation" §4) — THE distributed-first language
  * model: the score S(w_i | w_{i-1}) = c(w_{i-1} w_i)/c(w_{i-1}) when
  * the bigram was seen, else α·c(w_i)/N, needs NO normalization pass,
  * which is exactly why Google ran it over MapReduce counts instead of
  * Kneser-Ney. Here both count tables are hashed-bucket censuses
  * ([[Dsir.bucketCounts]]): the model is ≤ 2·numBuckets + 1 rows no
  * matter the corpus size, broadcastable everywhere, and scoring is
  * one scan with three broadcast joins (bigram, prev-unigram,
  * cur-unigram buckets) — no shuffle touches the corpus.
  *
  * Determinism discipline (x17/t13): each position's −ln score is
  * quantized to integer micro-nats, so per-doc and per-group sums are
  * aggregation-order-proof; the backoff branch is Laplace-adjusted
  * (α·(c+1)/(N+numBuckets)) so it is defined for unseen unigrams.
  * Bucket collisions can make c(bigram) > c(prev) — the score then
  * goes negative (probability > 1), harmless in integers and faithfully
  * replayed; the bigram branch fires only when BOTH its counts are
  * present so the log is always defined.
  *
  * Returns one row per input doc: (idCol, score, n_pos, n_backoff);
  * docs with < 2 tokens score (0, 0, 0). */
object StupidBackoff {

  def score(docs: DataFrame, idCol: String, textCol: String,
            lmBi: DataFrame, lmUni: DataFrame, numBuckets: Int,
            alpha: Double = 0.4, quantDigits: Int = 6): DataFrame = {
    val q = math.pow(10.0, quantDigits)
    val b = lit(numBuckets.toLong)
    val tot = lmUni.agg(coalesce(sum(col("cnt")), lit(0L)).as("tt"))
    val pairs = docs
      .select(col(idCol), split(col(textCol), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS p, tk[i] AS c))")).as("pc"))
      .select(col(idCol),
        pmod(Kmv.hash60(concat(col("pc.p"), lit(" "), col("pc.c"))), b).as("bb"),
        pmod(Kmv.hash60(col("pc.p")), b).as("bp"),
        pmod(Kmv.hash60(col("pc.c")), b).as("bc"))
    val seen = coalesce(col("cb"), lit(0L)) > 0 && coalesce(col("cp"), lit(0L)) > 0
    val dSeen =
      floor(-log(col("cb").cast("double") / col("cp").cast("double")) * q + 0.5)
        .cast("long")
    val dBack =
      floor(-log(lit(alpha) * (coalesce(col("cc"), lit(0L)) + 1).cast("double") /
                 (col("tt") + numBuckets).cast("double")) * q + 0.5)
        .cast("long")
    val perDoc = pairs
      .join(broadcast(lmBi.select(col("bucket").as("bb"), col("cnt").as("cb"))),
        Seq("bb"), "left")
      .join(broadcast(lmUni.select(col("bucket").as("bp"), col("cnt").as("cp"))),
        Seq("bp"), "left")
      .join(broadcast(lmUni.select(col("bucket").as("bc"), col("cnt").as("cc"))),
        Seq("bc"), "left")
      .crossJoin(broadcast(tot))
      .select(col(idCol),
        when(seen, dSeen).otherwise(dBack).as("d"),
        when(seen, lit(0L)).otherwise(lit(1L)).as("bo"))
      .groupBy(col(idCol))
      .agg(sum(col("d")).as("score"), count(lit(1)).as("n_pos"),
           sum(col("bo")).as("n_backoff"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("score"), lit(0L)).as("score"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_backoff"), lit(0L)).as("n_backoff"))
  }
}
