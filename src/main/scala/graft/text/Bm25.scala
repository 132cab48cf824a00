package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** BM25 ranked retrieval over a document corpus — the retrieval-based
  * curation primitive (score every document against a query, keep the
  * top-k): used for targeted data selection ("find docs about X"),
  * retrieval-augmented dedup audits, and eval-set neighborhood mining.
  *
  * Okapi BM25 (Robertson & Zaragoza 2009, §3.3):
  *   score(d, q) = Σ_{t∈q} idf(t) · tf(t,d)·(k1+1) /
  *                          (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  * with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene form,
  * always positive).
  *
  * Determinism discipline (the x17/t13 pattern): each per-(doc, term)
  * contribution is quantized to integer micro-units BEFORE the per-doc
  * sum, so the score is an aggregation-order-proof integer sum — the
  * same answer at any parallelism, replayable bit-for-bit by another
  * engine evaluating the same closed-form doubles.
  *
  * Scale shape: the token stream is FILTERED to the query's terms
  * before any aggregation (isin pushes into the scan), so the per-term
  * tf/df tables are O(matching docs), never O(vocabulary); the corpus
  * stats (N, avgdl) are a 1-row broadcast; the per-doc score sum is one
  * partial-aggregated groupBy and the top-k is a TakeOrderedAndProject
  * (no full sort). Nothing materializes per-vocabulary state.
  */
object Bm25 {

  /** Top-k docs for one query (a bag of terms). Returns
    * (rk, id, score) with `score` the integer micro-unit BM25 sum.
    * Tokenization is whitespace; terms are matched exactly. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct.size == queryTerms.size,
      "queryTerms must be distinct (BM25 term frequency is per unique term)")
    val toks = docs.select(col(idCol).as("id"),
        size(split(col(textCol), " ")).cast("long").as("dl"),
        explode(split(col(textCol), " ")).as("tok"))
    // corpus stats: one 1-row broadcastable frame
    val stats = docs.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(size(split(col(textCol), " ")).cast("long")).as("total_len"))
    // per-(doc, query term) tf over the FILTERED token stream
    val tf = toks.filter(col("tok").isin(queryTerms: _*))
      .groupBy(col("id"), col("tok"))
      .agg(count(lit(1)).cast("long").as("tf"), max(col("dl")).as("dl"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).cast("long").as("df"))
    val nD = col("n_docs").cast("double")
    val idf = log(
      (nD - col("df").cast("double") + 0.5) / (col("df").cast("double") + 0.5) + 1.0)
    val avgdl = col("total_len").cast("double") / nD
    val tfD = col("tf").cast("double")
    val contrib = idf * tfD * lit(k1 + 1.0) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val perTerm = tf.join(broadcast(df), Seq("tok"))
      .crossJoin(broadcast(stats))
      .select(col("id"),
        floor(contrib * 1e6 + 0.5).cast("long").as("c"))
    val scored = perTerm.groupBy(col("id")).agg(sum(col("c")).as("score"))
    // top-k via sort+limit = TakeOrderedAndProject (no global sort);
    // the rank window then runs over the k-row result only
    val top = scored.orderBy(col("score").desc, col("id")).limit(k)
    val w = Window.orderBy(col("score").desc, col("id"))
    top.withColumn("rk", row_number().over(w))
      .select(col("rk"), col("id"), col("score"))
  }
}
