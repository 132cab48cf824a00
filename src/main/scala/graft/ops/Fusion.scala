package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
  * standard hybrid-retrieval combiner: given N ranked lists over one id
  * space (BM25 lexical, ANN semantic, recency, ...), the fused score is
  *
  *   score(id) = Σ_{lists containing id} 1 / (k0 + rank_list(id))
  *
  * — rank-based, so arms with incommensurable score scales (integer
  * micro-unit BM25 vs quantized cosine) fuse without calibration, and
  * k0 (=60 in the paper and every production system since) damps the
  * head so one arm's #1 cannot drown consensus.
  *
  * Determinism discipline (the x17/t13 pattern): each contribution is
  * the exact integer ⌊10¹²/(k0+rk)⌋ — `div` on longs, no floats — so
  * the per-id sum is aggregation-order-proof and any engine replays the
  * fused ranking bit-for-bit, ties broken (score desc, id).
  *
  * Scale shape: the inputs are ALREADY top-k lists (each arm's own
  * scale story bounds them — BM25's TakeOrderedAndProject, ANN's
  * probe-bounded postings), so fusion touches Σ|lists| ≤ N·k rows: one
  * union, one map-side-combined groupBy, and a sort+limit
  * (TakeOrderedAndProject, the [[graft.text.Bm25.topK]] pattern — the
  * rank window runs over the k-row result only, never a global
  * single-partition window over data-scale rows). */
object Fusion {

  /** Fuse ranked lists, each with columns (id, rk); rk is 1-based.
    * Returns (rk, id, score, n_arms) — `score` the integer picopart
    * RRF sum, `n_arms` how many lists contained the id. */
  def rrf(lists: Seq[DataFrame], topK: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "Fusion.rrf: no input lists")
    require(topK >= 1 && k0 >= 0, s"Fusion.rrf: bad topK=$topK / k0=$k0")
    val contribs = lists.map(_.select(col("id"),
      expr(s"1000000000000 div ($k0 + rk)").as("c")))
    val fused = contribs.reduce(_ unionAll _)
      .groupBy(col("id"))
      .agg(sum(col("c")).as("score"), count(lit(1)).as("n_arms"))
    val top = fused.orderBy(col("score").desc, col("id")).limit(topK)
    val w = Window.orderBy(col("score").desc, col("id"))
    top.withColumn("rk", row_number().over(w))
      .select(col("rk"), col("id"), col("score"), col("n_arms"))
  }
}
