package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the retrieval-side segmentation a
  * RAG pipeline runs before embedding: fixed-size token windows every
  * `stride` tokens, so long documents become bounded, overlapping units
  * with stable addresses. All codegen'd built-ins (`split` / `sequence` /
  * `explode` / `slice`): at 100 TB this is map-side row explosion with no
  * shuffle — output volume is the only cost, and it is exactly
  * Σ ceil(n_tokens/stride) rows, bounded a priori by the stride choice.
  *
  * Window contract (deterministic, engine-replayable): tokens are the
  * whitespace `split` of the text; windows start at 0, stride, 2·stride,
  * ... while start ≤ n_tokens − 1; each window takes `win` tokens,
  * clamped at the end (trailing partial windows are kept — dropping them
  * would lose document tails, the one thing a retrieval index must not
  * do). Empty text yields one chunk of the empty string (split's [""]
  * convention), and NULL text coalesces to empty FIRST (split/sequence
  * would otherwise null out and explode would silently DROP the row) —
  * so every document, null-text included, has ≥ 1 address.
  */
object Chunk {

  /** Explode `textCol` into chunk rows: all original columns plus
    * `chunk_idx` (0-based window ordinal), `chunk_ntok` (tokens in this
    * window, ≤ win), and `chunk_text` (the window re-joined by single
    * spaces). */
  def slidingWindows(df: DataFrame, textCol: String, win: Int, stride: Int): DataFrame = {
    require(win >= 1, s"win must be >= 1, got $win")
    require(stride >= 1 && stride <= win,
      s"stride must be in [1, win] (gaps would drop tokens), got stride=$stride win=$win")
    val reserved = Seq("chunk_idx", "chunk_ntok", "chunk_text", "__toks", "__start")
    reserved.foreach(r => require(!df.columns.contains(r), s"column $r is reserved"))
    val toks = split(coalesce(col(textCol), lit("")), " ")
    df.withColumn("__toks", toks)
      .withColumn("__start",
        explode(sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)), lit(stride))))
      .withColumn("chunk_idx", (col("__start") / stride).cast("int"))
      .withColumn("chunk_ntok",
        least(size(col("__toks")) - col("__start"), lit(win)).cast("int"))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__toks"), col("__start") + 1, lit(win))))
      .drop("__toks", "__start")
  }

  /** SENTENCE-window chunking — [[slidingWindows]] with sentences as the
    * unit (the RAG variant that never cuts mid-sentence): `win` sentences
    * every `stride`. Sentence boundaries are terminator runs ([.!?]+)
    * followed by spaces; the split is a two-step sentinel rewrite —
    * `regexp_replace("([.!?]+) +", "$1\u0001")` then split on U+0001 —
    * because a lookbehind split would keep terminators but RE2 engines
    * (the oracle) have no lookbehind; the sentinel form preserves every
    * terminator VERBATIM in its sentence on both engines. Same window
    * contract as the token form: trailing partials kept, NULL text
    * coalesces to one empty chunk, starts at 0, stride, 2·stride, ….
    * Adds `chunk_idx`, `chunk_nsent`, `chunk_text` (sentences re-joined
    * by single spaces). Map-side explosion, no shuffle. */
  def bySentences(df: DataFrame, textCol: String, win: Int, stride: Int): DataFrame = {
    require(win >= 1, s"win must be >= 1, got $win")
    require(stride >= 1 && stride <= win,
      s"stride must be in [1, win] (gaps would drop sentences), got stride=$stride win=$win")
    val reserved = Seq("chunk_idx", "chunk_nsent", "chunk_text", "__sents", "__start")
    reserved.foreach(r => require(!df.columns.contains(r), s"column $r is reserved"))
    val sents = split(
      regexp_replace(coalesce(col(textCol), lit("")), "([.!?]+) +", "$1\u0001"),
      "\u0001")
    df.withColumn("__sents", sents)
      .withColumn("__start",
        explode(sequence(lit(0), greatest(size(col("__sents")) - 1, lit(0)), lit(stride))))
      .withColumn("chunk_idx", (col("__start") / stride).cast("int"))
      .withColumn("chunk_nsent",
        least(size(col("__sents")) - col("__start"), lit(win)).cast("int"))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__sents"), col("__start") + 1, lit(win))))
      .drop("__sents", "__start")
  }
}
