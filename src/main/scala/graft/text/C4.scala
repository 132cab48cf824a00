package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style page cleaning (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer", §2.2 —
  * the rule set the C4 corpus was built with, ancestor of most modern
  * web-scale pretraining filters).
  *
  * Two layers, exactly as published:
  *
  *  - LINE rules (rewrite): keep only lines that end in a terminal
  *    punctuation mark, contain at least [[Rules.minLineWords]] words,
  *    and do not mention any [[Rules.lineDropTerms]] term (C4 dropped
  *    any line with the word "javascript");
  *  - PAGE rules (drop): discard the whole page when the ORIGINAL text
  *    contains a banned phrase ("lorem ipsum"), a banned character
  *    ("{" — C4 dropped pages with curly braces as code), any word from
  *    the bad-word list (word-level match, not substring), or when the
  *    CLEANED text has fewer than [[Rules.minSentences]] sentences
  *    (counted as terminal-punctuation marks, a deterministic stand-in
  *    for C4's sentence splitter).
  *
  * Everything is a single column-expression projection — no shuffle, no
  * UDF, no collect; at 100 TB this is one codegen'd map over the corpus
  * scan, and every rule is integer/string-exact so a SQL engine can
  * replay it bit-for-bit (query `t14_c4_filters`).
  *
  * Reference behavior: stackstac has no text path; rule semantics from
  * the C4 paper §2.2 and the public TensorFlow-Datasets c4_utils
  * description (clean_page: line predicates + page predicates).
  */
object C4 {

  /** Knobs mirror the paper's constants (3 words/line, 5 sentences). */
  final case class Rules(
      minLineWords: Int = 3,
      minSentences: Int = 5,
      terminalRegex: String = "[.!?\"]$",
      sentenceChars: String = "[^.!?]",
      bannedPhrases: Seq[String] = Seq("lorem ipsum"),
      bannedChars: Seq[String] = Seq("{"),
      badWords: Seq[String] = Seq.empty,
      lineDropTerms: Seq[String] = Seq("javascript"))

  /** Array of lines surviving the three line rules (order preserved). */
  def keptLines(text: Column, r: Rules): Column =
    filter(split(text, "\n"), l => {
      val termOk = l.rlike(r.terminalRegex)
      // whitespace-collapsing word count (runs of spaces are one
      // separator, leading/trailing runs contribute no token) — the
      // TFDS c4_utils semantics; split-on-single-space over-counted on
      // "a  b" (round-8 advice).
      val wordsOk =
        size(filter(split(l, "\\s+"), t => length(t) > 0)) >= r.minLineWords
      val dropHit = r.lineDropTerms
        .map(t => lower(l).contains(t))
        .reduceOption(_ || _)
        .getOrElse(lit(false))
      termOk && wordsOk && !dropHit
    })

  /** Terminal-punctuation census of a text column (sentence proxy). */
  def sentenceCount(text: Column, r: Rules): Column =
    length(regexp_replace(text, r.sentenceChars, "")).cast("long")

  private def anyBannedPhrase(text: Column, r: Rules): Column =
    r.bannedPhrases.map(p => lower(text).contains(p))
      .reduceOption(_ || _).getOrElse(lit(false))

  private def anyBannedChar(text: Column, r: Rules): Column =
    r.bannedChars.map(c => text.contains(c))
      .reduceOption(_ || _).getOrElse(lit(false))

  private def anyBadWord(text: Column, r: Rules): Column =
    if (r.badWords.isEmpty) lit(false)
    else arrays_overlap(
      split(lower(text), "[^a-z]+"),
      array(r.badWords.map(w => lit(w.toLowerCase)): _*))

  /** Adds the C4 verdict columns to `df`:
    *
    *  - `kept_text`   — line-filtered page ("\n"-joined survivors);
    *  - `n_lines_in`  / `n_lines_kept`;
    *  - `n_sentences` — terminal-punct census of `kept_text`;
    *  - `reason`      — "kept" or the FIRST page rule that fired, in the
    *    fixed precedence lorem < brace < badword < fewsent (page-content
    *    rules on the ORIGINAL text first, the sentence floor on the
    *    cleaned text last, matching the paper's drop order).
    *
    * Filter `reason = "kept"` for the surviving corpus; keeping the
    * dropped rows lets a pipeline audit its own attrition (the per-rule
    * census FineWeb/Dolma publish for every dump).
    */
  def clean(df: DataFrame, textCol: String, r: Rules = Rules()): DataFrame = {
    val text = col(textCol)
    val kept = keptLines(text, r)
    df.withColumn("kept_text", array_join(kept, "\n"))
      .withColumn("n_lines_in", size(split(text, "\n")).cast("long"))
      .withColumn("n_lines_kept", size(kept).cast("long"))
      .withColumn("n_sentences", sentenceCount(col("kept_text"), r))
      .withColumn("reason",
        when(anyBannedPhrase(text, r), "lorem")
          .when(anyBannedChar(text, r), "brace")
          .when(anyBadWord(text, r), "badword")
          .when(col("n_sentences") < r.minSentences, "fewsent")
          .otherwise("kept"))
  }
}
