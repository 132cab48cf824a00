package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Encoding-robustness scoring -- the crawl-hygiene gate that removes
  * decode wreckage BEFORE quality models see it. Web-scale corpora are
  * full of three distinct failure classes, each with its own signature:
  *
  *  1. decoder bailouts: U+FFFD REPLACEMENT CHARACTER -- a transcoder
  *     already gave up; the original bytes are gone,
  *  2. binary-in-text: C0 control characters (other than tab/LF/CR) --
  *     usually a mis-sniffed binary payload extracted as "text",
  *  3. mojibake: UTF-8 bytes decoded as Latin-1/cp1252 -- multi-byte
  *     sequences surface as tell-tale digraphs (U+00C3 U+00A9 for
  *     e-acute, U+00E2 U+20AC U+2122 for the right single quote, U+00C2
  *     + space for NBSP, ...). The text is *valid* Unicode, so only the
  *     signature census catches it.
  *
  * All counters are compositions of codegen'd built-ins (replace /
  * regexp_replace length deltas) -- pure map-side scan work, no UDF, no
  * shuffle: the 100 TB shape is "score in the read pipeline, filter
  * before anything downstream pays for the row". All signature chars
  * are BMP, so Spark's UTF-16 `length` and a codepoint-counting SQL
  * oracle agree exactly.
  */
object Encoding {

  /** The mojibake signature list: UTF-8-read-as-cp1252 digraphs for the
    * highest-frequency non-ASCII characters in web text. Deliberately
    * small and literal -- a census, not a decoder: signature hits per
    * char is the score, and any hit at all is damning because these
    * digraphs are vanishingly rare in clean text. Written as \u escapes
    * so the list survives any source-file transcoding.
    */
  val mojibakeSignatures: Seq[String] = Seq(
    "\u00C3\u00A9", // e-acute read as cp1252
    "\u00C3\u00A8", // e-grave
    "\u00C3\u00A4", // a-umlaut
    "\u00C3\u00B6", // o-umlaut
    "\u00C3\u00BC", // u-umlaut
    "\u00C3\u00B1", // n-tilde
    "\u00E2\u20AC\u2122", // right single quote
    "\u00E2\u20AC\u0153", // left double quote
    "\u00E2\u20AC\u201C", // en dash
    // NBSP, both observable forms: the raw cp1252 misread of UTF-8
    // 0xC2 0xA0 is U+00C2 U+00A0; downstream normalizers often collapse
    // the NBSP to an ASCII space, leaving U+00C2 + PLAIN space. Counting
    // both keeps the census valid pre- and post-normalization (the two
    // digraphs differ in their second char, so they never double-count).
    "\u00C2\u00A0",
    "\u00C2 ")

  private def countOccurrences(c: Column, sig: String): Column =
    (length(c) - length(replace(c, lit(sig), lit("")))) / sig.length

  /** Count of U+FFFD replacement characters. */
  def replacementCount(c: Column): Column =
    length(c) - length(replace(c, lit("\uFFFD"), lit("")))

  /** Count of C0 controls excluding tab/LF/CR (the binary-in-text tell). */
  def controlCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""))

  /** Total mojibake-signature hits (each digraph counted once per
    * occurrence; the signatures do not overlap each other). */
  def mojibakeCount(c: Column): Column =
    mojibakeSignatures.map(countOccurrences(c, _)).reduce(_ + _).cast("long")

  /** Count of non-ASCII characters (codepoints above U+007F). */
  def nonAsciiCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[^\\x00-\\x7f]", ""))

  /** ASCII Latin letter count (extend the class for Latin-1/Extended
    * coverage when the corpus needs it). */
  def latinCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[A-Za-z]", ""))

  /** Cyrillic-block letter count (U+0400–U+04FF). */
  def cyrillicCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[Ѐ-ӿ]", ""))

  /** CJK Unified Ideographs count (U+4E00–U+9FFF). */
  def hanCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[一-鿿]", ""))

  /** Script verdict over {latin, cyrillic, han}: the dominant script
    * plus a MIXED flag when the runner-up holds ≥ 10% of scripted
    * letters — the homoglyph-spoofing / wrong-script-for-language gate
    * (a Cyrillic 'а' smuggled into a Latin word flips the flag long
    * before it changes the dominant script). Integer arithmetic only;
    * dominance ties resolve latin > cyrillic > han by the when-chain
    * order, deterministically. All three blocks are BMP, so UTF-16
    * `length` and a codepoint-counting SQL oracle agree exactly. */
  def scriptVerdict(text: Column): Seq[(String, Column)] = {
    val la = latinCount(text).cast("long")
    val cy = cyrillicCount(text).cast("long")
    val ha = hanCount(text).cast("long")
    val total = la + cy + ha
    val top = greatest(la, cy, ha)
    val second = total - top - least(la, cy, ha)
    val dom = when(total === 0, "none")
      .when(top === la, "latin")
      .when(top === cy, "cyrillic")
      .otherwise("han")
    Seq("script" -> dom,
        "script_mixed" -> (total > 0 && second * 10L >= total))
  }

  /** The integer-permille score columns (`repl_pm`, `ctrl_pm`,
    * `moji_pm`, `nonascii_pm`) and the composite `enc_clean` verdict:
    * zero replacement chars, zero controls, and mojibake under
    * `mojiPermilleMax` per-mille of characters. Integer arithmetic
    * throughout (10^3-scaled floor division) so the gate is exact at
    * any parallelism and replayable by an external SQL oracle. */
  def score(text: Column, mojiPermilleMax: Int = 5): Seq[(String, Column)] = {
    val len = greatest(length(text), lit(1)).cast("long")
    // Integer floor division (Spark's `/` is double division; counts are
    // <= 1e9 and 1/len >> 1 double ulp, so truncation == floor exactly).
    def pm(n: Column): Column = (n * 1000L / len).cast("long")
    val repl = replacementCount(text).cast("long")
    val ctrl = controlCount(text).cast("long")
    val moji = mojibakeCount(text)
    val nonAscii = nonAsciiCount(text).cast("long")
    val mojiPm = pm(moji)
    Seq(
      "repl_pm" -> pm(repl),
      "ctrl_pm" -> pm(ctrl),
      "moji_pm" -> mojiPm,
      "nonascii_pm" -> pm(nonAscii),
      "enc_clean" -> (repl === 0 && ctrl === 0 && mojiPm < mojiPermilleMax))
  }
}
