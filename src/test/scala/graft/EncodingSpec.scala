package graft

import graft.text.Encoding
import org.apache.spark.sql.functions._

/** Hand oracles for the encoding-robustness gate (text.Encoding). */
class EncodingSpec extends SparkSpec {

  private def scoreOne(s: String): Map[String, Any] = {
    import spark.implicits._
    val df = Seq(s).toDF("t")
    val scored = Encoding.score($"t").foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    val row = scored.collect().head
    scored.columns.zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
  }

  test("mojibake signatures pin their exact code points (transcode canary)") {
    // The signatures are the UTF-8-bytes-read-as-cp1252 digraphs; a
    // source-file transcode or editor normalization that altered one
    // would silently blind the census — pin every code point.
    val want: Seq[Seq[Int]] = Seq(
      Seq(0xC3, 0xA9), Seq(0xC3, 0xA8), Seq(0xC3, 0xA4), Seq(0xC3, 0xB6),
      Seq(0xC3, 0xBC), Seq(0xC3, 0xB1),
      Seq(0xE2, 0x20AC, 0x2122), Seq(0xE2, 0x20AC, 0x153),
      Seq(0xE2, 0x20AC, 0x201C),
      Seq(0xC2, 0xA0), // NBSP digraph, raw (un-normalized) form
      Seq(0xC2, 0x20)) // NBSP digraph after space normalization
    assert(Encoding.mojibakeSignatures.map(_.map(_.toInt).toSeq) == want)
  }

  test("clean ASCII text: all zero, verdict clean") {
    val m = scoreOne("The quick brown fox jumps over the lazy dog. " * 10)
    assert(m("repl_pm") == 0L && m("ctrl_pm") == 0L && m("moji_pm") == 0L &&
      m("nonascii_pm") == 0L && m("enc_clean") == true)
  }

  test("clean NON-ASCII text (real accents) is not flagged as mojibake") {
    // é ü ñ as themselves — nonascii counted, mojibake zero, verdict clean
    val m = scoreOne("café über mañana, voilà! " * 20)
    assert(m("moji_pm") == 0L && m("repl_pm") == 0L && m("ctrl_pm") == 0L)
    assert(m("nonascii_pm").asInstanceOf[Long] > 0L)
    assert(m("enc_clean") == true)
  }

  test("mojibake digraphs are counted once per occurrence") {
    // "Ã©" twice + "â€™" once in a 100-char doc => moji = 3, pm = 3*1000/107
    val body = "x" * 100
    val s = body + "Ã©Ã©â€™"
    val m = scoreOne(s)
    assert(m("moji_pm") == 3L * 1000 / 107)
    assert(m("nonascii_pm").asInstanceOf[Long] > 0L)
  }

  test("U+FFFD or C0 controls are damning regardless of rate") {
    val long = "y" * 5000
    assert(scoreOne(long + "�")("enc_clean") == false)
    assert(scoreOne(long + "\u0007")("enc_clean") == false)
    // but tab/newline/CR are NOT controls for this purpose
    assert(scoreOne(long + "\t\n\r")("enc_clean") == true)
  }

  test("mojibake gate is length-normalized: same signature, verdict flips") {
    val sig = "Â " // NBSP digraph, 1 hit
    val shortDoc = ("z" * 50) + sig  // pm = 1000/52 = 19 >= 5 -> dirty
    val longDoc = ("z" * 500) + sig  // pm = 1000/502 = 1 < 5  -> clean
    assert(scoreOne(shortDoc)("enc_clean") == false)
    assert(scoreOne(longDoc)("enc_clean") == true)
  }

  test("score stays inside whole-stage codegen (no UDF in the plan)") {
    import spark.implicits._
    val df = Seq("a", "b").toDF("t")
    val scored = Encoding.score($"t").foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }

  private def verdictOne(t: String): (String, Boolean) = {
    import spark.implicits._
    val df = Seq(t).toDF("t")
    val v = Encoding.scriptVerdict($"t").foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .collect().head
    (v.getString(1), v.getBoolean(2))
  }

  test("scriptVerdict: homoglyph smuggling flips MIXED before dominance moves") {
    // "paypal" with two Cyrillic \u0430: latin 4, cyrillic 2 of 6 scripted
    assert(verdictOne("p\u0430yp\u0430l") === ("latin", true))
    assert(verdictOne("paypal") === ("latin", false))
    // a lone Cyrillic char in a long Latin text stays under the 10% bar
    assert(verdictOne(("latin " * 20) + "\u0430") === ("latin", false))
  }

  test("scriptVerdict: dominance, han, and the none verdict") {
    assert(verdictOne("\u4f60\u597d\u4e16\u754c ok") === ("han", true))
    assert(verdictOne("\u043f\u0440\u0438\u0432\u0435\u0442") === ("cyrillic", false))
    assert(verdictOne("12345 .,!?") === ("none", false))
    // exact tie latin==cyrillic resolves latin by the when-chain order
    assert(verdictOne("ab\u0430\u0431") === ("latin", true))
  }
}
