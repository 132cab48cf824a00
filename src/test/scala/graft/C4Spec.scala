package graft

import graft.text.C4

/** C4 page cleaning (Raffel et al. 2020 §2.2) on REAL multi-line pages —
  * the oracle query (t14) exercises the manufactured corpus; this spec
  * pins each rule on hand-built fixtures where the expected rewrite is
  * computable by eye.
  */
class C4Spec extends SparkSpec {
  import spark.implicits._

  private val rules = C4.Rules(badWords = Seq("sex"))

  private def cleanOne(page: String): (String, String, Long, Long) = {
    val df = Seq((1L, page)).toDF("id", "page")
    val r = C4.clean(df, "page", rules).collect()(0)
    (r.getAs[String]("kept_text"), r.getAs[String]("reason"),
      r.getAs[Long]("n_lines_kept"), r.getAs[Long]("n_sentences"))
  }

  test("line rules: terminal punctuation, min words, javascript") {
    val page = Seq(
      "This line ends with a period.",      // kept
      "this one has no terminal mark",      // dropped: no terminal
      "Too short.",                          // dropped: 2 words
      "Please enable JavaScript to view.",   // dropped: javascript (case-insensitive)
      "Does a question mark count?",         // kept
      "An exclamation works too!",           // kept
      "A quoted ending counts as terminal.\"" // kept (end quote)
    ).mkString("\n")
    val (kept, reason, nKept, nSent) = cleanOne(page)
    assert(nKept === 4)
    assert(kept === Seq(
      "This line ends with a period.",
      "Does a question mark count?",
      "An exclamation works too!",
      "A quoted ending counts as terminal.\"").mkString("\n"))
    assert(nSent === 4) // one terminal mark per kept line; '"' itself does not count
    assert(reason === "fewsent") // 4 < 5 sentences
  }

  test("word count collapses whitespace runs (round-8 advice)") {
    // "Hi  there." is 2 words, not 3 — runs of spaces are one separator
    val (_, _, nKept, _) = cleanOne("Hi  there.")
    assert(nKept === 0)
    // and a real 3-worder with ragged spacing still passes the floor
    val (kept, _, nKept3, _) = cleanOne("One  two   three.")
    assert(nKept3 === 1 && kept === "One  two   three.")
  }

  test("page passes when it has enough sentences") {
    val page = (1 to 6).map(i => s"Sentence number $i is here.").mkString("\n")
    val (kept, reason, nKept, nSent) = cleanOne(page)
    assert(reason === "kept")
    assert(nKept === 6 && nSent === 6)
    assert(kept === page)
  }

  test("page rules fire on the ORIGINAL text in precedence order") {
    val good = (1 to 6).map(i => s"Sentence number $i is here.").mkString("\n")
    assert(cleanOne(good + "\nWe embed Lorem Ipsum once")._2 === "lorem")
    assert(cleanOne(good + "\nvar x = {")._2 === "brace")
    assert(cleanOne(good + "\nAn explicit sex word appears.")._2 === "badword")
    // lorem outranks brace when both fire
    assert(cleanOne(good + "\nlorem ipsum {")._2 === "lorem")
  }

  test("bad-word match is word-level, not substring") {
    val good = (1 to 6).map(i => s"Sentence number $i is here.").mkString("\n")
    // "sussex" contains "sex" as a substring but not as a word
    val (_, reason, _, _) = cleanOne(good + "\nWe visited Sussex today.")
    assert(reason === "kept")
  }

  test("empty and fully-dropped pages clean to the empty rewrite") {
    val (kept, reason, nKept, nSent) = cleanOne("no terminal here\nshort")
    assert(kept === "" && nKept === 0 && nSent === 0 && reason === "fewsent")
  }
}
