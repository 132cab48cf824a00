package graft

import graft.text.Bpe

class BpeSpec extends SparkSpec {

  test("bpe learns the hand-computed merge sequence and stops when done") {
    import spark.implicits._
    // counts: aaab x2, ab x1
    // round 1: (a,a) weight 4 beats (a,b) weight 3     -> aa
    // round 2: (a,b) weight 3 beats (aa,a) weight 2    -> ab
    // round 3: (aa,ab) weight 2 is the only pair left  -> aaab
    // round 4: nothing mergeable -> training stops early at 3 merges
    val docs = Seq("aaab aaab ab").toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(m.toSeq == Seq((1, "a", "a", 4L), (2, "a", "b", 3L), (3, "aa", "ab", 2L)))
  }

  test("greedy merge is non-overlapping left-to-right (aaaa -> aa aa)") {
    import spark.implicits._
    val docs = Seq("aaaa").toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 1).collect()
    assert(m.head.getString(3) == "aa" && m.head.getLong(4) == 3L) // 3 adjacent pairs weighted
    val seg = Bpe.segment(docs, "text", Seq(("a", "a")))
      .select("pieces").as[Seq[Seq[String]]].head()
    assert(seg == Seq(Seq("aa", "aa")))
  }

  test("segment never clobbers caller columns (even one named 'tokens')") {
    import spark.implicits._
    val docs = Seq(("aaaa", "mine")).toDF("text", "tokens")
    val out = Bpe.segment(docs, "text", Seq(("a", "a")))
    assert(out.columns.toSeq == Seq("text", "tokens", "pieces"))
    assert(out.select("tokens").head().getString(0) == "mine")
  }

  test("segment replays the learned table back to whole words") {
    import spark.implicits._
    val docs = Seq("aaab aaab ab").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 4)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val seg = Bpe.segment(docs, "text", merges)
      .select("pieces").as[Seq[Seq[String]]].head()
    assert(seg == Seq(Seq("aaab"), Seq("aaab"), Seq("ab")))
  }
}
