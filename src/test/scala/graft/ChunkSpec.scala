package graft

import org.apache.spark.sql.functions._

/** Window contract of [[graft.text.Chunk.slidingWindows]]. */
class ChunkSpec extends SparkSpec {

  private def chunksOf(text: String, win: Int, stride: Int): Seq[(Int, Int, String)] = {
    import spark.implicits._
    graft.text.Chunk.slidingWindows(Seq(text).toDF("text"), "text", win, stride)
      .select($"chunk_idx", $"chunk_ntok", $"chunk_text")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
      .sortBy(_._1).toSeq
  }

  test("overlapping windows with a kept partial tail") {
    // 7 tokens, win 4 stride 2 -> starts 0,2,4,6
    val got = chunksOf("a b c d e f g", win = 4, stride = 2)
    assert(got == Seq(
      (0, 4, "a b c d"), (1, 4, "c d e f"), (2, 3, "e f g"), (3, 1, "g")))
  }

  test("stride == win tiles without overlap; exact fit has no empty tail") {
    val got = chunksOf("a b c d e f", win = 3, stride = 3)
    assert(got == Seq((0, 3, "a b c"), (1, 3, "d e f")))
  }

  test("short and empty docs still get one address") {
    assert(chunksOf("only", 40, 30) == Seq((0, 1, "only")))
    // split("") is [""]: one chunk of the empty string
    assert(chunksOf("", 40, 30) == Seq((0, 1, "")))
  }

  test("guards: stride must not exceed win (gaps drop tokens); reserved columns") {
    import spark.implicits._
    val df = Seq("x").toDF("text")
    intercept[IllegalArgumentException] {
      graft.text.Chunk.slidingWindows(df, "text", win = 2, stride = 3)
    }
    intercept[IllegalArgumentException] {
      graft.text.Chunk.slidingWindows(df.withColumn("chunk_idx", lit(1)), "text", 4, 2)
    }
  }

  test("chunk volume is sum of ceil(n/stride) — the a-priori output bound") {
    import spark.implicits._
    val docs = Seq.tabulate(50)(i => ("w " * (i + 1)).trim).toDF("text")
    val n = graft.text.Chunk.slidingWindows(docs, "text", 8, 5).count()
    val want = (1 to 50).map(t => (t + 4) / 5).sum
    assert(n == want)
  }

  test("bySentences: terminators preserved verbatim; windows over sentences") {
    import spark.implicits._
    val df = Seq((1, "A one. B two! C three? D four. E five")).toDF("id", "text")
    val got = graft.text.Chunk.bySentences(df, "text", win = 2, stride = 2)
      .select($"chunk_idx", $"chunk_nsent", $"chunk_text")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq.sorted
    assert(got == Seq(
      (0, 2, "A one. B two!"), (1, 2, "C three? D four."), (2, 1, "E five")))
    // multi-terminator runs stay whole; no trailing space needed at EOS
    val got2 = graft.text.Chunk.bySentences(
        Seq((1, "Hi!! Next.")).toDF("id", "text"), "text", win = 1, stride = 1)
      .select($"chunk_text").collect().map(_.getString(0)).toSeq.sorted
    assert(got2 == Seq("Hi!!", "Next."))
    // NULL text still yields one (empty) address
    val got3 = graft.text.Chunk.bySentences(
        Seq((1, Option.empty[String])).toDF("id", "text"), "text", 2, 1)
      .select($"chunk_nsent", $"chunk_text").collect()
    assert(got3.length == 1 && got3(0).getString(1) == "")
  }

  test("NULL text yields one empty chunk, not a silently dropped row") {
    import spark.implicits._
    val df = Seq((1, Option("a b")), (2, None)).toDF("id", "text")
    val got = graft.text.Chunk.slidingWindows(df, "text", win = 4, stride = 2)
      .select($"id", $"chunk_idx", $"chunk_ntok", $"chunk_text")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq.sorted
    assert(got == Seq((1, 0, 2, "a b"), (2, 0, 1, "")))
  }

  test("fuzz: engine chunks == driver sliding-window reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(411)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "", "ff")
    for (round <- 1 to 20) {
      val win = 1 + rnd.nextInt(6)
      val stride = 1 + rnd.nextInt(win)
      val docs = Seq.fill(1 + rnd.nextInt(8)) {
        Seq.fill(rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      def reference(text: String): Seq[(Int, Int, String)] = {
        val toks = text.split(" ", -1) // keep empty tokens, like Spark's split
        (0 until toks.length by stride).zipWithIndex.map { case (s, i) =>
          val w = toks.slice(s, s + win)
          (i, w.length, w.mkString(" "))
        }
      }
      val want = docs.zipWithIndex.flatMap { case (t, id) =>
        reference(t).map { case (ci, n, ct) => (id, ci, n, ct) }
      }.sorted
      val got = graft.text.Chunk.slidingWindows(
          docs.zipWithIndex.map(_.swap).toDF("id", "text"), "text", win, stride)
        .select($"id", $"chunk_idx", $"chunk_ntok", $"chunk_text")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .toSeq.sorted
      assert(got == want, s"round $round win=$win stride=$stride")
    }
  }
}
