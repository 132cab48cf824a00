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

  test("train matches an independent driver-side replay on random corpora") {
    import spark.implicits._
    import org.scalacheck.Gen
    // 3-letter alphabet, short words: forces heavy pair collisions, count
    // ties (exercising the (c desc, left, right) tiebreak), and early
    // stops when everything merges away
    val gen = for {
      nDocs <- Gen.choose(1, 6)
      docs <- Gen.listOfN(nDocs, for {
        nw <- Gen.choose(1, 12)
        ws <- Gen.listOfN(nw, for {
          len <- Gen.choose(1, 6)
          cs <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
        } yield cs.mkString)
      } yield ws.mkString(" "))
    } yield docs

    def replay(texts: Seq[String], numMerges: Int): Seq[(Int, String, String, Long)] = {
      var words: Map[Vector[String], Long] = texts.flatMap(_.split(" "))
        .groupBy(identity).map { case (w, o) => w.split("").toVector -> o.size.toLong }
      val out = Seq.newBuilder[(Int, String, String, Long)]
      var r = 1
      var done = false
      while (r <= numMerges && !done) {
        val pairs = words.toSeq.flatMap { case (s, c) =>
          s.zip(s.drop(1)).map(p => p -> c)
        }.groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }
        if (pairs.isEmpty) done = true
        else {
          val ((a, b), c) = pairs.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
          out += ((r, a, b, c))
          words = words.toSeq.map { case (s, cnt) =>
            val m = s.tail.foldLeft(Vector(s.head)) { (acc, x) =>
              if (acc.last == a && x == b) acc.init :+ (a + b) else acc :+ x
            }
            m -> cnt
          }.groupBy(_._1).map { case (s, o) => s -> o.map(_._2).sum }
          r += 1
        }
      }
      out.result()
    }

    new GenChecks {}.forAllN(gen, n = 10) { texts =>
      val df = texts.toDF("text")
      val got = Bpe.train(df, "text", numMerges = 5)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
      assert(got == replay(texts, 5), s"corpus: $texts")
      // the at-scale trainer is bit-identical to the distributed rounds
      val local = Bpe.trainLocal(df, "text", numMerges = 5)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
      assert(local == got, s"trainLocal diverged, corpus: $texts")
    }
  }

  test("trainLocal matches train on the hand-computed fixture") {
    import spark.implicits._
    val docs = Seq("aaab aaab ab").toDF("text")
    val local = Bpe.trainLocal(docs, "text", numMerges = 4).collect().toSeq
    val dist = Bpe.train(docs, "text", numMerges = 4).collect().toSeq
    assert(local == dist && local.size == 3)
  }

  test("trainLocal finishes a real vocabulary (>=256 merges) in bounded time") {
    import spark.implicits._
    // 3000 pseudorandom 10-14-char words over 8 letters: far more than 256
    // learnable merges. train() would schedule 256 sequential Spark jobs
    // here; trainLocal pays ONE distributed reduction then finishes the
    // loop driver-side — the 32k-vocab path at 100 TB (see scaladoc).
    val rnd = new scala.util.Random(42)
    val words = (0 until 3000).map { _ =>
      (0 until (10 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(8)).toChar).mkString
    }
    val docs = words.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val t0 = System.nanoTime()
    val m = Bpe.trainLocal(docs, "text", numMerges = 256).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(m.length == 256)
    assert(m.map(_.getInt(0)).toSeq == (1 to 256))
    assert(secs < 60.0, s"256 merges took $secs s — the local loop is not bounded")
  }

  test("non-BMP parity: emoji corpora train identically local and distributed") {
    import spark.implicits._
    val df = Seq((1L, "😀a 😀a 😀a b🚀 " +
      "b🚀 😀😀 cc")).toDF("doc_id", "text")
    val a = graft.text.Bpe.train(df, "text", numMerges = 4).collect().map(_.toSeq).toSeq
    val b = graft.text.Bpe.trainLocal(df, "text", numMerges = 4).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("trainLocal refuses a non-language-bounded word table, loudly") {
    import spark.implicits._
    val docs = Seq("a b c d e f g h").toDF("text")
    val e = intercept[IllegalArgumentException] {
      Bpe.trainLocal(docs, "text", numMerges = 1, maxWordForms = 4)
    }
    assert(e.getMessage.contains("Bpe.train"))
  }

  test("empty tokens from repeated/leading spaces never become merges or pieces") {
    import spark.implicits._
    // "aa  aa" splits to ["aa", "", "aa"]; the phantom "" must not reach
    // the census (a ("","") pair could otherwise win a round) or segment
    val docs = Seq("aa  aa", " aa").toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 3).collect()
    assert(m.nonEmpty)
    assert(m.forall(r => r.getString(1).nonEmpty && r.getString(2).nonEmpty))
    assert(m.toSeq == Bpe.trainLocal(docs, "text", numMerges = 3).collect().toSeq)
    val seg = Bpe.segment(docs, "text", Seq(("a", "a")))
      .select("pieces").as[Seq[Seq[String]]].collect()
    assert(seg.flatten.flatten.forall(_.nonEmpty))
  }
}
