package graft

import org.apache.spark.sql.functions._
import graft.text.Unigram

/** Unigram-LM trainer: Viterbi hand cases (incl. the tiebreak), a fully
  * hand-computed one-round EM on a controlled corpus, the distributed
  * segmenter, and the coverage guard. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi: cheapest segmentation wins; ties prefer the smallest split (longest final piece)") {
    val cost = Map("a" -> 10L, "b" -> 10L, "ab" -> 15L, "abc" -> 40L, "c" -> 10L)
    // ab+c (25) beats a+b+c (30) and abc (40)
    assert(Unigram.viterbi("abc", cost, 3) === Seq("ab", "c"))
    // tie: a+b (20) vs ab (20) -> smallest j for the final piece = "ab"
    assert(Unigram.viterbi("ab", Map("a" -> 10L, "b" -> 10L, "ab" -> 20L), 2) ===
      Seq("ab"))
    intercept[IllegalArgumentException] {
      Unigram.viterbi("axb", cost, 3) // 'x' not in vocab
    }
  }

  test("train: one hand-computed EM round on 'abab'") {
    val df = Seq("abab").toDF("text")
    val out = Unigram.train(df, "text", topMulti = 1, maxPieceLen = 2, iters = 1)
      .orderBy($"piece").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // seed: a=2, b=2, ab=2, ba=1 -> top-1 multi = "ab" (score tie broken
    // by score DESC then piece ASC; ab=2 > ba=1). V = {a, ab, b}.
    // Initial counts (2,2,2), equal costs -> viterbi("abab") = ab+ab
    // (2 pieces beat any 3- or 4-piece split at equal per-piece cost).
    // Final counts: a=0, ab=2, b=0; T=2, V=3.
    def cost(c: Long) = math.floor(-math.log((c + 1).toDouble / 5.0) * 1e6 + 0.5).toLong
    assert(out.toSeq === Seq(
      ("a", 0L, cost(0)), ("ab", 2L, cost(2)), ("b", 0L, cost(0))))
  }

  test("segmentCounts: distributed apply matches per-word viterbi sizes") {
    val docs = Seq((1L, "abab ab"), (2L, "ba")).toDF("id", "text")
    val model = Unigram.train(docs, "text", topMulti = 2, maxPieceLen = 2, iters = 1)
    val costs = model.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val got = Unigram.segmentCounts(docs, "text", model, maxPieceLen = 2)
      .orderBy($"id").select($"n_pieces").collect().map(_.getInt(0)).toSeq
    val want = Seq("abab ab", "ba").map(
      _.split(" ").map(w => Unigram.viterbi(w, costs, 2).size).sum)
    assert(got === want)
  }

  test("train refuses a non-language-bounded word table, loudly") {
    val docs = Seq("a b c d e f g h").toDF("text")
    val e = intercept[IllegalArgumentException] {
      Unigram.train(docs, "text", topMulti = 2, maxPieceLen = 2, iters = 1,
        maxWordForms = 4)
    }
    assert(e.getMessage.contains("maxWordForms"))
    val e2 = intercept[IllegalArgumentException] {
      Unigram.train(docs, "text", topMulti = 2, maxPieceLen = 2, iters = 1,
        maxSymbolPositions = 3)
    }
    assert(e2.getMessage.contains("maxSymbolPositions"))
  }

  test("trainDistributed == train (the no-ceiling E-step), multi-iter, any partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def pin(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"piece").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val local = pin(Unigram.train(docs, "text", topMulti = 12, maxPieceLen = 4, iters = 3))
    val dist = pin(Unigram.trainDistributed(docs, "text", topMulti = 12,
      maxPieceLen = 4, iters = 3))
    assert(dist === local)
    // and at a different parallelism (the broadcast/census path must not
    // depend on partition layout)
    val dist13 = pin(Unigram.trainDistributed(docs.repartition(13), "text",
      topMulti = 12, maxPieceLen = 4, iters = 3))
    assert(dist13 === local)
  }

  test("non-BMP parity: emoji corpora — train == trainDistributed, code-point viterbi") {
    val df = Seq((1L, "😀ab 😀ab a😀b " +
      "🚀🚀 ab")).toDF("doc_id", "text")
    def pin(m: org.apache.spark.sql.DataFrame) = m.orderBy($"piece").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val local = pin(Unigram.train(df, "text", topMulti = 6, maxPieceLen = 3, iters = 2))
    val dist = pin(Unigram.trainDistributed(df, "text", topMulti = 6,
      maxPieceLen = 3, iters = 2))
    assert(dist === local)
    // every piece is whole code points (no lone surrogates), and the
    // single-char coverage includes the 2-UTF-16-unit emoji
    assert(local.map(_._1).exists(p => p == "😀"))
    local.map(_._1).foreach { s =>
      var i = 0
      while (i < s.length) {
        if (Character.isHighSurrogate(s.charAt(i))) {
          assert(i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1)),
            s"lone surrogate in piece '$s'")
          i += 2
        } else {
          assert(!Character.isLowSurrogate(s.charAt(i)), s"lone surrogate in '$s'")
          i += 1
        }
      }
    }
    // viterbi over an emoji word segments in code points: maxPieceLen=1
    // must still cover a supplementary char (one position, not two)
    val cost = local.map(p => p._1 -> p._3).toMap
    val seg = Unigram.viterbi("😀ab", cost, maxPieceLen = 1)
    assert(seg.head == "😀" && seg.length == 3)
  }

  test("train is partitioning-invariant (1 vs 13 partitions)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def run(parts: Int) =
      Unigram.train(docs.repartition(parts), "text", topMulti = 12,
          maxPieceLen = 4, iters = 2)
        .orderBy($"piece").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(1) === run(13))
  }
}
