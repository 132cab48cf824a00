package graft

import graft.text.WordPiece
import org.apache.spark.sql.functions._

/** WordPiece.trainLocal — the indexed driver-side merge loop — against
  * the distributed train (bit-identical merge tables), plus the
  * non-language-bounded input guard and the many-merge bound. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("trainLocal == train on the documents table, 24 merges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = WordPiece.train(docs, "text", numMerges = 24)
      .collect().map(_.toSeq).toSeq
    val b = WordPiece.trainLocal(docs, "text", numMerges = 24)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("trainLocal == train when the corpus merges out before numMerges") {
    // tiny corpus: both loops must stop at the same (early) round
    val df = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val a = WordPiece.train(df, "text", numMerges = 10).collect().map(_.toSeq).toSeq
    val b = WordPiece.trainLocal(df, "text", numMerges = 10).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty && a.length < 10)
  }

  test("non-BMP parity: emoji corpora train identically local and distributed") {
    // supplementary-plane chars are TWO UTF-16 code units but ONE Spark
    // substring unit — both trainers must seed whole code points, and no
    // learned piece may ever hold a lone surrogate
    val df = Seq((1L, "😀ab 😀ab a😀 b🚀 " +
      "🚀🚀 ab a😀")).toDF("doc_id", "text")
    val a = WordPiece.train(df, "text", numMerges = 5).collect().map(_.toSeq).toSeq
    val b = WordPiece.trainLocal(df, "text", numMerges = 5).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
    a.foreach { row =>
      Seq(1, 2, 3).map(row(_).asInstanceOf[String]).foreach { s =>
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
    }
  }

  test("trainLocal: 256 merges stay driver-cheap (no per-merge Spark jobs)") {
    // pseudo-random multi-char words so 256 merge rounds exist
    val rng = new scala.util.Random(7)
    val words = (1 to 4000).map { _ =>
      val n = 3 + rng.nextInt(8)
      (1 to n).map(_ => ('a' + rng.nextInt(12)).toChar).mkString
    }
    val docs = words.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val t0 = System.nanoTime()
    val m = WordPiece.trainLocal(docs, "text", numMerges = 256).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(m.length == 256)
    assert(m.map(_.getInt(0)).toSeq == (1 to 256))
    assert(secs < 60.0, s"256 merges took $secs s — the local loop is not bounded")
  }

  test("segmentGreedy: max-munch prefers the longest piece; dead words are one [UNK]") {
    val docs = Seq((1L, "abab ab abc axb"), (2L, "a  b"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = WordPiece.segmentGreedy(docs, "text", Seq("a", "b", "ab", "abc"))
      .orderBy($"doc_id")
      .select($"n_words", $"n_pieces", $"n_unk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1: abab=[ab,ab]; ab=[ab]; abc=[abc] (munch beats ab+?); axb dies
    // at 'x' -> ONE unk token. doc 2: double space yields no empty word.
    assert(out === Seq((4L, 5L, 1L), (2L, 2L, 0L), (0L, 0L, 0L)))
    val clash = intercept[IllegalArgumentException] {
      WordPiece.segmentGreedy(docs.withColumn("n_unk", lit(1)), "text", Seq("a"))
    }
    assert(clash.getMessage.contains("n_unk"))
  }

  test("trainLocal refuses a non-language-bounded word table, loudly") {
    val docs = Seq("a b c d e f g h").toDF("text")
    val e = intercept[IllegalArgumentException] {
      WordPiece.trainLocal(docs, "text", numMerges = 1, maxWordForms = 4)
    }
    assert(e.getMessage.contains("WordPiece.train"))
    val e2 = intercept[IllegalArgumentException] {
      WordPiece.trainLocal(docs, "text", numMerges = 1, maxSymbolPositions = 3)
    }
    assert(e2.getMessage.contains("maxSymbolPositions"))
  }
}
