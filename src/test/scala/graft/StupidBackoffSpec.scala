package graft

import org.apache.spark.sql.functions._
import graft.text.{Dsir, StupidBackoff}

/** Stupid Backoff: independent driver-side reimplementation as ground
  * truth (same md5 bucketing, plain Scala math), both branches
  * exercised, parallelism invariance. */
class StupidBackoffSpec extends SparkSpec {
  import spark.implicits._

  private val B = 4096
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def bucket(s: String): Long =
    (BigInt(md5hex(s).take(15), 16) % B).toLong

  /** Driver-side replay of the exact engine formula. */
  private def expected(refTexts: Seq[String], text: String,
                       alpha: Double = 0.4): (Long, Long, Long) = {
    val biC = scala.collection.mutable.Map.empty[Long, Long]
    val unC = scala.collection.mutable.Map.empty[Long, Long]
    var n = 0L
    refTexts.foreach { t =>
      val tk = t.split(" ", -1)
      tk.foreach { w => unC(bucket(w)) = unC.getOrElse(bucket(w), 0L) + 1; n += 1 }
      tk.sliding(2).filter(_.length == 2).foreach { p =>
        val b = bucket(p(0) + " " + p(1)); biC(b) = biC.getOrElse(b, 0L) + 1
      }
    }
    val tk = text.split(" ", -1)
    var score = 0L; var nPos = 0L; var nBo = 0L
    tk.sliding(2).filter(_.length == 2).foreach { p =>
      val cb = biC.getOrElse(bucket(p(0) + " " + p(1)), 0L)
      val cp = unC.getOrElse(bucket(p(0)), 0L)
      val cc = unC.getOrElse(bucket(p(1)), 0L)
      val d =
        if (cb > 0 && cp > 0)
          math.floor(-math.log(cb.toDouble / cp.toDouble) * 1e6 + 0.5).toLong
        else {
          nBo += 1
          math.floor(-math.log(alpha * (cc + 1).toDouble / (n + B).toDouble) * 1e6 + 0.5).toLong
        }
      score += d; nPos += 1
    }
    (score, nPos, nBo)
  }

  test("both branches match the independent replay; backoff fires on unseen bigrams") {
    val refTexts = Seq("a b a b c", "b c a")
    val ref = refTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val doc = "a b z c"   // 'a b' seen; 'b z' and 'z c' unseen -> backoff
    val docs = Seq((100L, doc)).toDF("doc_id", "text")
    val got = StupidBackoff.score(docs, "doc_id", "text",
        Dsir.bucketCounts(ref, "text", 2, B),
        Dsir.bucketCounts(ref, "text", 1, B), numBuckets = B)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    val want = expected(refTexts, doc)
    assert(got === want, s"got $got want $want")
    assert(want._3 >= 2, s"fixture must exercise the backoff branch: $want")
    assert(want._3 < want._2, s"fixture must exercise the seen branch: $want")
  }

  test("gram-less docs score (0, 0, 0); parallelism-invariant (1 vs 13)") {
    val ref = Seq((0L, "x y x")).toDF("doc_id", "text")
    val docs = Seq((1L, "solo"), (2L, "x y"), (3L, "y x y"))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      StupidBackoff.score(docs.repartition(parts), "doc_id", "text",
          Dsir.bucketCounts(ref, "text", 2, B),
          Dsir.bucketCounts(ref, "text", 1, B), numBuckets = B)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val one = run(1)
    assert(one.head === ((1L, 0L, 0L, 0L)), s"gram-less doc must zero-score: $one")
    assert(one === run(13))
  }
}
