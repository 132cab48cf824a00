package graft

import org.apache.spark.sql.functions._
import graft.text.Bm25

/** BM25 retrieval: closed form hand-checked on a tiny fixture,
  * parallelism invariance, and the top-k plan shape. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "cat dog cat"),       // dl=3, tf(cat)=2
    (1L, "cat fish"),          // dl=2, tf(cat)=1
    (2L, "dog dog dog fish"),  // dl=4, no cat
    (3L, "bird bird")          // dl=2, no query term
  ).toDF("doc_id", "text")

  private def expected(tf: Long, dl: Long, df: Long, n: Long, totalLen: Long,
                       k1: Double = 1.2, b: Double = 0.75): Long = {
    val idf = math.log((n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
    val avgdl = totalLen.toDouble / n.toDouble
    val c = idf * tf.toDouble * (k1 + 1.0) /
      (tf.toDouble + k1 * (1.0 - b + b * dl.toDouble / avgdl))
    math.floor(c * 1e6 + 0.5).toLong
  }

  test("closed form matches the hand evaluation; docs without query terms absent") {
    val got = Bm25.topK(docs, "doc_id", "text", Seq("cat"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // N=4, totalLen=11, df(cat)=2
    val s0 = expected(tf = 2, dl = 3, df = 2, n = 4, totalLen = 11)
    val s1 = expected(tf = 1, dl = 2, df = 2, n = 4, totalLen = 11)
    val want =
      if (s0 >= s1) Seq((1, 0L, s0), (2, 1L, s1)) else Seq((1, 1L, s1), (2, 0L, s0))
    assert(got.toSeq === want)
  }

  test("multi-term query sums per-term integer contributions") {
    val got = Bm25.topK(docs, "doc_id", "text", Seq("cat", "dog"), k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val catD = Map(0L -> (2L, 3L), 1L -> (1L, 2L))
    val dogD = Map(0L -> (1L, 3L), 2L -> (3L, 4L))
    def s(m: Map[Long, (Long, Long)], id: Long): Long =
      m.get(id).map { case (tf, dl) =>
        expected(tf, dl, df = m.size.toLong, n = 4, totalLen = 11) }.getOrElse(0L)
    val want = Seq(0L, 1L, 2L).map(id => id -> (s(catD, id) + s(dogD, id))).toMap
    assert(got === want)
  }

  test("parallelism-invariant (1 vs 13 partitions)") {
    def run(parts: Int) =
      Bm25.topK(docs.repartition(parts), "doc_id", "text",
        Seq("cat", "dog", "fish"), k = 3)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(1) === run(13))
  }

  test("plan: top-k is TakeOrderedAndProject, never a global Sort") {
    val big = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val plan = Bm25.topK(big, "doc_id", "text", Seq("dup", "join"), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator:\n$plan")
  }
}
