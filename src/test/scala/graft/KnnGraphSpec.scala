package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ann.{Ann, KnnGraph}

/** Graph-based ANN (v23): structure of the LSH-seeded kNN graph, the
  * recall gain of one-hop expansion, and the ≥2-tables guard. Same
  * measured-floor discipline as RecallSpec (deterministic fixture ⇒
  * exact floors just under measured values). */
class KnnGraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val prepared = Ann.prepare(
    spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding").cache()
  private lazy val edges = KnnGraph.build(prepared, nPlanes = 4, nTables = 2,
    dim = 64, g = 6).cache()
  private val qf = col("id") < 50

  private def recall(truth: DataFrame, approx: DataFrame): Double = {
    val t = truth.select(col("qid"), col("nid"))
    val hits = t.join(approx.select(col("qid"), col("nid")),
      Seq("qid", "nid"), "left_semi").count().toDouble
    hits / t.count()
  }

  test("build: at most g edges per node, every node covered, no self-loops") {
    val perSrc = edges.groupBy(col("src")).agg(count(lit(1)).as("n"))
    assert(perSrc.agg(max(col("n"))).head.getLong(0) <= 6)
    assert(perSrc.count() === 500L) // 16 buckets × 2 tables over 500 rows: nobody isolated
    assert(edges.filter(col("src") === col("dst")).count() === 0L)
  }

  test("expansion beats the raw graph: hop-2 recovers cross-bucket neighbors") {
    val truth = Ann.bruteForceKnn(prepared, prepared.filter(qf), 5).cache()
    // the graph's own top-g edges read as a kNN answer (0-hop)
    val direct = edges.filter(col("src") < 50)
      .select(col("src").as("qid"), col("dst").as("nid"))
    val expanded = KnnGraph.expandTopK(edges, prepared, k = 5, qf)
    val r0 = recall(truth, direct)
    val r1 = recall(truth, expanded)
    info(s"recall@5: graph-direct $r0, one-hop expanded $r1")
    assert(r1 > r0, "expansion must strictly improve on the seed graph")
    assert(r1 >= 0.30, s"expanded recall $r1") // measured 0.32 on the fixture
    truth.unpersist()
  }

  test("refine: one NN-Descent round strictly improves edge quality, monotonically") {
    def quality(g: DataFrame): (Long, Double) = {
      val r = g.agg(count(lit(1)), sum(col("cos"))).head
      (r.getLong(0), r.getDouble(1))
    }
    val r1 = KnnGraph.refine(edges, prepared, g = 6).cache()
    val r2 = KnnGraph.refine(r1, prepared, g = 6).cache()
    val (n0, q0) = quality(edges)
    val (n1, q1) = quality(r1)
    val (n2, q2) = quality(r2)
    info(f"edge-cos sums: seed $q0%.2f, round1 $q1%.2f, round2 $q2%.2f")
    assert(n0 === 3000L && n1 === 3000L && n2 === 3000L) // 500 × g, no node starved
    assert(q1 > q0, "round 1 must improve the seed graph")
    assert(q2 >= q1, "NN-Descent is monotone: a round never degrades a neighborhood")
    // refined graph serves better: expansion recall rises with graph quality
    val truth = Ann.bruteForceKnn(prepared, prepared.filter(qf), 5).cache()
    val seedR = recall(truth, KnnGraph.expandTopK(edges, prepared, k = 5, qf))
    val refR = recall(truth, KnnGraph.expandTopK(r1, prepared, k = 5, qf))
    info(s"expansion recall@5: seed graph $seedR, refined graph $refR")
    assert(refR > seedR, "a better graph must serve better")
    truth.unpersist(); r1.unpersist(); r2.unpersist()
  }

  test("admit: batch edges point into the corpus; the graph hop beats bucket-only") {
    val corpus = prepared.filter(col("id") >= 100).cache()
    val batch = prepared.filter(col("id") < 100).cache()
    val corpusEdges = KnnGraph.build(corpus, nPlanes = 4, nTables = 2,
      dim = 64, g = 6).cache()
    val admitted = KnnGraph.admit(corpusEdges, corpus, batch,
      nPlanes = 4, nTables = 2, dim = 64, g = 6).cache()
    // structure: src in batch, dst in corpus, <= g per src
    assert(admitted.filter(col("src") >= 100 || col("dst") < 100).count() === 0L)
    assert(admitted.groupBy(col("src")).count()
      .agg(max(col("count"))).head.getLong(0) <= 6L)
    // the hop widening must help: admit against an EMPTY graph = bucket
    // mates only; true top-g over the corpus is the yardstick
    val truth = Ann.bruteForceKnn(corpus, batch, 6).select(col("qid"), col("nid"))
    val emptyEdges = corpusEdges.filter(lit(false))
    val matesOnly = KnnGraph.admit(emptyEdges, corpus, batch,
      nPlanes = 4, nTables = 2, dim = 64, g = 6)
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      truth.join(df.select(col("src").as("qid"), col("dst").as("nid")),
        Seq("qid", "nid"), "left_semi").count()
    val (hAdmit, hMates) = (hits(admitted), hits(matesOnly))
    info(s"corpus-top-6 hits: admitted $hAdmit, bucket-mates-only $hMates")
    assert(hAdmit > hMates, "one graph hop must recover cross-bucket neighbors")
    Seq(corpus, batch, corpusEdges, admitted).foreach(_.unpersist())
  }

  test("a single LSH table is refused: expansion would never leave the bucket") {
    val e = intercept[IllegalArgumentException] {
      KnnGraph.build(prepared, nPlanes = 5, nTables = 1, dim = 64, g = 4)
    }
    assert(e.getMessage.contains("disjoint tables"))
  }
}
