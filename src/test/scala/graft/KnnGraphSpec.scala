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

  test("a single LSH table is refused: expansion would never leave the bucket") {
    val e = intercept[IllegalArgumentException] {
      KnnGraph.build(prepared, nPlanes = 5, nTables = 1, dim = 64, g = 4)
    }
    assert(e.getMessage.contains("disjoint tables"))
  }
}
