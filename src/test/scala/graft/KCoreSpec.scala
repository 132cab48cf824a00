package graft

import org.apache.spark.sql.functions._
import graft.graph.KCore

/** k-core peeling: closed-form cores, full peel-away, overshoot-safe
  * round budgets, and the min-degree invariant. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def edges(ps: (Long, Long)*) = ps.toSeq.toDF("u", "v")

  test("a triangle with a hanging path: the 2-core is exactly the triangle") {
    // 1-2-3 triangle, path 3-4-5-6 hangs off it: the path peels in layers
    val g = edges((1L,2L),(1L,3L),(2L,3L),(3L,4L),(4L,5L),(5L,6L))
    val core = KCore.coreDegrees(g, k = 2, rounds = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core === Set((1L,2L), (2L,2L), (3L,2L)))
  }

  test("a tree peels to nothing; K4 survives k=3 intact") {
    val tree = edges((1L,2L),(1L,3L),(2L,4L),(2L,5L))
    assert(KCore.coreDegrees(tree, k = 2, rounds = 4).count() === 0L)
    val k4 = edges((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    val core = KCore.coreDegrees(k4, k = 3, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core === Set((1L,3L), (2L,3L), (3L,3L), (4L,3L)))
  }

  test("rounds past convergence are no-ops; every survivor keeps deg >= k") {
    val g = edges((1L,2L),(1L,3L),(2L,3L),(3L,4L),(4L,5L),(5L,6L),(2L,4L))
    val a = KCore.coreDegrees(g, k = 2, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = KCore.coreDegrees(g, k = 2, rounds = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
    assert(a.forall(_._2 >= 2L))
  }
}
