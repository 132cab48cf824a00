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
    // the distributed route (localCap = 0) must agree exactly
    val dist = KCore.coreDegrees(g, k = 2, rounds = 5, localCap = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dist === core)
  }

  test("under-budget peeling throws on the distributed route too") {
    val g = edges((1L,2L),(1L,3L),(2L,3L),(3L,4L),(4L,5L),(5L,6L))
    val ex = intercept[IllegalStateException] {
      KCore.coreDegrees(g, k = 2, rounds = 1, localCap = 0L).collect()
    }
    assert(ex.getMessage.contains("round budget"))
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

  test("under-budget peeling throws loudly instead of returning a non-core") {
    // the hanging path needs 3 peel rounds (6, then 5, then 4); a budget
    // of 1 used to silently return the partially-peeled graph
    val g = edges((1L,2L),(1L,3L),(2L,3L),(3L,4L),(4L,5L),(5L,6L))
    val ex = intercept[IllegalStateException] {
      KCore.coreDegrees(g, k = 2, rounds = 1).collect()
    }
    assert(ex.getMessage.contains("round budget"))
    // and the budget that covers the peel depth converges fine
    assert(KCore.coreDegrees(g, k = 2, rounds = 4).count() === 3L)
  }

  test("early exit: a huge budget costs only peel-depth rounds") {
    // K4 is already its own 3-core: round 1 is a no-op, so rounds=1000
    // must return immediately after it (sub-second, not 1000 jobs)
    val k4 = edges((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    val t0 = System.nanoTime()
    val core = KCore.coreDegrees(k4, k = 3, rounds = 1000).collect()
    val dt = (System.nanoTime() - t0) / 1e9
    assert(core.length === 4)
    assert(dt < 60.0, s"rounds=1000 on a converged graph took $dt s — early exit broken")
  }

  test("full peel at the exact budget throws on BOTH routes; +1 round converges empty") {
    // path 1-2-3 with k=2 peels everything in round 1 (1 and 3 doomed,
    // 2 cascades to degree 0), but the no-op round that OBSERVES
    // convergence never runs inside rounds=1 — loud-failure parity
    // requires both routes to throw there, and both to return the empty
    // core at rounds=2
    val g = edges((1L, 2L), (2L, 3L))
    for (cap <- Seq(262144L, 0L)) {
      val ex = intercept[IllegalStateException] {
        KCore.coreDegrees(g, k = 2, rounds = 1, localCap = cap).collect()
      }
      assert(ex.getMessage.contains("round budget"), s"cap=$cap")
      assert(KCore.coreDegrees(g, k = 2, rounds = 2, localCap = cap).count() === 0L,
        s"cap=$cap")
    }
  }
}
