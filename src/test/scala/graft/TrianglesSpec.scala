package graft

import org.apache.spark.sql.functions._
import graft.graph.Triangles

/** Triangle enumeration: exact counts on closed-form graphs, the
  * orientation's hub bound, and the sorted-triple output contract. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def edges(ps: (Long, Long)*) = ps.toSeq.toDF("u", "v")

  test("K4: four triangles, every node on three of them") {
    val k4 = edges((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    val tri = Triangles.triangles(k4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tri === Set((1L,2L,3L), (1L,2L,4L), (1L,3L,4L), (2L,3L,4L)))
    val census = Triangles.participationCensus(k4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(census.toSeq === Seq((3L, 4L, 10L)))
  }

  test("a tree has no triangles; a census over it is empty") {
    val path = edges((1L,2L),(2L,3L),(3L,4L),(4L,5L))
    assert(Triangles.triangles(path).count() === 0L)
    assert(Triangles.participationCensus(path).count() === 0L)
  }

  test("hub star: orientation points INTO the hub, so the hub spawns no wedges") {
    // star centre 100 with 6 spokes, plus one closing edge between two spokes:
    // exactly one triangle. A non-oriented wedge join would generate
    // C(6,2)=15 hub wedges; orientation makes each spoke (degree 1 or 2)
    // the source, so the wedge space stays linear in the spokes.
    val star = edges((1L,100L),(2L,100L),(3L,100L),(4L,100L),(5L,100L),(6L,100L),(1L,2L))
    val tri = Triangles.triangles(star).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(tri === Seq((1L, 2L, 100L)))
  }

  test("triples come out sorted x < y < z regardless of pivot position") {
    // pivot is the middle / largest / smallest node in different triangles
    val g = edges((1L,2L),(1L,3L),(2L,3L),(2L,4L),(3L,4L))
    val rows = Triangles.triangles(g).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1) && r.getLong(1) < r.getLong(2), r.toString)
    }
    assert(rows.length === 2) // (1,2,3) and (2,3,4)
  }
}
