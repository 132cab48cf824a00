package graft

import org.apache.spark.sql.functions._
import graft.ops.{Contour, Focal}

/** Hand oracles for contour polyline stitching and the Wyllie-ranked
  * ordered-vertex export (ops.Contour). Segments are fed directly (the
  * raster → segment half is FocalSpec/fuzz territory); vertex keys here
  * are hand-packed quantized coordinates. */
class ContourSpec extends SparkSpec {
  import spark.implicits._

  // pack a (y, x) grid coordinate the way stitch does (quantum 1024)
  private def k(y: Double, x: Double): Long =
    (math.round(y * 1024.0) << 32) + math.round(x * 1024.0)

  private def seg(level: Double, a: Long, b: Long, idx: Int) =
    Focal.ContourSeg(level, idx, 0, 0,
      (a >> 32).toDouble / 1024.0, (a & 0xFFFFFFFFL).toDouble / 1024.0,
      (b >> 32).toDouble / 1024.0, (b & 0xFFFFFFFFL).toDouble / 1024.0)

  test("stitch + census: one open path and one ring, labeled and classified") {
    // path P: p0-p1-p2 (2 segments); ring R: r0-r1-r2-r3-r0 (4 segments)
    val p = Seq(k(1, 1.5), k(1.5, 2), k(2, 2.5))
    val r = Seq(k(5, 5.5), k(5.5, 6), k(6, 5.5), k(5.5, 5))
    val segs = Seq(
      seg(7.5, p(0), p(1), 0), seg(7.5, p(1), p(2), 1),
      seg(7.5, r(0), r(1), 2), seg(7.5, r(1), r(2), 3),
      seg(7.5, r(2), r(3), 4), seg(7.5, r(3), r(0), 5))
    val st = Contour.stitch(spark.createDataset(segs))
    val cen = Contour.census(st).collect()
      .map(row => row.getLong(1) -> (row.getLong(2), row.getLong(3), row.getBoolean(4))).toMap
    // poly id = min vertex key of the component
    assert(cen(p.min) == (2L, 3L, false)) // 2 segments, 3 vertices, open
    assert(cen(r.min) == (4L, 4L, true))  // 4 segments, 4 vertices, ring
  }

  test("orderedVertices: path runs min-end to other end; ring closes first==last from min vertex") {
    val p = Seq(k(1, 1.5), k(1.5, 2), k(2, 2.5))
    val r = Seq(k(5, 5.5), k(5.5, 6), k(6, 5.5), k(5.5, 5))
    val segs = Seq(
      // path segments deliberately out of order and reversed
      seg(7.5, p(2), p(1), 0), seg(7.5, p(0), p(1), 1),
      seg(7.5, r(1), r(0), 2), seg(7.5, r(2), r(1), 3),
      seg(7.5, r(3), r(2), 4), seg(7.5, r(0), r(3), 5))
    val ov = Contour.orderedVertices(Contour.stitch(spark.createDataset(segs)), rounds = 8)
      .select($"poly", $"ord",
        (round($"y" * 1024.0).cast("long") * lit(1L << 32)
          + round($"x" * 1024.0).cast("long")).as("k"))
      .collect().map(row => (row.getLong(0), row.getLong(1)) -> row.getLong(2)).toMap
    // path: start = min degree-1 endpoint = min(p0, p2) = p0 (keys ascend)
    val pid = p.min
    assert(ov((pid, 0L)) == p(0) && ov((pid, 1L)) == p(1) && ov((pid, 2L)) == p(2))
    // ring: start = min vertex; first step toward its MIN neighbor;
    // r.min = k(5,5.5)=r0 whose neighbors are r1 and r3 -> min(r1, r3)
    val rid = r.min
    val next = Seq(r(1), r(3)).min
    assert(ov((rid, 0L)) == r(0) && ov((rid, 1L)) == next)
    assert(ov((rid, 4L)) == r(0), "ring must close first==last")
    assert(ov.count(_._1._1 == rid) == 5) // 4 vertices + closing repeat
  }

  test("orderedVertices: under-budget throws loudly on the Wyllie route") {
    // a 40-segment path needs ceil(log2(40)) = 6 rounds; 2 is not enough.
    // sequentialCap = 0 forces every poly onto the Wyllie route (the
    // size router would otherwise walk this small line sequentially).
    val vs = (0 to 40).map(i => k(i, i + 0.5))
    val segs = vs.sliding(2).zipWithIndex.map { case (Seq(a, b), i) =>
      seg(3.5, a, b, i) }.toSeq
    val ex = intercept[IllegalStateException] {
      Contour.orderedVertices(Contour.stitch(spark.createDataset(segs)),
          rounds = 2, sequentialCap = 0)
        .count()
    }
    assert(ex.getMessage.contains("round budget"))
  }

  test("size routing is invisible: sequential and Wyllie routes agree exactly") {
    // mixed set: open path + ring, each pushed down BOTH routes
    val p = Seq(k(1, 1.5), k(1.5, 2), k(2, 2.5), k(2.5, 3), k(3, 3.5))
    val r = Seq(k(5, 5.5), k(5.5, 6), k(6, 5.5), k(5.5, 5))
    val segs = Seq(
      seg(7.5, p(2), p(1), 0), seg(7.5, p(0), p(1), 1),
      seg(7.5, p(3), p(2), 6), seg(7.5, p(4), p(3), 7),
      seg(7.5, r(1), r(0), 2), seg(7.5, r(2), r(1), 3),
      seg(7.5, r(3), r(2), 4), seg(7.5, r(0), r(3), 5))
    val st = Contour.stitch(spark.createDataset(segs))
    def rows(cap: Int) =
      Contour.orderedVertices(st, rounds = 8, sequentialCap = cap)
        .collect().map(row => (row.getDouble(0), row.getLong(1), row.getLong(2),
          row.getDouble(3), row.getDouble(4))).sortBy(t => (t._1, t._2, t._3))
    assert(rows(4096).toSeq == rows(0).toSeq)
  }
}
