package graft

import graft.ops.SpatialJoin

/** Crossing-number point-in-polygon join (SpatialJoin.pipJoin) vs a
  * brute-force all-pairs replay of the SAME integer rule: the grid
  * blocking must be lossless and the even–odd resolution exact. */
class PipJoinSpec extends SparkSpec {
  import spark.implicits._

  /** The reference rule, all-pairs: even–odd crossing count of the
    * +x ray, half-open in y, integer products — the exact arithmetic
    * the operator (and any oracle) must reproduce. */
  private def inside(px: Long, py: Long, ring: Seq[(Long, Long)]): Boolean = {
    var n = 0
    var i = 0
    while (i < ring.length) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % ring.length)
      if ((y1 > py) != (y2 > py)) {
        val lhs = (px - x1) * (y2 - y1)
        val rhs = (py - y1) * (x2 - x1)
        if (if (y2 > y1) lhs < rhs else lhs > rhs) n += 1
      }
      i += 1
    }
    n % 2 == 1
  }

  private def run(points: Seq[(Long, Long, Long)],
                  polys: Map[Long, Seq[(Long, Long)]],
                  cell: Long): Set[(Long, Long)] = {
    val ptDf = points.toDF("pt_id", "x", "y")
    val vx = polys.toSeq.flatMap { case (id, ring) =>
      ring.zipWithIndex.map { case ((x, y), i) => (id, i, x, y) }
    }.toDF("poly_id", "seq", "x", "y")
    SpatialJoin.pipJoin(ptDf, "pt_id", vx, "poly_id", cell)
      .select("pt_id", "poly_id").as[(Long, Long)].collect().toSet
  }

  private def brute(points: Seq[(Long, Long, Long)],
                    polys: Map[Long, Seq[(Long, Long)]]): Set[(Long, Long)] =
    (for {
      (pt, px, py) <- points
      // polys.toSeq, NOT polys: a Map as the inner generator makes the
      // inner map() rebuild a Map keyed by pt, silently collapsing a
      // point contained in several polygons down to one pair.
      (id, ring) <- polys.toSeq
      if inside(px, py, ring)
    } yield (pt, id)).toSet

  test("hand cases: square and a non-convex star, bbox-only points excluded") {
    val square = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    // 4-point star: bbox [0,20]x[0,20] but the corners are OUTSIDE
    val star = Seq((10L, 0L), (12L, 8L), (20L, 10L), (12L, 12L),
      (10L, 20L), (8L, 12L), (0L, 10L), (8L, 8L))
    val polys = Map(1L -> square, 2L -> star.map { case (x, y) => (x + 30, y) })
    val points = Seq(
      (100L, 5L, 5L),    // inside square
      (101L, 15L, 5L),   // outside both
      (102L, 40L, 10L),  // star center -> inside
      (103L, 31L, 1L),   // star bbox corner -> OUTSIDE (non-convex)
      (104L, 42L, 18L))  // between arms -> outside
    val got = run(points, polys, cell = 8)
    assert(got == brute(points, polys))
    assert(got == Set((100L, 1L), (102L, 2L)))
  }

  test("fuzz: random rings (incl. self-intersecting) vs all-pairs, two cell sizes") {
    val rnd = new scala.util.Random(7)
    // random vertex sequences: even-odd semantics is defined for ANY
    // closed ring, so no simplicity constraint is needed for parity.
    val polys = (1L to 8L).map { id =>
      val cx = rnd.nextInt(80).toLong; val cy = rnd.nextInt(80).toLong
      val nv = 3 + rnd.nextInt(6)
      id -> Seq.fill(nv)((cx + rnd.nextInt(30).toLong, cy + rnd.nextInt(30).toLong))
    }.toMap
    val points = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(110).toLong, rnd.nextInt(110).toLong))
    val want = brute(points, polys)
    assert(want.nonEmpty, "fuzz should generate some containments")
    for (cell <- Seq(5L, 64L))
      assert(run(points, polys, cell) == want, s"cell=$cell")
  }

  test("on-boundary points follow the half-open rule deterministically") {
    val square = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    val pts = Seq((1L, 0L, 5L), (2L, 10L, 5L), (3L, 5L, 0L), (4L, 5L, 10L))
    val got = run(pts, Map(1L -> square), cell = 16)
    assert(got == brute(pts, Map(1L -> square)))
  }
}
