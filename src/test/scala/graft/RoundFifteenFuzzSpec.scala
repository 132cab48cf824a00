package graft

import graft.ops.{Flow, Focal}
import graft.scan.Tile

/** Randomized property fuzz for the round-15 operators — distributed
  * result vs a straight-line driver recompute on seeded random inputs at
  * randomized chunkings (the RoundThirteen/FourteenFuzzSpec
  * discipline). */
class RoundFifteenFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def mkTiles(vals: Array[Double], g: Int, chunk: Int): Seq[Tile] = {
    val nc = (g + chunk - 1) / chunk
    for (yc <- 0 until nc; xc <- 0 until nc) yield {
      val h = math.min(chunk, g - yc * chunk)
      val w = math.min(chunk, g - xc * chunk)
      val px = Array.tabulate(h * w) { i =>
        vals((yc * chunk + i / w) * g + xc * chunk + i % w)
      }
      Tile(0, 0, "g", 0L, yc, xc, 0, 0, h, w, px)
    }
  }

  // the operator's case table, replayed independently for the oracle
  private val segTable: Array[Array[(Int, Int)]] = Array(
    Array.empty, Array((3, 2)), Array((2, 1)), Array((3, 1)), Array((0, 1)),
    Array((0, 1), (3, 2)), Array((0, 2)), Array((3, 0)), Array((3, 0)),
    Array((0, 2)), Array((3, 0), (2, 1)), Array((0, 1)), Array((3, 1)),
    Array((2, 1)), Array((3, 2)), Array.empty)

  test("contourSegments fuzz: random integer fields == driver interpolation replay, any chunking") {
    for (seed <- Seq(3, 42, 77)) {
      val rnd = new scala.util.Random(seed)
      val g = 14 + rnd.nextInt(15)
      val chunk = Seq(4, 7)(rnd.nextInt(2))
      val thr = rnd.nextInt(20) + 0.5 // half-integer: no corner ever equals it
      val vals = Array.tabulate(g * g)(_ => rnd.nextInt(22).toDouble)
      val tiles = spark.createDataset(mkTiles(vals, g, chunk))
      val got = Focal.contourSegments(tiles, chunk, chunk, g, g, Seq(thr))
        .collect()
        .map(s => (s.cellR, s.cellC, s.seg) -> (s.y1, s.x1, s.y2, s.x2)).toMap
      // driver replay with the identical IEEE expression order
      val want = scala.collection.mutable.Map.empty[(Int, Int, Int), (Double, Double, Double, Double)]
      for (r <- 1 until g - 1; c <- 1 until g - 1) {
        val tl = vals(r * g + c); val tr = vals(r * g + c + 1)
        val bl = vals((r + 1) * g + c); val br = vals((r + 1) * g + c + 1)
        var cs = 0
        if (tl >= thr) cs |= 8
        if (tr >= thr) cs |= 4
        if (br >= thr) cs |= 2
        if (bl >= thr) cs |= 1
        def y(e: Int): Double = e match {
          case 0 => r.toDouble
          case 1 => r + (thr - tr) / (br - tr)
          case 2 => (r + 1).toDouble
          case 3 => r + (thr - tl) / (bl - tl)
        }
        def x(e: Int): Double = e match {
          case 0 => c + (thr - tl) / (tr - tl)
          case 1 => (c + 1).toDouble
          case 2 => c + (thr - bl) / (br - bl)
          case 3 => c.toDouble
        }
        segTable(cs).zipWithIndex.foreach { case ((e1, e2), si) =>
          want((r, c, si)) = (y(e1), x(e1), y(e2), x(e2))
        }
      }
      assert(got.keySet == want.keySet,
        s"seed $seed: segment sets differ (got ${got.size} want ${want.size})")
      // coordinates must be BIT-IDENTICAL: same exact-input IEEE ops
      got.foreach { case (k, v) => assert(v == want(k), s"seed $seed at $k") }
    }
  }

  test("contourSegments: every segment endpoint lies on the iso-level (linear check)") {
    // on a bilinear-interpolable field the crossing parameterization
    // inverts exactly: value at the emitted vertex equals the level
    val g = 12
    val vals = Array.tabulate(g * g)(i => (i / g + 2.0 * (i % g)))
    val tiles = spark.createDataset(mkTiles(vals, g, 4))
    val segs = Focal.contourSegments(tiles, 4, 4, g, g, Seq(10.5)).collect()
    assert(segs.nonEmpty)
    segs.foreach { s =>
      // field f(y, x) = y + 2x; each vertex sits on one cell edge, so
      // linear interpolation along that edge is exact
      Seq((s.y1, s.x1), (s.y2, s.x2)).foreach { case (y, x) =>
        assert(math.abs((y + 2 * x) - 10.5) < 1e-12, s"vertex ($y,$x) off-level")
      }
    }
  }

  test("binaryAligned fuzz: SPJ result == legacy shuffled binary at random grids/items") {
    import graft.core.{Bounds, RasterSpec}
    import graft.ops.TileAlgebra
    import graft.scan.{AssetRow, FakeReader, TileScan}
    import graft.scan.v2.TileSourceV2
    for (seed <- Seq(7, 51)) {
      val rnd = new scala.util.Random(seed)
      val chunk = Seq(30, 50)(rnd.nextInt(2))
      val nChunks = 2 + rnd.nextInt(2)
      val g = chunk * nChunks - rnd.nextInt(chunk / 2) // ragged last chunk
      val items = 1 + rnd.nextInt(3)
      val spec = RasterSpec(3857, Bounds(0.0, 0.0, g * 10.0, g * 10.0), 10.0, 10.0)
      def asset(i: Int, b: String) = AssetRow(i, 0, b, i.toLong, s"fake://$b/$i/$seed",
        0.0, 0.0, g * 10.0, g * 10.0, 1.0, 0.0)
      val assets = (0 until items).flatMap(i => Seq(asset(i, "nir"), asset(i, "red")))
      val v2n = TileSourceV2.scan(spark, assets.filter(_.band == "nir"), spec,
        chunk = chunk, readerFor = a => FakeReader(a.url))
      val v2r = TileSourceV2.scan(spark, assets.filter(_.band == "red"), spec,
        chunk = chunk, readerFor = a => FakeReader(a.url))
      // NaN-safe pixel identity: ragged chunks densify with NaN padding,
      // and Seq[Double] equality would fail on NaN != NaN
      def bits(t: graft.scan.Tile) =
        t.pixels.toSeq.map(java.lang.Double.doubleToLongBits)
      val got = TileAlgebra.binaryAligned(v2n, v2r, chunk, chunk, "d")((n, r) => n - r)
        .collect().map(t => (t.itemIdx, t.yChunk, t.xChunk) -> bits(t)).toMap
      val legacy = TileScan.scan(spark, assets, spec, chunk = chunk,
        readerFor = a => FakeReader(a.url))
      val want = TileAlgebra.binary(
        legacy.filter(_.band == "nir"), legacy.filter(_.band == "red"),
        chunk, chunk, "d")((n, r) => n - r)
        .collect().map(t => (t.itemIdx, t.yChunk, t.xChunk) -> bits(t)).toMap
      assert(got.keySet == want.keySet, s"seed $seed")
      got.keys.foreach(k => assert(got(k) == want(k), s"seed $seed at $k"))
    }
  }

  test("basins fuzz: random functional forests == driver root walk") {
    for (seed <- Seq(11, 29, 63)) {
      val rnd = new scala.util.Random(seed)
      val n = 40 + rnd.nextInt(60)
      // random forest: each node i > 0 points at a random lower node
      // with probability 0.8 (strictly decreasing => acyclic)
      val edges = (1 until n).flatMap { i =>
        if (rnd.nextDouble() < 0.8) Some((i.toLong, rnd.nextInt(i).toLong)) else None
      }
      if (edges.nonEmpty) {
        val got = Flow.basins(edges.toDF("src", "dst"), rounds = 10)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val pm = edges.toMap
        def root(v: Long): Long = if (pm.contains(v)) root(pm(v)) else v
        val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
        val want = nodes.map(v => v -> root(v)).toMap
        assert(got == want, s"seed $seed: got ${got.size} want ${want.size}")
      }
    }
  }
}
