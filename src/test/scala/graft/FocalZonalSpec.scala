package graft

import graft.core.{Bounds, RasterSpec}
import graft.ops.{Focal, Zonal, Zone}
import graft.scan.{AssetRow, FakeReader, ModRampReader, Tile, TileScan}

/** Driver-side oracles for the round-13 raster ops: the halo-exchange
  * stencil (ops.Focal) and broadcast-zone zonal statistics (ops.Zonal).
  * Both are checked against straight-line dense recomputation on the
  * driver — the `test_items_to_dask` oracle pattern
  * (reference `tests/test_to_dask.py:96-175`). */
class FocalZonalSpec extends SparkSpec {

  private val grid = 96 // 96x96 grid, chunk 32 -> 3x3 chunks, real halos
  private val spec = RasterSpec(3857, Bounds(0.0, 0.0, 960.0, 960.0), 10.0, 10.0)
  private val asset = AssetRow(0, 0, "g", 0L, "fake://focal",
    0.0, 0.0, 960.0, 960.0, 1.0, 0.0)

  /** Dense driver-side render of one asset via its reader. */
  private def dense(readerUrl: String): Array[Double] = {
    val r = FakeReader(readerUrl)
    r.read(graft.core.Window(0, 0, grid, grid))
  }

  test("focalSum3x3 == driver dense stencil (pseudo-random field, chunked, halos)") {
    import spark.implicits._
    val tiles = TileScan.scan(spark, Seq(asset), spec, chunk = 32,
      readerFor = a => FakeReader(a.url))
    val out = Focal.focalSum3x3(tiles, 32, 32, grid, grid).collect()
    val src = dense("fake://focal")
    val got = Array.fill(grid * grid)(Double.NaN)
    out.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width)
        got((t.yChunk * 32 + r) * grid + t.xChunk * 32 + c) = t.pixels(r * t.width + c)
    }
    for (r <- 0 until grid; c <- 0 until grid) {
      val want =
        if (r < 1 || r > grid - 2 || c < 1 || c > grid - 2) Double.NaN
        else {
          var s = 0.0
          for (dr <- -1 to 1; dc <- -1 to 1) s += src((r + dr) * grid + c + dc)
          s
        }
      val g = got(r * grid + c)
      assert(g == want || (g.isNaN && want.isNaN), s"($r,$c): got $g want $want")
    }
  }

  test("focalMajority3x3 == driver dense mode with smallest-class tiebreak") {
    import spark.implicits._
    val tiles = TileScan.scan(spark, Seq(asset), spec, chunk = 32,
        readerFor = a => FakeReader(a.url))
      .map(t => t.copy(pixels = t.pixels.map(v =>
        if (v.isNaN) Double.NaN else math.abs(v % 5))))
    val out = Focal.focalMajority3x3(tiles, 32, 32, grid, grid).collect()
    val src = dense("fake://focal").map(v =>
      if (v.isNaN) Double.NaN else math.abs(v % 5))
    val got = Array.fill(grid * grid)(Double.NaN)
    out.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width)
        got((t.yChunk * 32 + r) * grid + t.xChunk * 32 + c) = t.pixels(r * t.width + c)
    }
    var checkedTie = false
    for (r <- 0 until grid; c <- 0 until grid) {
      val want =
        if (r < 1 || r > grid - 2 || c < 1 || c > grid - 2) Double.NaN
        else {
          val vs = for (dr <- -1 to 1; dc <- -1 to 1)
            yield src((r + dr) * grid + c + dc)
          val byCount = vs.groupBy(identity).map { case (v, g) => (v, g.size) }
          val maxN = byCount.values.max
          val tied = byCount.filter(_._2 == maxN).keys
          if (tied.size > 1) checkedTie = true
          tied.min
        }
      val g = got(r * grid + c)
      assert(g == want || (g.isNaN && want.isNaN), s"($r,$c): got $g want $want")
    }
    assert(checkedTie, "the fixture should exercise the tiebreak")
  }

  test("focalSum3x3: interior NaN hole invalidates its 3x3 neighborhood only") {
    import spark.implicits._
    // Hand-built sparse tiles: full 8x8 grid as 4 chunks of 4, value = 1
    // everywhere except a NaN at (3, 4) — a chunk-border-adjacent hole.
    val g = 8
    def mk(yc: Int, xc: Int): Tile = {
      val px = Array.tabulate(16) { i =>
        val r = yc * 4 + i / 4; val c = xc * 4 + i % 4
        if (r == 3 && c == 4) Double.NaN else 1.0
      }
      Tile(0, 0, "g", 0L, yc, xc, 0, 0, 4, 4, px)
    }
    val tiles = spark.createDataset(for (yc <- 0 to 1; xc <- 0 to 1) yield mk(yc, xc))
    val out = Focal.focalSum3x3(tiles, 4, 4, g, g).collect()
    val got = Array.fill(g * g)(Double.NaN)
    out.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width)
        got((t.yChunk * 4 + r) * g + t.xChunk * 4 + c) = t.pixels(r * t.width + c)
    }
    for (r <- 1 to g - 2; c <- 1 to g - 2) {
      val touchesHole = math.abs(r - 3) <= 1 && math.abs(c - 4) <= 1
      val v = got(r * g + c)
      if (touchesHole) assert(v.isNaN, s"($r,$c) should be NaN")
      else assert(v == 9.0, s"($r,$c) got $v")
    }
  }

  test("focalSum3x3 is parallelism-invariant (4 vs 1 partitions)") {
    import spark.implicits._
    val tiles = TileScan.scan(spark, Seq(asset), spec, chunk = 32,
      readerFor = a => FakeReader(a.url))
    val a = Focal.focalSum3x3(tiles, 32, 32, grid, grid)
      .collect().sortBy(t => (t.yChunk, t.xChunk))
    val b = Focal.focalSum3x3(tiles.repartition(1), 32, 32, grid, grid)
      .collect().sortBy(t => (t.yChunk, t.xChunk))
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.yChunk == y.yChunk && x.xChunk == y.xChunk)
      x.pixels.zip(y.pixels).foreach { case (p, q) =>
        assert(p == q || (p.isNaN && q.isNaN))
      }
    }
  }

  test("gaussSum5x5 == driver dense 5x5 binomial stencil (depth-2 halos)") {
    import spark.implicits._
    val tiles = TileScan.scan(spark, Seq(asset), spec, chunk = 32,
      readerFor = a => FakeReader(a.url))
    val out = Focal.gaussSum5x5(tiles, 32, 32, grid, grid).collect()
    val src = dense("fake://focal")
    val got = Array.fill(grid * grid)(Double.NaN)
    out.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width)
        got((t.yChunk * 32 + r) * grid + t.xChunk * 32 + c) = t.pixels(r * t.width + c)
    }
    val w = Array(1.0, 4.0, 6.0, 4.0, 1.0)
    for (r <- 0 until grid; c <- 0 until grid) {
      val want =
        if (r < 2 || r > grid - 3 || c < 2 || c > grid - 3) Double.NaN
        else {
          var s = 0.0
          for (dr <- -2 to 2; dc <- -2 to 2)
            s += w(dr + 2) * w(dc + 2) * src((r + dr) * grid + c + dc)
          s
        }
      val g = got(r * grid + c)
      assert(g == want || (g.isNaN && want.isNaN), s"($r,$c): got $g want $want")
    }
  }

  test("terrainIndices3x3 == driver dense TPI/TRI/roughness; NaN hole; fused bands") {
    import spark.implicits._
    val tiles = TileScan.scan(spark, Seq(asset), spec, chunk = 32,
      readerFor = a => FakeReader(a.url))
    val out = Focal.terrainIndices3x3(tiles, 32, 32, grid, grid).collect()
    val src = dense("fake://focal")
    // three bands, each a full chunk cover
    val bands = out.map(_.band).distinct.sorted
    assert(bands.toSeq == Seq("g_rough", "g_tpi8", "g_trisq"))
    val got = Map(
      "g_tpi8" -> Array.fill(grid * grid)(Double.NaN),
      "g_trisq" -> Array.fill(grid * grid)(Double.NaN),
      "g_rough" -> Array.fill(grid * grid)(Double.NaN))
    out.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width)
        got(t.band)((t.yChunk * 32 + r) * grid + t.xChunk * 32 + c) =
          t.pixels(r * t.width + c)
    }
    for (r <- 0 until grid; c <- 0 until grid) {
      val border = r < 1 || r > grid - 2 || c < 1 || c > grid - 2
      val (wT, wR, wG) =
        if (border) (Double.NaN, Double.NaN, Double.NaN)
        else {
          val zC = src(r * grid + c)
          var sum = 0.0; var sq = 0.0; var mn = zC; var mx = zC
          for (dr <- -1 to 1; dc <- -1 to 1 if dr != 0 || dc != 0) {
            val zN = src((r + dr) * grid + c + dc)
            sum += zN; sq += (zC - zN) * (zC - zN)
            mn = math.min(mn, zN); mx = math.max(mx, zN)
          }
          (8.0 * zC - sum, sq, mx - mn)
        }
      def eq(g: Double, w: Double) = g == w || (g.isNaN && w.isNaN)
      assert(eq(got("g_tpi8")(r * grid + c), wT), s"tpi ($r,$c)")
      assert(eq(got("g_trisq")(r * grid + c), wR), s"tri ($r,$c)")
      assert(eq(got("g_rough")(r * grid + c), wG), s"rough ($r,$c)")
    }
  }

  test("terrainIndices3x3: NaN hole invalidates its 3x3 neighborhood in ALL bands") {
    import spark.implicits._
    val g = 8
    val px = Array.tabulate(g * g)(i => (i % 7).toDouble)
    px(3 * g + 3) = Double.NaN
    val tiles = spark.createDataset(Seq(
      Tile(0, 0, "z", 0L, 0, 0, 0, 0, g, g, px)))
    val out = Focal.terrainIndices3x3(tiles, g, g, g, g).collect()
    for (t <- out; r <- 1 until g - 1; c <- 1 until g - 1) {
      val v = t.pixels(r * g + c)
      val nearHole = math.abs(r - 3) <= 1 && math.abs(c - 3) <= 1
      assert(v.isNaN == nearHole, s"${t.band} ($r,$c): $v nearHole=$nearHole")
    }
  }

  test("terrainIndices3x3 is parallelism-invariant (4 vs 1 partitions)") {
    import spark.implicits._
    val tiles = TileScan.scan(spark, Seq(asset), spec, chunk = 32,
      readerFor = a => FakeReader(a.url))
    def census(ts: org.apache.spark.sql.Dataset[Tile]) =
      Focal.terrainIndices3x3(ts, 32, 32, grid, grid).collect()
        .map(t => (t.band, t.yChunk, t.xChunk) ->
          t.pixels.filterNot(_.isNaN).sum).toMap
    assert(census(tiles) == census(tiles.repartition(1)))
  }

  test("halo depth must stay under the chunk size (loud guard)") {
    import spark.implicits._
    // depth 2 needs chunk > 2: a 2-pixel chunk would need fragments
    // beyond the 8-neighbor exchange
    val tiny = spark.createDataset(Seq(
      Tile(0, 0, "g", 0L, 0, 0, 0, 0, 2, 2, Array(1.0, 2.0, 3.0, 4.0))))
    val ex = intercept[IllegalArgumentException] {
      Focal.gaussSum5x5(tiny, 2, 2, 4, 4).collect()
    }
    assert(ex.getMessage.contains("halo depth"))
  }

  test("hillshade3x3 == driver dense Horn+trig recompute; flat DEM shades flat") {
    import spark.implicits._
    val tiles = TileScan.scan(spark, Seq(asset), spec, chunk = 32,
      readerFor = a => FakeReader(a.url))
    val out = Focal.hillshade3x3(tiles, 32, 32, grid, grid, cellSize = 10.0).collect()
    val src = dense("fake://focal")
    val got = Array.fill(grid * grid)(Double.NaN)
    out.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width)
        got((t.yChunk * 32 + r) * grid + t.xChunk * 32 + c) = t.pixels(r * t.width + c)
    }
    val zen = math.toRadians(45.0); val azM = math.toRadians(135.0)
    for (r <- 1 until grid - 1; c <- 1 until grid - 1) {
      def z(rr: Int, cc: Int) = src(rr * grid + cc)
      val dx = ((z(r-1,c+1) + 2*z(r,c+1) + z(r+1,c+1)) -
                (z(r-1,c-1) + 2*z(r,c-1) + z(r+1,c-1))) / 80.0
      val dy = ((z(r+1,c-1) + 2*z(r+1,c) + z(r+1,c+1)) -
                (z(r-1,c-1) + 2*z(r-1,c) + z(r-1,c+1))) / 80.0
      val slope = math.atan(math.sqrt(dx*dx + dy*dy))
      val hs = 255.0 * (math.cos(zen)*math.cos(slope) +
        math.sin(zen)*math.sin(slope)*math.cos(azM - math.atan2(dy, -dx)))
      val want = if (hs < 0) 0.0 else hs
      assert(got(r * grid + c) == want, s"($r,$c)")
    }
    // flat DEM: slope 0 => shade = 255*cos(zen) everywhere interior
    val flat = spark.createDataset(for (yc <- 0 to 1; xc <- 0 to 1) yield
      Tile(0, 0, "g", 0L, yc, xc, 0, 0, 4, 4, Array.fill(16)(7.0)))
    val f = Focal.hillshade3x3(flat, 4, 4, 8, 8, cellSize = 10.0).collect()
    val expect = 255.0 * math.cos(zen)
    f.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width) {
        val gr = t.yChunk * 4 + r; val gc = t.xChunk * 4 + c
        val v = t.pixels(r * t.width + c)
        if (gr >= 1 && gr <= 6 && gc >= 1 && gc <= 6)
          assert(v == expect, s"($gr,$gc) $v")
        else assert(v.isNaN)
      }
    }
  }

  test("marchingSquaresCase: all 16 cases on a hand grid; halo cells correct") {
    import spark.implicits._
    // 2-chunk grid whose cell (3, y) spans the chunk border: values
    // above/below threshold 10 arranged per-pixel from a closed form
    val g = 8
    def v(r: Int, c: Int): Double = if (((r * 3 + c * 5) % 7) >= 3) 20.0 else 0.0
    def mk(yc: Int, xc: Int): Tile = {
      val px = Array.tabulate(16) { i => v(yc * 4 + i / 4, xc * 4 + i % 4) }
      Tile(0, 0, "g", 0L, yc, xc, 0, 0, 4, 4, px)
    }
    val tiles = spark.createDataset(for (yc <- 0 to 1; xc <- 0 to 1) yield mk(yc, xc))
    val out = Focal.marchingSquaresCase(tiles, 4, 4, g, g, threshold = 10.0).collect()
    out.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width) {
        val gr = t.yChunk * 4 + r; val gc = t.xChunk * 4 + c
        val gotV = t.pixels(r * t.width + c)
        if (gr >= 1 && gr <= g - 2 && gc >= 1 && gc <= g - 2) {
          var cs = 0
          if (v(gr, gc) >= 10.0) cs |= 8
          if (v(gr, gc + 1) >= 10.0) cs |= 4
          if (v(gr + 1, gc + 1) >= 10.0) cs |= 2
          if (v(gr + 1, gc) >= 10.0) cs |= 1
          assert(gotV == cs.toDouble, s"($gr,$gc): got $gotV want $cs")
        } else assert(gotV.isNaN, s"($gr,$gc) border should be NaN")
      }
    }
  }

  test("hornGradSq3x3: constant-gradient DEM gives the closed form everywhere") {
    import spark.implicits._
    // v(r,c) = 3r + 5c: gx = 8*5 = 40, gy = 8*3 = 24 at every interior
    // pixel -> gx^2+gy^2 = 2176 exactly, across every chunk border.
    val g = 8
    def mk(yc: Int, xc: Int): Tile = {
      val px = Array.tabulate(16) { i =>
        val r = yc * 4 + i / 4; val c = xc * 4 + i % 4
        (3 * r + 5 * c).toDouble
      }
      Tile(0, 0, "g", 0L, yc, xc, 0, 0, 4, 4, px)
    }
    val tiles = spark.createDataset(
      for (yc <- 0 until 2; xc <- 0 until 2) yield mk(yc, xc))
    val out = Focal.hornGradSq3x3(tiles, 4, 4, g, g).collect()
    for (t <- out; r <- 0 until t.height; c <- 0 until t.width) {
      val gr = t.yChunk * 4 + r; val gc = t.xChunk * 4 + c
      val v = t.pixels(r * t.width + c)
      if (gr < 1 || gr > g - 2 || gc < 1 || gc > g - 2)
        assert(v.isNaN, s"edge ($gr,$gc) must be NaN, got $v")
      else assert(v === 2176.0, s"interior ($gr,$gc): got $v")
    }
  }

  test("hornGradSq3x3 == driver dense Horn kernel on the pseudo-random field") {
    import spark.implicits._
    val tiles = TileScan.scan(spark, Seq(asset), spec, chunk = 32,
      readerFor = a => FakeReader(a.url))
    val out = Focal.hornGradSq3x3(tiles, 32, 32, grid, grid).collect()
    val src = dense("fake://focal")
    val got = Array.fill(grid * grid)(Double.NaN)
    out.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width)
        got((t.yChunk * 32 + r) * grid + t.xChunk * 32 + c) = t.pixels(r * t.width + c)
    }
    def z(r: Int, c: Int) = src(r * grid + c)
    for (r <- 1 until grid - 1; c <- 1 until grid - 1) {
      val gx = (z(r-1,c+1) + 2*z(r,c+1) + z(r+1,c+1)) - (z(r-1,c-1) + 2*z(r,c-1) + z(r+1,c-1))
      val gy = (z(r+1,c-1) + 2*z(r+1,c) + z(r+1,c+1)) - (z(r-1,c-1) + 2*z(r-1,c) + z(r-1,c+1))
      assert(got(r * grid + c) === gx * gx + gy * gy, s"($r,$c)")
    }
  }

  test("d8Flow3x3: tilted plane drains NW everywhere; a flat codes -1; ties take ESRI order") {
    import spark.implicits._
    // v = 3r + 5c: drops are W 5, NW 8/sqrt2 ~ 5.657, N 3 -> NW (32) wins
    val g = 8
    def mk(yc: Int, xc: Int, f: (Int, Int) => Double): Tile = {
      val px = Array.tabulate(16) { i => f(yc * 4 + i / 4, xc * 4 + i % 4) }
      Tile(0, 0, "g", 0L, yc, xc, 0, 0, 4, 4, px)
    }
    val plane = spark.createDataset(
      for (yc <- 0 until 2; xc <- 0 until 2) yield mk(yc, xc, (r, c) => (3 * r + 5 * c).toDouble))
    for (t <- Focal.d8Flow3x3(plane, 4, 4, g, g).collect();
         r <- 0 until t.height; c <- 0 until t.width) {
      val gr = t.yChunk * 4 + r; val gc = t.xChunk * 4 + c
      val v = t.pixels(r * t.width + c)
      if (gr < 1 || gr > g - 2 || gc < 1 || gc > g - 2) assert(v.isNaN)
      else assert(v === 32.0, s"($gr,$gc)")
    }
    val flat = spark.createDataset(
      for (yc <- 0 until 2; xc <- 0 until 2) yield mk(yc, xc, (_, _) => 7.0))
    for (t <- Focal.d8Flow3x3(flat, 4, 4, g, g).collect();
         r <- 0 until t.height; c <- 0 until t.width
         if !t.pixels(r * t.width + c).isNaN)
      assert(t.pixels(r * t.width + c) === -1.0)
    // explicit E/W tie on a single 3x3 grid: both drops 1 -> E (code 1) first
    val tiePx = Array(10.0, 10.0, 10.0, 9.0, 10.0, 9.0, 10.0, 10.0, 10.0)
    val tie = spark.createDataset(Seq(Tile(0, 0, "g", 0L, 0, 0, 0, 0, 3, 3, tiePx)))
    val out = Focal.d8Flow3x3(tie, 3, 3, 3, 3).collect()
    assert(out.length === 1)
    assert(out.head.pixels(1 * 3 + 1) === 1.0, "tie must take the first ESRI code (E)")
  }

  test("zonal stats == driver dense point-in-polygon census") {
    val tiles = TileScan.scan(spark, Seq(asset), spec, chunk = 32,
      readerFor = _ => ModRampReader(97))
    val zones = Seq(
      Zone(1, Array(50.0, 500.0, 200.0), Array(50.0, 100.0, 400.0)),
      Zone(2, Array(300.0, 900.0, 800.0, 250.0), Array(500.0, 550.0, 930.0, 880.0)))
    val got = Zonal.stats(tiles, spec, 32, 32, zones)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // driver oracle
    val want = zones.map { z =>
      var n = 0L; var s = 0L; var chk = 0L
      for (r <- 0 until grid; c <- 0 until grid) {
        val px = (c * 10 + 5).toDouble; val py = (960 - r * 10 - 5).toDouble
        if (z.contains(px, py)) {
          val q = (r.toLong * r + c.toLong * c) % 97
          n += 1; s += q; chk += q * (r.toLong * grid + c)
        }
      }
      z.zoneId -> ((n, s, chk))
    }.toMap
    assert(got == want)
  }

  test("zonal stats: zone fully outside the raster yields no row") {
    val tiles = TileScan.scan(spark, Seq(asset), spec, chunk = 32,
      readerFor = _ => ModRampReader(97))
    val out = Zonal.stats(tiles, spec, 32, 32,
      Seq(Zone(9, Array(5000.0, 6000.0, 5500.0), Array(5000.0, 5000.0, 6000.0)))).collect()
    assert(out.isEmpty)
  }

  test("Zone guards degenerate vertex lists") {
    intercept[IllegalArgumentException] {
      Zone(1, Array(0.0, 1.0), Array(0.0, 1.0))
    }
  }

  test("zonal stats is parallelism-invariant") {
    val tiles = TileScan.scan(spark, Seq(asset), spec, chunk = 32,
      readerFor = _ => ModRampReader(97))
    val zones = Seq(Zone(1, Array(50.0, 500.0, 200.0), Array(50.0, 100.0, 400.0)))
    val a = Zonal.stats(tiles, spec, 32, 32, zones).collect().toSeq
    val b = Zonal.stats(tiles.repartition(1), spec, 32, 32, zones).collect().toSeq
    assert(a == b)
  }
}
