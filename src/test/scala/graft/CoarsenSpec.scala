package graft

import graft.core.{Bounds, RasterSpec}
import graft.ops.Coarsen
import graft.scan.{AssetRow, FakeReader, Tile, TileScan}

/** Block-aggregate coarsening vs dense driver recomputation, NaN
  * semantics, edge clipping, and the alignment guard. */
class CoarsenSpec extends SparkSpec {

  private val grid = 96
  private val spec = RasterSpec(3857, Bounds(0.0, 0.0, 960.0, 960.0), 10.0, 10.0)
  private val asset = AssetRow(0, 0, "g", 0L, "fake://coarsen",
    0.0, 0.0, 960.0, 960.0, 1.0, 0.0)

  test("mean == dense driver block means on the pseudo-random field (b=4, chunked)") {
    val tiles = TileScan.scan(spark, Seq(asset), spec, chunk = 32,
      readerFor = a => FakeReader(a.url))
    val out = Coarsen.coarsen(tiles, 32, 32, grid, grid, b = 4, Coarsen.Mean).collect()
    val src = FakeReader("fake://coarsen").read(graft.core.Window(0, 0, grid, grid))
    val got = Array.fill((grid / 4) * (grid / 4))(Double.NaN)
    out.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width)
        got((t.yChunk * 8 + r) * (grid / 4) + t.xChunk * 8 + c) = t.pixels(r * t.width + c)
    }
    for (br <- 0 until grid / 4; bc <- 0 until grid / 4) {
      var s = 0.0
      for (r <- br * 4 until br * 4 + 4; c <- bc * 4 until bc * 4 + 4)
        s += src(r * grid + c)
      assert(got(br * (grid / 4) + bc) === s / 16, s"block ($br,$bc)")
    }
  }

  test("NaN pixels are skipped; an all-NaN block is NaN; Count reports valid pixels") {
    import spark.implicits._
    // one 4x4 chunk, b=2: block (0,0) has one NaN (mean over 3), block
    // (1,1) is all NaN
    val px = Array(
      1.0, 2.0, 5.0, 5.0,
      Double.NaN, 3.0, 5.0, 5.0,
      7.0, 7.0, Double.NaN, Double.NaN,
      7.0, 7.0, Double.NaN, Double.NaN)
    val tiles = spark.createDataset(Seq(Tile(0, 0, "g", 0L, 0, 0, 0, 0, 4, 4, px)))
    val m = Coarsen.coarsen(tiles, 4, 4, 4, 4, b = 2, Coarsen.Mean).collect().head.pixels
    assert(m(0) === 2.0 && m(1) === 5.0 && m(2) === 7.0 && m(3).isNaN)
    val n = Coarsen.coarsen(tiles, 4, 4, 4, 4, b = 2, Coarsen.Count).collect().head.pixels
    assert(n.toSeq === Seq(3.0, 4.0, 4.0, 0.0))
    val s = Coarsen.coarsen(tiles, 4, 4, 4, 4, b = 2, Coarsen.Sum).collect().head.pixels
    assert(s(0) === 6.0 && s(3).isNaN)
  }

  test("raster-edge blocks reduce over the clipped extent") {
    import spark.implicits._
    // 6x6 grid, chunk 4, b=2: the right/bottom chunks are 2-wide, and
    // grid 6 is block-aligned; value = row index
    def mk(yc: Int, xc: Int): Tile = {
      val h = math.min(4, 6 - yc * 4); val w = math.min(4, 6 - xc * 4)
      val px = Array.tabulate(h * w)(i => (yc * 4 + i / w).toDouble)
      Tile(0, 0, "g", 0L, yc, xc, 0, 0, h, w, px)
    }
    val tiles = spark.createDataset(for (yc <- 0 until 2; xc <- 0 until 2) yield mk(yc, xc))
    val out = Coarsen.coarsen(tiles, 4, 4, 6, 6, b = 2, Coarsen.Mean).collect()
    out.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width) {
        val want = (t.yChunk * 4 + r * 2).toDouble + 0.5 // mean of rows 2k, 2k+1
        assert(t.pixels(r * t.width + c) === want, s"(${t.yChunk},${t.xChunk}) ($r,$c)")
      }
    }
  }

  test("misaligned block factor is refused with the re-chunk / warp-average pointer") {
    val tiles = TileScan.scan(spark, Seq(asset), spec, chunk = 32,
      readerFor = a => FakeReader(a.url))
    val e = intercept[IllegalArgumentException] {
      Coarsen.coarsen(tiles, 32, 32, grid, grid, b = 5, Coarsen.Mean)
    }
    assert(e.getMessage.contains("Resampling.Average"))
  }
}
