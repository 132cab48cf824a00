package graft

import org.scalacheck.Gen
import graft.core.{Bounds, RasterSpec, Window}
import graft.scan._

/** The reference's core-engine oracle pattern
  * (`tests/test_to_dask.py:23-187`): generate random asset tables with
  * random bounds and missing entries, materialize the expected full array
  * on the driver using the same deterministic reader, and assert the
  * engine's sparse tile output reconstructs it exactly.
  */
final case class BoomReader() extends Reader {
  def read(w: Window): Array[Double] = throw new RuntimeException("boom 404")
}

class TileScanSpec extends SparkSpec with GenChecks {

  private val spec = RasterSpec(4326, Bounds(-4, -4, 4, 4), 0.5, 0.5) // 16x16
  private val chunk = 8

  private def genAssets(nItems: Int, nBands: Int): Gen[Seq[AssetRow]] = {
    val cell = for {
      missing <- Gen.prob(0.3)
      x0 <- Gen.choose(-8, 6); y0 <- Gen.choose(-8, 6)
      w <- Gen.choose(0, 8); h <- Gen.choose(0, 8)
    } yield (missing, Bounds(x0, y0, x0 + w, y0 + h))
    Gen.listOfN(nItems * nBands, cell).map { cells =>
      cells.zipWithIndex.map { case ((missing, b), k) =>
        val i = k / nBands; val j = k % nBands
        AssetRow(i, j, s"b$j", i.toLong * 1000000L,
                 if (missing) null else s"fake://$i/$j",
                 b.minx, b.miny, b.maxx, b.maxy, 1.0, 0.0)
      }
    }
  }

  /** Driver-side expected array: (item, band) -> full (h, w) grid of NaN,
    * with the asset's window filled from the same FakeReader. */
  private def expected(assets: Seq[AssetRow]): Map[(Int, Int), Array[Double]] = {
    val (h, w) = spec.shape
    assets.map { a =>
      val grid = Array.fill(h * w)(Double.NaN)
      if (a.url != null) {
        val win = spec.windowFor(a.bounds).intersect(Window(0, 0, w, h))
        if (!win.isEmpty) {
          val px = FakeReader(a.url).read(win)
          for (r <- 0 until win.height; c <- 0 until win.width)
            grid((win.rowOff + r) * w + win.colOff + c) = px(r * win.width + c)
        }
      }
      (a.itemIdx, a.assetIdx) -> grid
    }.toMap
  }

  private def reconstruct(tiles: Seq[Tile]): Map[(Int, Int), Array[Double]] = {
    val (h, w) = spec.shape
    tiles.groupBy(t => (t.itemIdx, t.assetIdx)).view.mapValues { ts =>
      val grid = Array.fill(h * w)(Double.NaN)
      ts.foreach { t =>
        for (r <- 0 until t.height; c <- 0 until t.width)
          grid((t.yChunk * chunk + t.rowOff + r) * w + t.xChunk * chunk + t.colOff + c) =
            t.pixels(r * t.width + c)
      }
      grid
    }.toMap
  }

  private def sameArr(a: Array[Double], b: Array[Double]): Boolean =
    a.length == b.length && a.indices.forall(i => a(i) == b(i) || (a(i).isNaN && b(i).isNaN))

  test("scan reconstructs the oracle array (fuzz)") {
    forAllN(Gen.zip(Gen.choose(1, 4), Gen.choose(1, 3)).flatMap {
      case (ni, nb) => genAssets(ni, nb) }, n = 15) { assets =>
      val tiles = TileScan.scan(spark, assets, spec, chunk).collect().toSeq
      val got = reconstruct(tiles)
      val want = expected(assets)
      // every tile produced must match the oracle
      got.foreach { case (k, grid) => assert(sameArr(grid, want(k)), s"mismatch at $k") }
      // every non-empty oracle grid must be covered by tiles
      want.foreach { case (k, grid) =>
        if (grid.exists(!_.isNaN)) assert(got.contains(k), s"missing tiles for $k")
      }
      // sparse elision: no all-NaN tile rows (R4)
      tiles.foreach(t => assert(t.pixels.exists(!_.isNaN)))
    }
  }

  test("missing assets and non-overlapping assets produce no tiles") {
    val assets = Seq(
      AssetRow(0, 0, "b0", 0L, null, -4, -4, 4, 4, 1.0, 0.0),       // missing
      AssetRow(1, 0, "b0", 1L, "fake://1/0", 100, 100, 108, 108, 1.0, 0.0)) // outside
    assert(TileScan.scan(spark, assets, spec, chunk).collect().isEmpty)
  }

  test("rescale applies x*scale+offset (skipped when identity)") {
    val assets = Seq(AssetRow(0, 0, "b0", 0L, "fake://0/0", -4, -4, 4, 4, 2.0, 10.0))
    val plain  = Seq(AssetRow(0, 0, "b0", 0L, "fake://0/0", -4, -4, 4, 4, 1.0, 0.0))
    val a = TileScan.scan(spark, assets, spec, chunk).collect()
      .sortBy(t => (t.yChunk, t.xChunk))
    val b = TileScan.scan(spark, plain, spec, chunk).collect()
      .sortBy(t => (t.yChunk, t.xChunk))
    assert(a.length == b.length)
    a.zip(b).foreach { case (ta, tb) =>
      ta.pixels.zip(tb.pixels).foreach { case (x, y) =>
        assert(math.abs(x - (y * 2.0 + 10.0)) < 1e-9)
      }
    }
  }

  test("errors-as-nodata recovers matching exceptions") {
    val assets = Seq(AssetRow(0, 0, "b0", 0L, "fake://0/0", -4, -4, 4, 4, 1.0, 0.0))
    val policy = ErrorsAsNodata(Seq((classOf[RuntimeException], "404")))
    val tiles = TileScan.scan(spark, assets, spec, chunk,
      readerFor = _ => BoomReader(), errorsAsNodata = policy).collect()
    assert(tiles.isEmpty) // all-NaN reads are elided
    // non-matching error propagates
    val bad = ErrorsAsNodata(Seq((classOf[IllegalStateException], "")))
    intercept[org.apache.spark.SparkException] {
      TileScan.scan(spark, assets, spec, chunk,
        readerFor = _ => BoomReader(), errorsAsNodata = bad).collect()
    }
  }
}
