package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{AffineTransform, Bounds, Proj, RasterSpec, Window}
import graft.scan.{RampReader, Warp, WarpedGridReader}

/** Driver-side oracles for the WarpedVRT-lite gather (reference
  * `rio_reader.py:344-360`): output-pixel centers routed through the
  * (optional) CRS hop and the inverse source affine, nearest-neighbor. */
class WarpSpec extends AnyFunSuite {

  test("same-CRS scaled/offset grid: warp equals direct affine sampling") {
    val spec = RasterSpec(3857, Bounds(1000.0, 1000.0, 2000.0, 2000.0), 10.0, 10.0) // 100x100
    val srcTf = AffineTransform.northUp(900.0, 2100.0, 8.0, 8.0) // 150x150 @8m
    val r = WarpedGridReader(RampReader(150), srcTf, 3857, 150, 150, spec)
    val px = r.read(Window(0, 0, 100, 100))
    val inv = srcTf.inverse
    for (row <- 0 until 100; col <- 0 until 100) {
      val (wx, wy) = spec.transform(col + 0.5, row + 0.5)
      val (fc, fr) = inv(wx, wy)
      val (cc, rr) = (math.floor(fc).toInt, math.floor(fr).toInt)
      val want = if (cc >= 0 && cc < 150 && rr >= 0 && rr < 150)
        (rr * 150 + cc).toDouble else Double.NaN
      val got = px(row * 100 + col)
      assert(got == want || (got.isNaN && want.isNaN), s"($row,$col)")
    }
  }

  test("cross-CRS (3857 spec, 4326 source): each center routed through Proj") {
    val spec = RasterSpec(3857, Bounds(1344400.0, 5917200.0, 1345400.0, 5918200.0), 10.0, 10.0)
    val srcTf = AffineTransform.northUp(12.076, 46.857, 0.0002, 0.0002) // 64x64 deg grid
    val r = WarpedGridReader(RampReader(64), srcTf, 4326, 64, 64, spec)
    val px = r.read(Window(0, 0, 100, 100))
    val inv = srcTf.inverse
    var valid = 0
    for (row <- 0 until 100; col <- 0 until 100) {
      val (wx, wy) = spec.transform(col + 0.5, row + 0.5)
      val (lon, lat) = Proj.transform(3857, 4326, wx, wy)
      val (fc, fr) = inv(lon, lat)
      val (cc, rr) = (math.floor(fc).toInt, math.floor(fr).toInt)
      val want = if (cc >= 0 && cc < 64 && rr >= 0 && rr < 64)
        (rr * 64 + cc).toDouble else Double.NaN
      val got = px(row * 100 + col)
      assert(got == want || (got.isNaN && want.isNaN), s"($row,$col)")
      if (!want.isNaN) valid += 1
    }
    assert(valid > 5000, s"fixture should mostly cover the spec, valid=$valid")
  }

  test("bilinear: NaN-aware 4-point interpolation matches the direct formula") {
    import graft.ops.Resampling
    val spec = RasterSpec(3857, Bounds(1000.0, 1000.0, 2000.0, 2000.0), 10.0, 10.0)
    val srcTf = AffineTransform.northUp(900.0, 2100.0, 8.0, 8.0) // 150x150 @8m
    val r = WarpedGridReader(RampReader(150), srcTf, 3857, 150, 150, spec,
      Resampling.Bilinear)
    val px = r.read(Window(0, 0, 100, 100))
    val inv = srcTf.inverse
    def sample(rr: Int, cc: Int): Double =
      if (rr < 0 || rr >= 150 || cc < 0 || cc >= 150) Double.NaN
      else (rr * 150 + cc).toDouble
    for (row <- 0 until 100; col <- 0 until 100) {
      val (wx, wy) = spec.transform(col + 0.5, row + 0.5)
      val (fc, fr) = inv(wx, wy)
      val gr = fr - 0.5; val gc = fc - 0.5
      val r0 = math.floor(gr).toInt; val c0 = math.floor(gc).toInt
      val wr = gr - r0; val wc = gc - c0
      val want = sample(r0, c0) * (1 - wr) * (1 - wc) +
        sample(r0, c0 + 1) * (1 - wr) * wc +
        sample(r0 + 1, c0) * wr * (1 - wc) +
        sample(r0 + 1, c0 + 1) * wr * wc
      val got = px(row * 100 + col)
      assert(got == want || (got.isNaN && want.isNaN), s"($row,$col) got=$got want=$want")
    }
    // the ramp is linear in (r, c), so bilinear must reproduce it exactly
    // wherever the full 2x2 support exists: v = fr_ramp relation check
    val (wx, wy) = spec.transform(50 + 0.5, 50 + 0.5)
    val (fc, fr) = inv(wx, wy)
    assert(math.abs(px(50 * 100 + 50) - ((fr - 0.5) * 150 + (fc - 0.5))) < 1e-9)
  }

  test("fuzz: random same-CRS grids, nearest + bilinear vs direct formula") {
    import graft.ops.Resampling
    val rnd = new scala.util.Random(11)
    for (round <- 0 until 50) {
      val res = Seq(4.0, 5.0, 8.0, 10.0, 16.0)(rnd.nextInt(5))
      val srcRes = Seq(4.0, 5.0, 8.0, 10.0, 16.0)(rnd.nextInt(5))
      val ow = rnd.nextInt(30) + 5; val oh = rnd.nextInt(30) + 5
      val sw = rnd.nextInt(60) + 10; val sh = rnd.nextInt(60) + 10
      val ox = rnd.nextInt(200) - 100; val oy = rnd.nextInt(200) - 100
      val spec = RasterSpec(3857, Bounds(ox, oy, ox + ow * res, oy + oh * res), res, res)
      val srcTf = AffineTransform.northUp(
        rnd.nextInt(100) - 50, oy + oh * res + rnd.nextInt(100), srcRes, srcRes)
      val method = if (rnd.nextBoolean()) Resampling.Nearest else Resampling.Bilinear
      val r = WarpedGridReader(RampReader(sw), srcTf, 3857, sh, sw, spec, method)
      val px = r.read(Window(0, 0, ow, oh))
      val inv = srcTf.inverse
      def sample(rr: Int, cc: Int): Double =
        if (rr < 0 || rr >= sh || cc < 0 || cc >= sw) Double.NaN
        else (rr * sw + cc).toDouble
      for (row <- 0 until oh; col <- 0 until ow) {
        val (wx, wy) = spec.transform(col + 0.5, row + 0.5)
        val (fc, fr) = inv(wx, wy)
        val want =
          if (method == Resampling.Nearest)
            sample(math.floor(fr).toInt, math.floor(fc).toInt)
          else {
            val gr = fr - 0.5; val gc = fc - 0.5
            val r0 = math.floor(gr).toInt; val c0 = math.floor(gc).toInt
            val wr = gr - r0; val wc = gc - c0
            sample(r0, c0) * (1 - wr) * (1 - wc) +
              sample(r0, c0 + 1) * (1 - wr) * wc +
              sample(r0 + 1, c0) * wr * (1 - wc) +
              sample(r0 + 1, c0 + 1) * wr * wc
          }
        val got = px(row * ow + col)
        assert(got == want || (got.isNaN && want.isNaN),
          s"round $round $method ($row,$col): got=$got want=$want")
      }
    }
  }

  test("sampleWindow: empty when nothing lands in the source") {
    val cols = Array(-5.0, -2.0); val rows = Array(3.0, 4.0)
    assert(Warp.sampleWindow(cols, rows, 100, 100).isEmpty)
    val w = Warp.sampleWindow(Array(3.7, 9.2), Array(1.1, 8.9), 100, 100)
    assert(w == Window(3, 1, 7, 8)) // floors 3..9 x 1..8, inclusive extents
  }
}
