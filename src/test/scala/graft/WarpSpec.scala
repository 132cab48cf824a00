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

  test("cubic: exact on a linear ramp (Keys kernel has linear precision)") {
    import graft.ops.Resampling
    // a bicubic kernel must reproduce any linear field bit-exactly on a
    // dyadic grid (partition of unity + first-moment zero); the 10m/8m
    // grid puts every offset on an eighth so the check is == not ≈
    val spec = RasterSpec(3857, Bounds(1000.0, 1000.0, 2000.0, 2000.0), 10.0, 10.0) // 100x100
    val srcTf = AffineTransform.northUp(900.0, 2100.0, 8.0, 8.0) // 150x150 @8m
    val r = WarpedGridReader(RampReader(150), srcTf, 3857, 150, 150, spec,
      Resampling.Cubic)
    val px = r.read(Window(0, 0, 100, 100))
    val inv = srcTf.inverse
    var valid = 0
    for (row <- 0 until 100; col <- 0 until 100) {
      val (wx, wy) = spec.transform(col + 0.5, row + 0.5)
      val (fc, fr) = inv(wx, wy)
      val gr = fr - 0.5; val gc = fc - 0.5
      val r0 = math.floor(gr).toInt; val c0 = math.floor(gc).toInt
      val interior = r0 - 1 >= 0 && r0 + 2 < 150 && c0 - 1 >= 0 && c0 + 2 < 150
      val got = px(row * 100 + col)
      if (interior) { assert(got == gr * 150 + gc, s"($row,$col)"); valid += 1 }
      else assert(got.isNaN, s"($row,$col) should be NaN outside 4x4 support")
    }
    assert(valid > 8000, s"valid=$valid")
  }

  test("cubic: matches a direct 16-tap Keys convolution on a nonlinear field") {
    import graft.ops.Resampling
    import graft.scan.ModRampReader
    val spec = RasterSpec(3857, Bounds(1000.0, 1000.0, 2000.0, 2000.0), 10.0, 10.0)
    val srcTf = AffineTransform.northUp(900.0, 2100.0, 8.0, 8.0)
    val r = WarpedGridReader(ModRampReader(251), srcTf, 3857, 150, 150, spec,
      Resampling.Cubic)
    val px = r.read(Window(0, 0, 100, 100))
    val inv = srcTf.inverse
    def keys(t: Double, o: Int): Double = o match {
      case -1 => ((-0.5 * t + 1.0) * t - 0.5) * t
      case 0  => (1.5 * t - 2.5) * t * t + 1.0
      case 1  => ((-1.5 * t + 2.0) * t + 0.5) * t
      case _  => (0.5 * t - 0.5) * t * t
    }
    for (row <- 0 until 100; col <- 0 until 100) {
      val (wx, wy) = spec.transform(col + 0.5, row + 0.5)
      val (fc, fr) = inv(wx, wy)
      val gr = fr - 0.5; val gc = fc - 0.5
      val r0 = math.floor(gr).toInt; val c0 = math.floor(gc).toInt
      val got = px(row * 100 + col)
      if (r0 - 1 >= 0 && r0 + 2 < 150 && c0 - 1 >= 0 && c0 + 2 < 150) {
        var want = 0.0
        for (dr <- -1 to 2; dc <- -1 to 2) {
          val rr = r0 + dr; val cc = c0 + dc
          want += ((rr.toLong * rr + cc.toLong * cc) % 251).toDouble *
            keys(gr - r0, dr) * keys(gc - c0, dc)
        }
        assert(got == want, s"($row,$col): got=$got want=$want")
      } else assert(got.isNaN)
    }
  }

  test("mode: majority vote over footprint centers, min-class ties, empty=NaN") {
    import graft.ops.Resampling
    import graft.scan.CategoricalReader
    val spec = RasterSpec(3857, Bounds(1000.0, 1000.0, 2000.0, 2000.0), 10.0, 10.0)
    val srcTf = AffineTransform.northUp(900.0, 2100.0, 8.0, 8.0) // 150x150 @8m
    val r = WarpedGridReader(CategoricalReader(7, 9, 5), srcTf, 3857, 150, 150, spec,
      Resampling.Mode)
    val px = r.read(Window(0, 0, 100, 100))
    val inv = srcTf.inverse
    var classes = Set.empty[Double]
    for (row <- 0 until 100; col <- 0 until 100) {
      // direct reference: 4-corner box -> centers in [lo, hi) -> vote
      val corners = Seq((col.toDouble, row.toDouble), (col + 1.0, row.toDouble),
        (col.toDouble, row + 1.0), (col + 1.0, row + 1.0)).map { case (ox, oy) =>
        val (wx, wy) = spec.transform(ox, oy); inv(wx, wy)
      }
      val lox = corners.map(_._1).min; val hix = corners.map(_._1).max
      val loy = corners.map(_._2).min; val hiy = corners.map(_._2).max
      val c0 = math.max(0, math.ceil(lox - 0.5).toInt)
      val c1 = math.min(149, math.ceil(hix - 0.5).toInt - 1)
      val r0 = math.max(0, math.ceil(loy - 0.5).toInt)
      val r1 = math.min(149, math.ceil(hiy - 0.5).toInt - 1)
      val votes = (for (rr <- r0 to r1; cc <- c0 to c1)
        yield ((rr / 7 + cc / 9) % 5).toDouble)
        .groupBy(identity).view.mapValues(_.size).toMap
      val want =
        if (votes.isEmpty) Double.NaN
        else votes.toSeq.sortBy { case (v, n) => (-n, v) }.head._1
      val got = px(row * 100 + col)
      assert(got == want || (got.isNaN && want.isNaN), s"($row,$col): got=$got want=$want")
      if (!got.isNaN) classes += got
    }
    // the fixture exercises every class and stays integral (never interpolated)
    assert(classes == Set(0.0, 1.0, 2.0, 3.0, 4.0), s"classes=$classes")
  }

  test("lanczos: normalized 36-tap windowed sinc matches the direct formula; constant-exact") {
    import graft.ops.Resampling
    import graft.scan.ModRampReader
    val spec = RasterSpec(3857, Bounds(1000.0, 1000.0, 2000.0, 2000.0), 10.0, 10.0)
    val srcTf = AffineTransform.northUp(900.0, 2100.0, 8.0, 8.0) // 150x150 @8m
    val r = WarpedGridReader(ModRampReader(251), srcTf, 3857, 150, 150, spec,
      Resampling.Lanczos)
    val px = r.read(Window(0, 0, 100, 100))
    val inv = srcTf.inverse
    def lw(x: Double): Double =
      if (x == 0.0) 1.0
      else { val p = math.Pi * x; 3.0 * math.sin(p) * math.sin(p / 3.0) / (p * p) }
    for (row <- 0 until 100 by 7; col <- 0 until 100 by 7) {
      val (wx, wy) = spec.transform(col + 0.5, row + 0.5)
      val (gc0, gr0) = inv(wx, wy)
      val gc = gc0 - 0.5; val gr = gr0 - 0.5
      val r0 = math.floor(gr).toInt; val c0 = math.floor(gc).toInt
      val got = px(row * 100 + col)
      if (c0 - 2 >= 0 && c0 + 3 < 150 && r0 - 2 >= 0 && r0 + 3 < 150) {
        var acc = 0.0; var wsum = 0.0
        for (dr <- -2 to 3; dc <- -2 to 3) {
          val w = lw(gr - r0 - dr) * lw(gc - c0 - dc)
          val rr = r0 + dr; val cc = c0 + dc
          acc += w * (((rr.toLong * rr + cc.toLong * cc) % 251).toDouble)
          wsum += w
        }
        assert(math.abs(got - acc / wsum) < 1e-9, s"($row,$col): got=$got want=${acc / wsum}")
      } else assert(got.isNaN)
    }
    // normalization makes the kernel constant-exact: a flat field comes
    // back flat (the truncated raw weights alone would not sum to 1)
    val flat = new graft.scan.Reader {
      def read(w: Window): Array[Double] = Array.fill(w.width * w.height)(42.0)
    }
    val rf = WarpedGridReader(flat, srcTf, 3857, 150, 150, spec, Resampling.Lanczos)
    rf.read(Window(40, 40, 10, 10)).foreach(v => assert(math.abs(v - 42.0) < 1e-12))
  }

  test("cubicspline: direct 16-tap B-spline reference; constant-exact; no overshoot") {
    import graft.ops.Resampling
    import graft.scan.ModRampReader
    val spec = RasterSpec(3857, Bounds(1000.0, 1000.0, 2000.0, 2000.0), 10.0, 10.0)
    val srcTf = AffineTransform.northUp(900.0, 2100.0, 8.0, 8.0)
    val r = WarpedGridReader(ModRampReader(251), srcTf, 3857, 150, 150, spec,
      Resampling.CubicSpline)
    val px = r.read(Window(0, 0, 100, 100))
    val inv = srcTf.inverse
    def bw(t: Double, o: Int): Double = {
      val u = 1.0 - t
      o match {
        case -1 => u * u * u / 6.0
        case 0  => (3.0 * t * t * t - 6.0 * t * t + 4.0) / 6.0
        case 1  => (-3.0 * t * t * t + 3.0 * t * t + 3.0 * t + 1.0) / 6.0
        case _  => t * t * t / 6.0
      }
    }
    for (row <- 0 until 100 by 9; col <- 0 until 100 by 9) {
      val (wx, wy) = spec.transform(col + 0.5, row + 0.5)
      val (gc0, gr0) = inv(wx, wy)
      val gc = gc0 - 0.5; val gr = gr0 - 0.5
      val r0 = math.floor(gr).toInt; val c0 = math.floor(gc).toInt
      val got = px(row * 100 + col)
      if (c0 - 1 >= 0 && c0 + 2 < 150 && r0 - 1 >= 0 && r0 + 2 < 150) {
        var acc = 0.0
        for (dr <- -1 to 2; dc <- -1 to 2)
          acc += bw(gr - r0, dr) * bw(gc - c0, dc) *
            ((((r0 + dr).toLong * (r0 + dr) + (c0 + dc).toLong * (c0 + dc)) % 251).toDouble)
        assert(math.abs(got - acc) < 1e-9, s"($row,$col)")
        // all-positive weights: smoothing can never overshoot the range
        assert(got >= 0.0 && got <= 250.0, s"($row,$col): overshoot $got")
      } else assert(got.isNaN)
    }
    val flat = new graft.scan.Reader {
      def read(w: Window): Array[Double] = Array.fill(w.width * w.height)(7.0)
    }
    val rf = WarpedGridReader(flat, srcTf, 3857, 150, 150, spec, Resampling.CubicSpline)
    rf.read(Window(40, 40, 5, 5)).foreach(v => assert(math.abs(v - 7.0) < 1e-12))
  }

  test("footprint family: sum/min/max/med/q1/q3/rms match the direct box reduce") {
    import graft.ops.Resampling
    import graft.scan.ModRampReader
    val spec = RasterSpec(3857, Bounds(1000.0, 1000.0, 2000.0, 2000.0), 40.0, 40.0) // 25x25
    val srcTf = AffineTransform.northUp(900.0, 2100.0, 8.0, 8.0) // 150x150 @8m
    val inv = srcTf.inverse
    def boxVals(row: Int, col: Int): Seq[Double] = {
      val corners = Seq((col.toDouble, row.toDouble), (col + 1.0, row.toDouble),
        (col.toDouble, row + 1.0), (col + 1.0, row + 1.0)).map { case (ox, oy) =>
        val (wx, wy) = spec.transform(ox, oy); inv(wx, wy)
      }
      val c0 = math.max(0, math.ceil(corners.map(_._1).min - 0.5).toInt)
      val c1 = math.min(149, math.ceil(corners.map(_._1).max - 0.5).toInt - 1)
      val r0 = math.max(0, math.ceil(corners.map(_._2).min - 0.5).toInt)
      val r1 = math.min(149, math.ceil(corners.map(_._2).max - 0.5).toInt - 1)
      for (rr <- r0 to r1; cc <- c0 to c1)
        yield ((rr.toLong * rr + cc.toLong * cc) % 251).toDouble
    }
    val kernels: Seq[(Resampling, Seq[Double] => Double)] = Seq(
      Resampling.Sum -> (vs => { var s = 0.0; vs.foreach(s += _); s }),
      Resampling.Min -> (_.min),
      Resampling.Max -> (_.max),
      Resampling.Med -> (vs => vs.sorted.apply((vs.size - 1) / 2)),
      Resampling.Q1  -> (vs => vs.sorted.apply((vs.size - 1) / 4)),
      Resampling.Q3  -> (vs => vs.sorted.apply(3 * (vs.size - 1) / 4)),
      Resampling.Rms -> (vs => {
        var s = 0.0; vs.foreach(v => s += v * v); math.sqrt(s / vs.size) }))
    kernels.foreach { case (k, ref) =>
      val r = WarpedGridReader(ModRampReader(251), srcTf, 3857, 150, 150, spec, k)
      val px = r.read(Window(0, 0, 25, 25))
      for (row <- 0 until 25; col <- 0 until 25) {
        val vs = boxVals(row, col)
        val got = px(row * 25 + col)
        if (vs.isEmpty) assert(got.isNaN, s"$k ($row,$col)")
        else assert(got == ref(vs), s"$k ($row,$col): got=$got want=${ref(vs)}")
      }
    }
  }

  test("average: footprint mean over centers at 5x downsample; off-source=NaN") {
    import graft.ops.Resampling
    import graft.scan.ModRampReader
    // 40 m output over an 8 m source: each footprint box spans 5x5
    // source centers — the >2x downsample regime none of the point
    // kernels covers. Columns past the source's east edge go empty.
    val spec = RasterSpec(3857, Bounds(1000.0, 1000.0, 2400.0, 2000.0), 40.0, 40.0) // 35x25
    val srcTf = AffineTransform.northUp(900.0, 2100.0, 8.0, 8.0) // 150x150 @8m
    val r = WarpedGridReader(ModRampReader(251), srcTf, 3857, 150, 150, spec,
      Resampling.Average)
    val px = r.read(Window(0, 0, 35, 25))
    val inv = srcTf.inverse
    var sawEmpty = false
    for (row <- 0 until 25; col <- 0 until 35) {
      val corners = Seq((col.toDouble, row.toDouble), (col + 1.0, row.toDouble),
        (col.toDouble, row + 1.0), (col + 1.0, row + 1.0)).map { case (ox, oy) =>
        val (wx, wy) = spec.transform(ox, oy); inv(wx, wy)
      }
      val lox = corners.map(_._1).min; val hix = corners.map(_._1).max
      val loy = corners.map(_._2).min; val hiy = corners.map(_._2).max
      val c0 = math.max(0, math.ceil(lox - 0.5).toInt)
      val c1 = math.min(149, math.ceil(hix - 0.5).toInt - 1)
      val r0 = math.max(0, math.ceil(loy - 0.5).toInt)
      val r1 = math.min(149, math.ceil(hiy - 0.5).toInt - 1)
      val vals = for (rr <- r0 to r1; cc <- c0 to c1)
        yield ((rr.toLong * rr + cc.toLong * cc) % 251).toDouble
      val got = px(row * 35 + col)
      if (vals.isEmpty) { assert(got.isNaN, s"($row,$col)"); sawEmpty = true }
      else {
        // interior pixels see the full 5x5; edge-clamped boxes shrink
        if (col < 27) assert(vals.length == 25, s"($row,$col)")
        // row-major accumulation, same order as the kernel
        var sum = 0.0; vals.foreach(sum += _)
        assert(got == sum / vals.length,
          s"($row,$col): got=$got want=${sum / vals.length}")
      }
    }
    assert(sawEmpty, "fixture must include off-source (empty-footprint) pixels")
  }

  test("average: NaN sources are skipped, all-NaN footprint is nodata") {
    import graft.ops.Resampling
    // checkerboard NaN: mean must average only the valid half
    val holey = new graft.scan.Reader {
      def read(w: Window): Array[Double] = {
        val out = new Array[Double](w.width * w.height)
        var i = 0; var r = w.rowOff
        while (r < w.rowEnd) {
          var c = w.colOff
          while (c < w.colEnd) {
            out(i) = if ((r + c) % 2 == 0) Double.NaN else (r * 100 + c).toDouble
            i += 1; c += 1
          }
          r += 1
        }
        out
      }
    }
    val spec = RasterSpec(3857, Bounds(1000.0, 1000.0, 1400.0, 1400.0), 40.0, 40.0) // 10x10
    val srcTf = AffineTransform.northUp(1000.0, 1400.0, 8.0, 8.0) // 50x50 @8m
    val r = WarpedGridReader(holey, srcTf, 3857, 50, 50, spec, Resampling.Average)
    val px = r.read(Window(0, 0, 10, 10))
    for (row <- 0 until 10; col <- 0 until 10) {
      val vals = for {
        rr <- (5 * row) until (5 * row + 5); cc <- (5 * col) until (5 * col + 5)
        if (rr + cc) % 2 == 1
      } yield (rr * 100 + cc).toDouble
      var sum = 0.0; vals.foreach(sum += _)
      assert(px(row * 10 + col) == sum / vals.length, s"($row,$col)")
    }
  }

  test("gauss: 3x3 binomial at the nearest center; NaN renormalizes; edge=NaN") {
    import graft.ops.Resampling
    import graft.scan.ModRampReader
    // 1:1 grids shifted so every output center lands mid-pixel: output
    // center (c+0.5, r+0.5)@8m from origin 1004 maps to source coord
    // (c+1, r+1) in a grid from origin 996 — nearest pixel (r+1, c+1),
    // full 3x3 window inside the 20x20 source except the outer ring.
    val spec = RasterSpec(3857, Bounds(1004.0, 1004.0, 1148.0, 1148.0), 8.0, 8.0) // 18x18
    val srcTf = AffineTransform.northUp(996.0, 1156.0, 8.0, 8.0) // 20x20 @8m
    val r = WarpedGridReader(ModRampReader(251), srcTf, 3857, 20, 20, spec,
      Resampling.Gauss)
    val px = r.read(Window(0, 0, 18, 18))
    def z(rr: Int, cc: Int): Double = ((rr.toLong * rr + cc.toLong * cc) % 251).toDouble
    val w = Array(1.0, 2.0, 1.0)
    for (row <- 0 until 18; col <- 0 until 18) {
      val (kr, kc) = (row + 1, col + 1)
      var acc = 0.0
      for (dr <- -1 to 1; dc <- -1 to 1)
        acc += w(dr + 1) * w(dc + 1) * z(kr + dr, kc + dc)
      assert(px(row * 18 + col) == acc / 16.0, s"($row,$col)")
    }
    // NaN renormalization: a checkerboard-holey source averages only
    // the valid taps' weights
    val holey = new graft.scan.Reader {
      def read(win: Window): Array[Double] = {
        val out = new Array[Double](win.width * win.height)
        var i = 0; var rr = win.rowOff
        while (rr < win.rowEnd) {
          var cc = win.colOff
          while (cc < win.colEnd) {
            out(i) = if ((rr + cc) % 2 == 0) Double.NaN else (rr * 100 + cc).toDouble
            i += 1; cc += 1
          }
          rr += 1
        }
        out
      }
    }
    val h = WarpedGridReader(holey, srcTf, 3857, 20, 20, spec, Resampling.Gauss)
    val hx = h.read(Window(0, 0, 18, 18))
    for (row <- 0 until 18; col <- 0 until 18) {
      val (kr, kc) = (row + 1, col + 1)
      var acc = 0.0; var ws = 0.0
      for (dr <- -1 to 1; dc <- -1 to 1; if (kr + dr + kc + dc) % 2 == 1) {
        acc += w(dr + 1) * w(dc + 1) * ((kr + dr) * 100 + kc + dc)
        ws += w(dr + 1) * w(dc + 1)
      }
      assert(hx(row * 18 + col) == acc / ws, s"($row,$col)")
    }
    // a window leaving the source is nodata: widen the output one pixel
    // past the source's edge ring
    val edgeSpec = RasterSpec(3857, Bounds(996.0, 996.0, 1156.0, 1156.0), 8.0, 8.0) // 20x20
    val e = WarpedGridReader(ModRampReader(251), srcTf, 3857, 20, 20, edgeSpec,
      Resampling.Gauss)
    val ex = e.read(Window(0, 0, 20, 20))
    for (i <- 0 until 20) {
      assert(ex(i).isNaN && ex(19 * 20 + i).isNaN, s"row edge $i")
      assert(ex(i * 20).isNaN && ex(i * 20 + 19).isNaN, s"col edge $i")
    }
  }
}
