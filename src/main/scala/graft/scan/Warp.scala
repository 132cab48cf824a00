package graft.scan

import graft.core.{AffineTransform, Proj, RasterSpec, Window}

/** Cross-CRS pixel gather — the engine's "WarpedVRT-lite". The reference
  * wraps any asset whose native grid differs from the output spec in a
  * `WarpedVRT` so every read sees the output grid
  * (`stackstac/rio_reader.py:344-360`); here the same contract is a pure
  * coordinate routine: each output-pixel center is mapped
  * output grid -> output CRS -> asset CRS -> fractional source pixel,
  * and the reader gathers nearest-neighbor from one windowed source read.
  * All math is `graft.core.Proj` (pure, thread-safe), so the warp runs
  * inside Spark tasks with no GDAL-style thread-local machinery.
  */
object Warp {

  /** Fractional source-grid coordinates of each output-pixel center in
    * `window` (output-spec grid), row-major: `(cols(i), rows(i))`.
    * `srcEpsg == 0` or `== spec.epsg` means same-CRS (pure affine hop). */
  def sourceCoords(window: Window, spec: RasterSpec, srcInv: AffineTransform,
                   srcEpsg: Int): (Array[Double], Array[Double]) = {
    val n = window.width * window.height
    val cols = new Array[Double](n); val rows = new Array[Double](n)
    val outTf = spec.transform
    val sameCrs = srcEpsg == 0 || srcEpsg == spec.epsg
    var i = 0; var r = window.rowOff
    while (r < window.rowEnd) {
      var c = window.colOff
      while (c < window.colEnd) {
        var (wx, wy) = outTf(c + 0.5, r + 0.5)
        if (!sameCrs) {
          val t = Proj.transform(spec.epsg, srcEpsg, wx, wy)
          wx = t._1; wy = t._2
        }
        val (fc, fr) = srcInv(wx, wy)
        cols(i) = fc; rows(i) = fr
        i += 1; c += 1
      }
      r += 1
    }
    (cols, rows)
  }

  /** Integer bounding window (clamped to the source raster) of the
    * nearest-neighbor samples in `(cols, rows)`; empty window if no
    * sample lands inside the source. Computed from the mapped centers
    * themselves — corner extrapolation under-covers a curved (cross-CRS)
    * footprint, per-pixel min/max cannot. */
  def sampleWindow(cols: Array[Double], rows: Array[Double],
                   srcHeight: Int, srcWidth: Int): Window = {
    var minC = Int.MaxValue; var minR = Int.MaxValue
    var maxC = Int.MinValue; var maxR = Int.MinValue
    var i = 0
    while (i < cols.length) {
      val cc = math.floor(cols(i)).toInt; val rr = math.floor(rows(i)).toInt
      if (cc >= 0 && cc < srcWidth && rr >= 0 && rr < srcHeight) {
        if (cc < minC) minC = cc
        if (cc > maxC) maxC = cc
        if (rr < minR) minR = rr
        if (rr > maxR) maxR = rr
      }
      i += 1
    }
    if (minC > maxC) Window(0, 0, 0, 0)
    else Window(minC, minR, maxC - minC + 1, maxR - minR + 1)
  }
}

/** Warp any source-grid reader onto the output spec: `source.read` takes
  * windows in the SOURCE grid (its values keyed on source row/col); this
  * wrapper presents the [[Reader]] contract on the OUTPUT grid, routing
  * each output-pixel center through the (optional) CRS hop and the inverse
  * source affine — nearest-neighbor or NaN-aware bilinear (the two
  * resampling modes the reference's warp path supports,
  * `geom_utils.py:229-234`), same pixel-center convention as
  * [[graft.ops.Reproject]]. One windowed source read per tile.
  * This is what makes a mixed-CRS stack scannable: two UTM zones and a
  * lat/lon asset can all land on one output grid in the same scan
  * (reference `rio_reader.py:344-360`).
  */
final case class WarpedGridReader(
    source: Reader,
    srcTransform: AffineTransform,
    srcEpsg: Int,
    srcHeight: Int, srcWidth: Int,
    spec: RasterSpec,
    method: graft.ops.Resampling = graft.ops.Resampling.Nearest) extends Reader {

  private val srcInv = srcTransform.inverse
  private val sameCrs = srcEpsg == 0 || srcEpsg == spec.epsg

  /** Map one OUTPUT-grid point (fractional grid coords) to fractional
    * source-grid coords — the same center hop [[Warp.sourceCoords]] runs,
    * exposed pointwise for the corner-footprint (Mode) path. */
  private def toSource(ox: Double, oy: Double): (Double, Double) = {
    var (wx, wy) = spec.transform(ox, oy)
    if (!sameCrs) {
      val t = graft.core.Proj.transform(spec.epsg, srcEpsg, wx, wy)
      wx = t._1; wy = t._2
    }
    srcInv(wx, wy)
  }

  def read(window: Window): Array[Double] = {
    import graft.ops.Resampling._
    method match {
      case Cubic       => readConv4x4(window, keysWeight)
      case CubicSpline => readConv4x4(window, bsplineWeight)
      case Mode        => readMode(window)
      case Average | Min | Max | Med | Q1 | Q3 | Sum | Rms =>
        readFootprint(window)
      case Lanczos     => readLanczos(window)
      case Gauss       => readGauss(window)
      case _           => readNearestOrBilinear(window)
    }
  }

  /** Gaussian 3×3 binomial kernel (GDAL GAUSS — see
    * [[graft.ops.Resampling.Gauss]]): weights [1 2 1]⊗[1 2 1]/16 around
    * the source pixel NEAREST the output center. NaN taps drop out with
    * weight renormalization; windows leaving the source (or all-NaN)
    * are nodata. One windowed source read per tile, like every
    * kernel. */
  private def readGauss(window: Window): Array[Double] = {
    val (cols, rows) = Warp.sourceCoords(window, spec, srcInv, srcEpsg)
    val out = Array.fill(window.width * window.height)(Double.NaN)
    var minC = Int.MaxValue; var minR = Int.MaxValue
    var maxC = Int.MinValue; var maxR = Int.MinValue
    var i = 0
    while (i < cols.length) {
      val cc = math.floor(cols(i)).toInt // nearest: center k+0.5 owns [k, k+1)
      val rr = math.floor(rows(i)).toInt
      if (cc - 1 >= 0 && cc + 1 < srcWidth && rr - 1 >= 0 && rr + 1 < srcHeight) {
        if (cc - 1 < minC) minC = cc - 1
        if (cc + 1 > maxC) maxC = cc + 1
        if (rr - 1 < minR) minR = rr - 1
        if (rr + 1 > maxR) maxR = rr + 1
      }
      i += 1
    }
    if (minC > maxC) return out
    val srcWin = Window(minC, minR, maxC - minC + 1, maxR - minR + 1)
    val px = source.read(srcWin)
    val w = Array(1.0, 2.0, 1.0)
    i = 0
    while (i < cols.length) {
      val cc = math.floor(cols(i)).toInt
      val rr = math.floor(rows(i)).toInt
      if (cc - 1 >= 0 && cc + 1 < srcWidth && rr - 1 >= 0 && rr + 1 < srcHeight) {
        var acc = 0.0; var wsum = 0.0
        var dr = -1
        while (dr <= 1) {
          var dc = -1
          while (dc <= 1) {
            val v = px((rr + dr - srcWin.rowOff) * srcWin.width +
              (cc + dc - srcWin.colOff))
            if (!v.isNaN) {
              val wt = w(dr + 1) * w(dc + 1)
              acc += wt * v; wsum += wt
            }
            dc += 1
          }
          dr += 1
        }
        if (wsum > 0.0) out(i) = acc / wsum
      }
      i += 1
    }
    out
  }

  /** Keys bicubic kernel (a = −1/2, the GDAL `cubic` default): t is the
    * fractional offset from the r0/c0 tap, o the tap offset. */
  @inline private def keysWeight(t: Double, o: Int): Double = o match {
    case -1 => ((-0.5 * t + 1.0) * t - 0.5) * t
    case 0  => (1.5 * t - 2.5) * t * t + 1.0
    case 1  => ((-1.5 * t + 2.0) * t + 0.5) * t
    case _  => (0.5 * t - 0.5) * t * t
  }

  /** Cubic B-spline basis (GDAL `cubicspline`) — SMOOTHING weights
    * (partition of unity, all non-negative ⇒ no overshoot, but does not
    * interpolate the samples). The /6 makes terms non-dyadic even on
    * dyadic grids; cross-engine parity therefore quantizes like lanczos
    * (r22 uses the 1/256 quantum). */
  @inline private def bsplineWeight(t: Double, o: Int): Double = {
    val u = 1.0 - t
    o match {
      case -1 => u * u * u / 6.0
      case 0  => (3.0 * t * t * t - 6.0 * t * t + 4.0) / 6.0
      case 1  => (-3.0 * t * t * t + 3.0 * t * t + 3.0 * t + 1.0) / 6.0
      case _  => t * t * t / 6.0
    }
  }

  /** Lanczos-3 windowed-sinc convolution (GDAL's `lanczos`): a 6x6
    * windowed gather per output center, weights
    * L(x) = sinc(x)·sinc(x/3) = 3·sin(πx)·sin(πx/3)/(π²x²), normalized
    * by the total 2D weight sum (the tap window truncates the kernel, so
    * raw weights don't sum to 1). Any of the 36 taps falling outside the
    * source (or reading NaN) yields NaN — the cubic branch's edge
    * convention. Unlike the dyadic-exact cubic terms, sin() is
    * transcendental: consumers pinning cross-engine parity must quantize
    * coarsely enough to absorb last-ulp libm differences (the r17 oracle
    * uses a 1/256 quantum against ~1e-12 accumulated divergence). */
  private def readLanczos(window: Window): Array[Double] = {
    val (cols, rows) = Warp.sourceCoords(window, spec, srcInv, srcEpsg)
    val out = Array.fill(window.width * window.height)(Double.NaN)
    var minC = Int.MaxValue; var minR = Int.MaxValue
    var maxC = Int.MinValue; var maxR = Int.MinValue
    var i = 0
    while (i < cols.length) {
      val c0 = math.floor(cols(i) - 0.5).toInt
      val r0 = math.floor(rows(i) - 0.5).toInt
      if (c0 - 2 >= 0 && c0 + 3 < srcWidth && r0 - 2 >= 0 && r0 + 3 < srcHeight) {
        if (c0 - 2 < minC) minC = c0 - 2
        if (c0 + 3 > maxC) maxC = c0 + 3
        if (r0 - 2 < minR) minR = r0 - 2
        if (r0 + 3 > maxR) maxR = r0 + 3
      }
      i += 1
    }
    if (minC > maxC) return out
    val srcWin = Window(minC, minR, maxC - minC + 1, maxR - minR + 1)
    val px = source.read(srcWin)
    @inline def lw(x: Double): Double =
      if (x == 0.0) 1.0
      else {
        val px1 = math.Pi * x
        3.0 * math.sin(px1) * math.sin(px1 / 3.0) / (px1 * px1)
      }
    i = 0
    while (i < cols.length) {
      val gr = rows(i) - 0.5; val gc = cols(i) - 0.5
      val r0 = math.floor(gr).toInt; val c0 = math.floor(gc).toInt
      if (c0 - 2 >= 0 && c0 + 3 < srcWidth && r0 - 2 >= 0 && r0 + 3 < srcHeight) {
        val tr = gr - r0; val tc = gc - c0
        var acc = 0.0; var wsum = 0.0
        var dr = -2
        while (dr <= 3) {
          val wr = lw(tr - dr)
          var dc = -2
          while (dc <= 3) {
            val w = wr * lw(tc - dc)
            val v = px((r0 + dr - srcWin.rowOff) * srcWin.width + (c0 + dc - srcWin.colOff))
            acc += w * v
            wsum += w
            dc += 1
          }
          dr += 1
        }
        out(i) = acc / wsum
      }
      i += 1
    }
    out
  }

  /** Per-output-pixel source-center candidate ranges from the 4-corner
    * footprint box (each output pixel's grid corners through the CRS
    * hop, then the axis-aligned bounding box in the source grid; source
    * pixels whose CENTERS fall inside the half-open [lo, hi) box are
    * candidates) — the shared machinery of the two footprint kernels,
    * [[readMode]] (vote) and [[readAverage]] (mean). Returns the
    * clamped inclusive per-pixel ranges and the covering source window
    * (empty when no footprint touches the source). */
  private def footprintBoxes(window: Window)
      : (Array[Int], Array[Int], Array[Int], Array[Int], Window) = {
    val n = window.width * window.height
    val loC = new Array[Int](n); val hiC = new Array[Int](n)
    val loR = new Array[Int](n); val hiR = new Array[Int](n)
    var minC = Int.MaxValue; var minR = Int.MaxValue
    var maxC = Int.MinValue; var maxR = Int.MinValue
    var i = 0; var r = window.rowOff
    while (r < window.rowEnd) {
      var c = window.colOff
      while (c < window.colEnd) {
        val (x0, y0) = toSource(c.toDouble, r.toDouble)
        val (x1, y1) = toSource(c + 1.0, r.toDouble)
        val (x2, y2) = toSource(c.toDouble, r + 1.0)
        val (x3, y3) = toSource(c + 1.0, r + 1.0)
        val lox = math.min(math.min(x0, x1), math.min(x2, x3))
        val hix = math.max(math.max(x0, x1), math.max(x2, x3))
        val loy = math.min(math.min(y0, y1), math.min(y2, y3))
        val hiy = math.max(math.max(y0, y1), math.max(y2, y3))
        // centers k+0.5 in [lo, hi)  <=>  k in [ceil(lo-0.5), ceil(hi-0.5)-1]
        var c0 = math.ceil(lox - 0.5).toInt; var c1 = math.ceil(hix - 0.5).toInt - 1
        var r0 = math.ceil(loy - 0.5).toInt; var r1 = math.ceil(hiy - 0.5).toInt - 1
        if (c0 < 0) c0 = 0
        if (r0 < 0) r0 = 0
        if (c1 > srcWidth - 1) c1 = srcWidth - 1
        if (r1 > srcHeight - 1) r1 = srcHeight - 1
        loC(i) = c0; hiC(i) = c1; loR(i) = r0; hiR(i) = r1
        if (c0 <= c1 && r0 <= r1) {
          if (c0 < minC) minC = c0
          if (c1 > maxC) maxC = c1
          if (r0 < minR) minR = r0
          if (r1 > maxR) maxR = r1
        }
        i += 1; c += 1
      }
      r += 1
    }
    val srcWin = if (minC > maxC) Window(0, 0, 0, 0)
      else Window(minC, minR, maxC - minC + 1, maxR - minR + 1)
    (loC, hiC, loR, hiR, srcWin)
  }

  /** Footprint-reduction resampling — the >2× DOWNSAMPLE family
    * (GDAL `average`/`sum`/`min`/`max`/`med`/`q1`/`q3`/`rms`), where the
    * point-sampling kernels (nearest/bilinear/cubic read ≤4×4 taps) see
    * a sliver of the source pixels under each output cell and alias:
    * each output pixel reduces the source pixels whose centers fall
    * inside its footprint box, NaN sources skipped (GDAL's
    * nodata-ignoring convention); an empty or all-NaN footprint is
    * nodata. Accumulation is row-major over the box — deterministic at
    * any parallelism (per-pixel local loop, no merge order). Quantile
    * convention (med/q1/q3): the LOWER quantile — sorted ascending,
    * index ⌊q·(cnt−1)⌋ for q ∈ {¼, ½, ¾} — exact integer indexing any
    * SQL engine replays (no midpoint averaging). Rms = sqrt(Σv²/cnt):
    * both the division and IEEE sqrt are correctly rounded, so rms is
    * bit-exact cross-engine when the inputs are. One windowed source
    * read per tile, same as every other kernel. */
  private def readFootprint(window: Window): Array[Double] = {
    import graft.ops.Resampling._
    val out = Array.fill(window.width * window.height)(Double.NaN)
    val (loC, hiC, loR, hiR, srcWin) = footprintBoxes(window)
    if (srcWin.isEmpty) return out
    val px = source.read(srcWin)
    val needSort = method == Med || method == Q1 || method == Q3
    var scratch = new Array[Double](64)
    var i = 0
    while (i < out.length) {
      if (loC(i) <= hiC(i) && loR(i) <= hiR(i)) {
        var sum = 0.0; var sumSq = 0.0
        var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
        var cnt = 0
        var rr = loR(i)
        while (rr <= hiR(i)) {
          var cc = loC(i)
          while (cc <= hiC(i)) {
            val v = px((rr - srcWin.rowOff) * srcWin.width + (cc - srcWin.colOff))
            if (!v.isNaN) {
              sum += v; sumSq += v * v
              if (v < mn) mn = v
              if (v > mx) mx = v
              if (needSort) {
                if (cnt == scratch.length)
                  scratch = java.util.Arrays.copyOf(scratch, cnt * 2)
                scratch(cnt) = v
              }
              cnt += 1
            }
            cc += 1
          }
          rr += 1
        }
        if (cnt > 0) out(i) = method match {
          case Average => sum / cnt
          case Sum     => sum
          case Min     => mn
          case Max     => mx
          case Rms     => math.sqrt(sumSq / cnt)
          case Q1      => sortedAt(scratch, cnt, (cnt - 1) / 4)
          case Med     => sortedAt(scratch, cnt, (cnt - 1) / 2)
          case _       => sortedAt(scratch, cnt, 3 * (cnt - 1) / 4) // Q3
        }
      }
      i += 1
    }
    out
  }

  private def sortedAt(a: Array[Double], n: Int, idx: Int): Double = {
    java.util.Arrays.sort(a, 0, n)
    a(idx)
  }

  /** 4x4 separable convolution (the `cubic`/`cubicspline` shape): a 4x4
    * windowed gather per output center with per-axis weights from `w`.
    * Any of the 16 taps falling outside the source raster (or reading
    * NaN) yields NaN — no edge renormalization, matching the bilinear
    * branch's NaN propagation. */
  private def readConv4x4(window: Window,
                          w: (Double, Int) => Double): Array[Double] = {
    val (cols, rows) = Warp.sourceCoords(window, spec, srcInv, srcEpsg)
    val out = Array.fill(window.width * window.height)(Double.NaN)
    // bounding rect over the in-bounds 4x4 neighborhoods
    var minC = Int.MaxValue; var minR = Int.MaxValue
    var maxC = Int.MinValue; var maxR = Int.MinValue
    var i = 0
    while (i < cols.length) {
      val c0 = math.floor(cols(i) - 0.5).toInt
      val r0 = math.floor(rows(i) - 0.5).toInt
      if (c0 - 1 >= 0 && c0 + 2 < srcWidth && r0 - 1 >= 0 && r0 + 2 < srcHeight) {
        if (c0 - 1 < minC) minC = c0 - 1
        if (c0 + 2 > maxC) maxC = c0 + 2
        if (r0 - 1 < minR) minR = r0 - 1
        if (r0 + 2 > maxR) maxR = r0 + 2
      }
      i += 1
    }
    if (minC > maxC) return out
    val srcWin = Window(minC, minR, maxC - minC + 1, maxR - minR + 1)
    val px = source.read(srcWin)
    i = 0
    while (i < cols.length) {
      val gr = rows(i) - 0.5; val gc = cols(i) - 0.5
      val r0 = math.floor(gr).toInt; val c0 = math.floor(gc).toInt
      if (c0 - 1 >= 0 && c0 + 2 < srcWidth && r0 - 1 >= 0 && r0 + 2 < srcHeight) {
        val tr = gr - r0; val tc = gc - c0
        var acc = 0.0
        var dr = -1
        while (dr <= 2) {
          val wr = w(tr, dr)
          var dc = -1
          while (dc <= 2) {
            val v = px((r0 + dr - srcWin.rowOff) * srcWin.width + (c0 + dc - srcWin.colOff))
            acc += v * wr * w(tc, dc)
            dc += 1
          }
          dr += 1
        }
        out(i) = acc
      }
      i += 1
    }
    out
  }

  /** Majority-vote resampling for CATEGORICAL rasters: each output pixel's
    * footprint (its 4 grid corners mapped through the CRS hop, then the
    * axis-aligned bounding box in the source grid) votes over the source
    * pixels whose CENTERS fall inside it, half-open [lo, hi) per axis so
    * boundary-seated centers belong to exactly one output pixel. Ties
    * resolve to the smallest class id; an empty or all-NaN footprint is
    * nodata. Interpolating kernels are wrong here by construction — they
    * average class IDS (mean of water=1 and urban=3 is "forest=2"). */
  private def readMode(window: Window): Array[Double] = {
    val out = Array.fill(window.width * window.height)(Double.NaN)
    val n = window.width * window.height
    val (loC, hiC, loR, hiR, srcWin) = footprintBoxes(window)
    if (srcWin.isEmpty) return out
    val px = source.read(srcWin)
    val votes = scala.collection.mutable.HashMap.empty[Double, Int]
    var i = 0
    while (i < n) {
      if (loC(i) <= hiC(i) && loR(i) <= hiR(i)) {
        votes.clear()
        var rr = loR(i)
        while (rr <= hiR(i)) {
          var cc = loC(i)
          while (cc <= hiC(i)) {
            val v = px((rr - srcWin.rowOff) * srcWin.width + (cc - srcWin.colOff))
            if (!v.isNaN) votes(v) = votes.getOrElse(v, 0) + 1
            cc += 1
          }
          rr += 1
        }
        if (votes.nonEmpty) {
          var bestV = Double.NaN; var bestN = -1
          votes.foreach { case (v, cnt) =>
            if (cnt > bestN || (cnt == bestN && v < bestV)) { bestV = v; bestN = cnt }
          }
          out(i) = bestV
        }
      }
      i += 1
    }
    out
  }

  private def readNearestOrBilinear(window: Window): Array[Double] = {
    val (cols, rows) = Warp.sourceCoords(window, spec, srcInv, srcEpsg)
    val out = Array.fill(window.width * window.height)(Double.NaN)
    if (method == graft.ops.Resampling.Nearest) {
      val srcWin = Warp.sampleWindow(cols, rows, srcHeight, srcWidth)
      if (srcWin.isEmpty) return out
      val px = source.read(srcWin)
      var i = 0
      while (i < cols.length) {
        val cc = math.floor(cols(i)).toInt; val rr = math.floor(rows(i)).toInt
        if (cc >= 0 && cc < srcWidth && rr >= 0 && rr < srcHeight)
          out(i) = px((rr - srcWin.rowOff) * srcWin.width + (cc - srcWin.colOff))
        i += 1
      }
      out
    } else {
      // bilinear on pixel centers (center of pixel k is k+0.5): bounding
      // rect over the clamped 2x2 neighborhoods of every sample
      var minC = Int.MaxValue; var minR = Int.MaxValue
      var maxC = Int.MinValue; var maxR = Int.MinValue
      var i = 0
      while (i < cols.length) {
        val c0 = math.floor(cols(i) - 0.5).toInt
        val r0 = math.floor(rows(i) - 0.5).toInt
        if (c0 + 1 >= 0 && c0 < srcWidth && r0 + 1 >= 0 && r0 < srcHeight) {
          val lc = math.max(0, c0); val hc = math.min(srcWidth - 1, c0 + 1)
          val lr = math.max(0, r0); val hr = math.min(srcHeight - 1, r0 + 1)
          if (lc < minC) minC = lc
          if (hc > maxC) maxC = hc
          if (lr < minR) minR = lr
          if (hr > maxR) maxR = hr
        }
        i += 1
      }
      if (minC > maxC) return out
      val srcWin = Window(minC, minR, maxC - minC + 1, maxR - minR + 1)
      val px = source.read(srcWin)
      def s(rr: Int, cc: Int): Double =
        if (rr < srcWin.rowOff || rr >= srcWin.rowEnd ||
            cc < srcWin.colOff || cc >= srcWin.colEnd) Double.NaN
        else px((rr - srcWin.rowOff) * srcWin.width + (cc - srcWin.colOff))
      i = 0
      while (i < cols.length) {
        val gr = rows(i) - 0.5; val gc = cols(i) - 0.5
        val r0 = math.floor(gr).toInt; val c0 = math.floor(gc).toInt
        val wr = gr - r0; val wc = gc - c0
        val v00 = s(r0, c0); val v01 = s(r0, c0 + 1)
        val v10 = s(r0 + 1, c0); val v11 = s(r0 + 1, c0 + 1)
        out(i) = v00 * (1 - wr) * (1 - wc) + v01 * (1 - wr) * wc +
          v10 * wr * (1 - wc) + v11 * wr * wc
        i += 1
      }
      out
    }
  }

  override def close(): Unit = source.close()
}
