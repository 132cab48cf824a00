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

  def read(window: Window): Array[Double] = {
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
