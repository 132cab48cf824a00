package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.scan.Tile

/** Focal (neighborhood / stencil) raster operators via HALO EXCHANGE.
  *
  * A focal op needs, for every output pixel, its 3×3 (or k×k)
  * neighborhood — which crosses chunk borders. The naive relational
  * forms are both scale-killers: a pixel-level self-join is O(9·npx)
  * shuffled rows, and assembling the whole raster on one node is the
  * driver-OOM the chunked design exists to avoid. The distributed-
  * stencil answer (identical to HPC ghost cells) is: each tile re-emits
  * itself **plus depth-d border strips addressed to the up-to-8
  * neighbor chunks** (d = ⌈k/2⌉ for a k×k kernel), one shuffle
  * co-locates each chunk's padded (chunk+2d)² neighborhood, and a tight
  * per-chunk loop computes the stencil. Shuffle volume = data +
  * 4d·perimeter strips — ≈1.008× the input at d=1, chunk=1024; flat
  * per-task memory, no join.
  *
  * The reference has no focal op (its users reach for xarray/dask
  * `rolling`, which does the same ghost-cell trick via dask overlap —
  * `dask.array.map_overlap(depth=d)`); this is the Spark-native form.
  * All kernels of one depth ([[focalSum3x3]], [[hornGradSq3x3]],
  * [[d8Flow3x3]] at d=1; [[gaussSum5x5]] at d=2; any future
  * slope/aspect/curvature variant) share ONE halo exchange.
  */
object Focal {

  /** One shuffled fragment of the halo exchange: a sub-rectangle of a
    * source tile addressed to target chunk (tyc, txc), positioned in
    * ABSOLUTE grid coordinates (row0/col0 = top-left). `layer` orders
    * overlapping fragments deterministically (higher wins per cell). */
  final case class HaloFrag(
      band: String, tyc: Int, txc: Int,
      layer: Int, row0: Int, col0: Int, height: Int, width: Int,
      pixels: Array[Double])

  /** 3×3 focal SUM over a (pre-composited) tile layer.
    *
    * Input contract: at most one valid value per (band, pixel) —
    * i.e. apply AFTER a temporal composite ([[Mosaic]]); if several
    * input tiles of one band still overlap a pixel, the highest
    * `itemIdx` wins deterministically.
    *
    * Output: dense chunk tiles (itemIdx = -1, timeMicros = 0) where
    * `pixels(i)` is the sum of the 9 neighbors when ALL of them are
    * inside the raster and valid (non-NaN), else NaN — the strict
    * stencil contract (divide by 9 for the focal mean; keeping the sum
    * keeps integer fixtures exact).
    *
    * `gridH`/`gridW` bound the raster (edge pixels have no full
    * neighborhood and are NaN by the strict contract).
    */
  def focalSum3x3(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                  gridH: Int, gridW: Int): Dataset[Tile] =
    stencil3x3(tiles, chunkY, chunkX, gridH, gridW) { (pad, padW, ctr) =>
      var s = 0.0
      var ok = true
      var dr = -1
      while (dr <= 1 && ok) {
        var dc = -1
        while (dc <= 1 && ok) {
          val v = pad(ctr + dr * padW + dc)
          if (v.isNaN) ok = false else s += v
          dc += 1
        }
        dr += 1
      }
      if (ok) s else Double.NaN
    }

  /** MAJORITY (mode) filter — the CATEGORICAL member of the focal
    * family (ArcGIS Focal Statistics MAJORITY, GRASS `r.neighbors
    * method=mode`): per cell, the most frequent value among the 3×3
    * neighborhood — what land-cover / classification rasters use to
    * strip salt-and-pepper speckle, where every averaging kernel would
    * invent nonexistent classes. Deterministic tiebreak: the SMALLEST
    * value among the tied classes (engine-replayable; ties are common
    * on categorical data, so the tiebreak is load-bearing). Strict
    * stencil like the measurement kernels: NaN unless all 9 neighbors
    * are in-grid and valid. Same one-exchange halo scale shape. */
  def focalMajority3x3(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                       gridH: Int, gridW: Int): Dataset[Tile] =
    stencil3x3(tiles, chunkY, chunkX, gridH, gridW) { (pad, padW, ctr) =>
      val vs = new Array[Double](9)
      var ok = true
      var i = 0
      var dr = -1
      while (dr <= 1 && ok) {
        var dc = -1
        while (dc <= 1 && ok) {
          val v = pad(ctr + dr * padW + dc)
          if (v.isNaN) ok = false else { vs(i) = v; i += 1 }
          dc += 1
        }
        dr += 1
      }
      if (!ok) Double.NaN
      else {
        var bestV = Double.NaN
        var bestN = 0
        var a = 0
        while (a < 9) {
          val v = vs(a)
          var n = 0
          var b = 0
          while (b < 9) { if (vs(b) == v) n += 1; b += 1 }
          if (n > bestN || (n == bestN && v < bestV)) { bestV = v; bestN = n }
          a += 1
        }
        bestV
      }
    }

  /** Horn (1981) 3×3 gradient — the terrain-analysis kernel behind
    * GDAL/ArcGIS slope and aspect — returned as gx²+gy², the squared
    * slope numerator:
    *
    *   gx = (zNE + 2zE + zSE) − (zNW + 2zW + zSW)
    *   gy = (zSW + 2zS + zSE) − (zNW + 2zN + zNE)
    *   slope = atan(√(gx²+gy²) / (8·cellsize))   [caller's one-liner]
    *
    * gx²+gy² is kept un-normalized on purpose: over integer DEMs it is
    * an exact integer, so the distributed result is bit-reproducible and
    * oracle-replayable (atan/sqrt are a pointwise, shape-preserving
    * epilogue callers apply when they want degrees). Strict stencil: NaN
    * unless all 9 neighbors are in-grid and valid. */
  def hornGradSq3x3(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                    gridH: Int, gridW: Int): Dataset[Tile] =
    stencil3x3(tiles, chunkY, chunkX, gridH, gridW) { (pad, padW, ctr) =>
      val zNW = pad(ctr - padW - 1); val zN = pad(ctr - padW); val zNE = pad(ctr - padW + 1)
      val zW  = pad(ctr - 1);        val zC = pad(ctr);        val zE  = pad(ctr + 1)
      val zSW = pad(ctr + padW - 1); val zS = pad(ctr + padW); val zSE = pad(ctr + padW + 1)
      if (zNW.isNaN || zN.isNaN || zNE.isNaN || zW.isNaN || zC.isNaN ||
          zE.isNaN || zSW.isNaN || zS.isNaN || zSE.isNaN) Double.NaN
      else {
        val gx = (zNE + 2 * zE + zSE) - (zNW + 2 * zW + zSW)
        val gy = (zSW + 2 * zS + zSE) - (zNW + 2 * zN + zNE)
        gx * gx + gy * gy
      }
    }

  /** Horn HILLSHADE (GDAL `gdaldem hillshade` / ESRI Hillshade — the
    * terrain-viz verb layered on the same Horn derivatives as
    * [[hornGradSq3x3]]):
    *
    *   dz/dx = ((zNE + 2zE + zSE) − (zNW + 2zW + zSW)) / (8·cell)
    *   dz/dy = ((zSW + 2zS + zSE) − (zNW + 2zN + zNE)) / (8·cell)
    *   slope = atan(zFactor·√((dz/dx)² + (dz/dy)²))
    *   aspect = atan2(dz/dy, −dz/dx)   (the ±2π branch adjustments in
    *            the ESRI pseudocode are no-ops under cos — dropped)
    *   shade = 255·(cos(zen)·cos(slope)
    *               + sin(zen)·sin(slope)·cos(azMath − aspect)),
    *   clamped at 0; zen = 90°−altitude, azMath = (360−azimuth+90)°.
    *
    * Trig is transcendental, so cross-engine parity follows the lanczos
    * convention: consumers quantize (r33 uses q = round(v·256); JVM vs
    * DuckDB libm divergence is ~1e-12, nine orders under the quantum).
    * Strict stencil: NaN unless all 9 neighbors are in-grid and valid. */
  def hillshade3x3(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                   gridH: Int, gridW: Int, cellSize: Double,
                   azimuthDeg: Double = 315.0, altitudeDeg: Double = 45.0,
                   zFactor: Double = 1.0): Dataset[Tile] = {
    val zen = math.toRadians(90.0 - altitudeDeg)
    val azM = math.toRadians(360.0 - azimuthDeg + 90.0)
    val cosZen = math.cos(zen); val sinZen = math.sin(zen)
    stencil3x3(tiles, chunkY, chunkX, gridH, gridW) { (pad, padW, ctr) =>
      val zNW = pad(ctr - padW - 1); val zN = pad(ctr - padW); val zNE = pad(ctr - padW + 1)
      val zW  = pad(ctr - 1);        val zC = pad(ctr);        val zE  = pad(ctr + 1)
      val zSW = pad(ctr + padW - 1); val zS = pad(ctr + padW); val zSE = pad(ctr + padW + 1)
      if (zNW.isNaN || zN.isNaN || zNE.isNaN || zW.isNaN || zC.isNaN ||
          zE.isNaN || zSW.isNaN || zS.isNaN || zSE.isNaN) Double.NaN
      else {
        val dx = ((zNE + 2 * zE + zSE) - (zNW + 2 * zW + zSW)) / (8.0 * cellSize)
        val dy = ((zSW + 2 * zS + zSE) - (zNW + 2 * zN + zNE)) / (8.0 * cellSize)
        val slope = math.atan(zFactor * math.sqrt(dx * dx + dy * dy))
        val aspect = math.atan2(dy, -dx)
        val hs = 255.0 * (cosZen * math.cos(slope) +
          sinZen * math.sin(slope) * math.cos(azM - aspect))
        if (hs < 0.0) 0.0 else hs
      }
    }
  }

  /** D8 flow direction (O'Callaghan & Mark 1984 — the hydrology
    * primitive behind watershed delineation and flow accumulation):
    * each pixel points at its steepest-DESCENT neighbor, ESRI-coded
    * 1=E, 2=SE, 4=S, 8=SW, 16=W, 32=NW, 64=N, 128=NE; flats and pits
    * (no positive drop) code −1. Descent rate = (zC − zN)/dist with
    * dist 1 cardinal, √2 diagonal — both engines compute the identical
    * IEEE double (correctly-rounded divide and sqrt over exact integer
    * drops), so the argmax is engine-portable; ties take the FIRST code
    * in ESRI order. Rides the shared halo exchange; strict stencil. */
  def d8Flow3x3(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                gridH: Int, gridW: Int): Dataset[Tile] = {
    // (code, dRow, dCol, diagonal) in ESRI tie-break order
    val dirs = Array(
      (1.0, 0, 1, false), (2.0, 1, 1, true), (4.0, 1, 0, false),
      (8.0, 1, -1, true), (16.0, 0, -1, false), (32.0, -1, -1, true),
      (64.0, -1, 0, false), (128.0, -1, 1, true))
    val sqrt2 = math.sqrt(2.0)
    stencil3x3(tiles, chunkY, chunkX, gridH, gridW) { (pad, padW, ctr) =>
      val zC = pad(ctr)
      var anyNaN = zC.isNaN
      var best = 0.0
      var bestCode = -1.0
      var i = 0
      while (i < 8 && !anyNaN) {
        val (code, dr, dc, diag) = dirs(i)
        val zN = pad(ctr + dr * padW + dc)
        if (zN.isNaN) anyNaN = true
        else {
          val rate = if (diag) (zC - zN) / sqrt2 else zC - zN
          if (rate > best) { best = rate; bestCode = code }
        }
        i += 1
      }
      if (anyNaN) Double.NaN else bestCode
    }
  }

  /** The GDAL `gdaldem` terrain-INDEX trio — TPI, TRI, roughness (the
    * three analysis verbs alongside slope/aspect/hillshade, closing the
    * `gdaldem` family: reference users reach for these via
    * rasterio/GDAL on the arrays `to_dask.py` hands them) — FUSED onto
    * one halo exchange: one shuffle, three output bands per input band:
    *
    *   `<band>_tpi8`  = 8·zC − Σ(8 neighbors)      (Weiss 2001 TPI ×8)
    *   `<band>_trisq` = Σ(zC − zNᵢ)²               (Riley 1999 TRI²)
    *   `<band>_rough` = max(3×3) − min(3×3)        (GDAL roughness)
    *
    * Each is kept in its exact-integer form on integer DEMs — the
    * [[hornGradSq3x3]] discipline: TPI's /8 mean, TRI's √ are pointwise,
    * shape-preserving epilogues the caller applies when they want the
    * textbook units, and omitting them keeps the distributed result
    * bit-reproducible and oracle-replayable. Fusing matters at scale:
    * the three indices share every byte of their neighborhood, so three
    * separate stencil passes would pay the data+halo shuffle three
    * times for zero additional information — here the padded chunk is
    * shuffled ONCE and the per-pixel loop writes all three outputs
    * (same fusion argument as A1's partial aggregates). Strict stencil:
    * all three are NaN unless all 9 neighbors are in-grid and valid. */
  def terrainIndices3x3(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                        gridH: Int, gridW: Int): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    haloGroups(tiles, chunkY, chunkX, gridH, gridW, depth = 1) {
      (band, tyc, txc, pad, padW, padR0, padC0) =>
        val outH = math.min(chunkY, gridH - tyc * chunkY)
        val outW = math.min(chunkX, gridW - txc * chunkX)
        val tpi = new Array[Double](outH * outW)
        val tri = new Array[Double](outH * outW)
        val rgh = new Array[Double](outH * outW)
        var r = 0
        while (r < outH) {
          val gr = tyc * chunkY + r
          var c = 0
          while (c < outW) {
            val gc = txc * chunkX + c
            val i = r * outW + c
            var vT = Double.NaN; var vR = Double.NaN; var vG = Double.NaN
            if (gr >= 1 && gr <= gridH - 2 && gc >= 1 && gc <= gridW - 2) {
              val ctr = (gr - padR0) * padW + (gc - padC0)
              val zC = pad(ctr)
              var ok = !zC.isNaN
              var sum = 0.0; var sq = 0.0; var mn = zC; var mx = zC
              var dr = -1
              while (dr <= 1 && ok) {
                var dc = -1
                while (dc <= 1 && ok) {
                  if (dr != 0 || dc != 0) {
                    val zN = pad(ctr + dr * padW + dc)
                    if (zN.isNaN) ok = false
                    else {
                      sum += zN
                      val d = zC - zN
                      sq += d * d
                      if (zN < mn) mn = zN
                      if (zN > mx) mx = zN
                    }
                  }
                  dc += 1
                }
                dr += 1
              }
              if (ok) { vT = 8.0 * zC - sum; vR = sq; vG = mx - mn }
            }
            tpi(i) = vT; tri(i) = vR; rgh(i) = vG
            c += 1
          }
          r += 1
        }
        Iterator(
          Tile(-1, 0, band + "_tpi8", 0L, tyc, txc, 0, 0, outH, outW, tpi),
          Tile(-1, 0, band + "_trisq", 0L, tyc, txc, 0, 0, outH, outW, tri),
          Tile(-1, 0, band + "_rough", 0L, tyc, txc, 0, 0, outH, outW, rgh))
    }
  }

  /** HORIZON SCAN — the per-cell, per-direction maximum elevation-angle
    * slope within a radius, the primitive behind SKY-VIEW FACTOR
    * terrain shading (Zakšek, Oštir & Kokalj 2011) and ridge/valley
    * openness (Yokoyama et al. 2002): for each of the 8 compass
    * directions, how steeply does the terrain rise toward the horizon
    * within `d` cells?
    *
    * Per direction the slope to the k-th ray cell is (z_k − z_c)/k (the
    * √2 run of the diagonals scales a whole direction uniformly, so it
    * never affects WHICH k is the horizon — it is a pointwise epilogue,
    * the hornGradSq discipline). Kept exact-integer via the r22 rational
    * convention: q = max_k ⌊quantum·(z_k − z_c)/k⌋ — with integer DEMs,
    * quantum·Δz/k is a rational with denominator ≤ d, never within an
    * ulp of an integer unless it IS one, so the floor replays bit-exact
    * in any engine. Output: one band `<band>_horq` = Σ over the 8
    * directions of q (negative where terrain falls away — openness).
    *
    * Scale shape: ONE depth-d halo exchange (shuffle = data +
    * 4d·perimeter strips — the deepest consumer of the stencilK
    * machinery; d must stay < chunk, re-chunk coarser for wider
    * horizons), then a pure per-chunk 8d-tap loop. Strict stencil: NaN
    * unless the full (2d+1)² neighborhood is in-grid and every ray cell
    * valid. */
  def horizonQ(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
               gridH: Int, gridW: Int, d: Int,
               quantum: Double = 1024.0): Dataset[Tile] = {
    require(d >= 1, s"Focal: horizon radius d=$d")
    val spark = tiles.sparkSession
    import spark.implicits._
    val dirs = Array((-1, -1), (-1, 0), (-1, 1), (0, -1),
                     (0, 1), (1, -1), (1, 0), (1, 1))
    stencilK(tiles, chunkY, chunkX, gridH, gridW, depth = d) { (pad, padW, ctr) =>
      val zC = pad(ctr)
      if (zC.isNaN) Double.NaN
      else {
        var sum = 0.0
        var ok = true
        var di = 0
        while (di < 8 && ok) {
          val (dr, dc) = dirs(di)
          var best = Double.NegativeInfinity
          var k = 1
          while (k <= d && ok) {
            val zk = pad(ctr + k * (dr * padW + dc))
            if (zk.isNaN) ok = false
            else {
              val q = math.floor(quantum * (zk - zC) / k)
              if (q > best) best = q
            }
            k += 1
          }
          sum += best
          di += 1
        }
        if (ok) sum else Double.NaN
      }
    }.map(t => t.copy(band = t.band + "_horq"))
  }

  /** Binary MORPHOLOGY — closing and opening with a (2r+1)² square
    * structuring element, FUSED onto one depth-2r halo exchange (the
    * terrainIndices3x3 fusion discipline: erode∘dilate and dilate∘erode
    * both need 2r of context, and shipping the mask twice for zero new
    * bytes is the scale-killer). The canonical mask-cleanup verbs of a
    * raster pipeline: CLOSING fills pinholes in cloud/water/quality
    * masks (≤ 2r across), OPENING removes speckle (< 2r across) —
    * what a stackstac user does to a QA band before compositing.
    *
    * Border convention: 0-padding (morphology's standard background
    * extension) — nodata (NaN) and out-of-grid cells read as background
    * 0, so masks erode at the data edge instead of NaN-poisoning it
    * (deliberately NOT the strict-stencil NaN contract of the
    * measurement kernels: a mask is set membership, not a measurement).
    * Input must be 0/1 valued — anything else throws loudly.
    *
    * Each pass is SEPARABLE (row max/min then column max/min) and each
    * 1-D pass is van Herk–Gil-Werman (van Herk 1992; Gil & Werman 1993):
    * block-local running extrema give 3 comparisons per pixel
    * REGARDLESS of radius — O(1)/px where a direct windowed rescan is
    * O(r)/px and the naive 2-D window O(r²)/px. At the documented
    * production radius (r = 8 on 1024-chunks) that is ~17x less kernel
    * work per pass; the cost of a closing+opening is radius-independent,
    * so structuring-element size is a free modeling choice. Returns two
    * bands per input band: `<band>_close` and `<band>_open`. */
  def morphology(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                 gridH: Int, gridW: Int, radius: Int): Dataset[Tile] = {
    require(radius >= 1, s"Focal: radius=$radius")
    val spark = tiles.sparkSession
    import spark.implicits._
    haloGroups(tiles, chunkY, chunkX, gridH, gridW, depth = 2 * radius) {
      (band, tyc, txc, pad, padW, padR0, padC0) =>
        val padH = pad.length / padW
        // background extension: NaN (nodata / out-of-grid) reads as 0;
        // loud guard on non-binary input
        val b = new Array[Double](pad.length)
        var i = 0
        while (i < pad.length) {
          val v = pad(i)
          if (v.isNaN) b(i) = 0.0
          else if (v == 0.0 || v == 1.0) b(i) = v
          else throw new IllegalArgumentException(
            s"Focal.morphology: non-binary mask value $v in band $band " +
            s"chunk ($tyc,$txc) — input must be a 0/1 mask")
          i += 1
        }
        // separable window pass over the full pad array (array-edge
        // cells are never consumed: chunk centers sit >= 2r from it);
        // the 1-D passes are the shared vHGW kernel ([[vhgwWindow2d]])
        def window(src: Array[Double], isMax: Boolean): Array[Double] =
          vhgwWindow2d(src, padH, padW, radius, isMax)
        val close = window(window(b, isMax = true), isMax = false)
        val open = window(window(b, isMax = false), isMax = true)
        val outH = math.min(chunkY, gridH - tyc * chunkY)
        val outW = math.min(chunkX, gridW - txc * chunkX)
        val oc = new Array[Double](outH * outW)
        val oo = new Array[Double](outH * outW)
        var r = 0
        while (r < outH) {
          val pr = tyc * chunkY + r - padR0
          var c = 0
          while (c < outW) {
            val pc = txc * chunkX + c - padC0
            oc(r * outW + c) = close(pr * padW + pc)
            oo(r * outW + c) = open(pr * padW + pc)
            c += 1
          }
          r += 1
        }
        Iterator(
          Tile(-1, 0, band + "_close", 0L, tyc, txc, 0, 0, outH, outW, oc),
          Tile(-1, 0, band + "_open", 0L, tyc, txc, 0, 0, outH, outW, oo))
    }
  }

  /** 5×5 binomial (Gaussian) weighted SUM — the smoothing kernel of
    * image pyramids and DEM denoising, and the first consumer of the
    * depth-2 halo. Weights are the binomial outer product
    * [1 4 6 4 1]ᵀ·[1 4 6 4 1] (sum 256): over integer fields the
    * weighted sum is an exact integer (≤ 256·max), so the distributed
    * result is bit-reproducible and oracle-replayable — divide by 256
    * for the smoothed value, exactly the [[focalSum3x3]] convention.
    * Strict stencil: NaN unless all 25 neighbors are in-grid and
    * valid. */
  def gaussSum5x5(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                  gridH: Int, gridW: Int): Dataset[Tile] = {
    val w = Array(1.0, 4.0, 6.0, 4.0, 1.0)
    stencilK(tiles, chunkY, chunkX, gridH, gridW, depth = 2) { (pad, padW, ctr) =>
      var s = 0.0
      var ok = true
      var dr = -2
      while (dr <= 2 && ok) {
        var dc = -2
        while (dc <= 2 && ok) {
          val v = pad(ctr + dr * padW + dc)
          if (v.isNaN) ok = false else s += w(dr + 2) * w(dc + 2) * v
          dc += 1
        }
        dr += 1
      }
      if (ok) s else Double.NaN
    }
  }

  /** Marching-squares contour CASE raster (the raster→vector iso-line
    * primitive behind contour maps): for each 2×2 pixel cell anchored
    * at its top-left pixel, the 4-bit case id
    * `(TL≥T)<<3 | (TR≥T)<<2 | (BR≥T)<<1 | (BL≥T)` — cases 0/15 emit no
    * contour segment, the saddles 5/10 emit two, every other case one.
    * The case census is the scale-safe distributed form of contour
    * extraction: the geometry pass (interpolating actual vertices) is a
    * pointwise epilogue per flagged cell, while THIS pass decides which
    * cells participate — and it rides the existing depth-1 halo
    * exchange (the +1 taps live inside the 1-pixel pad). Comparisons
    * are exact (no float arithmetic), so the case raster is
    * bit-reproducible in any engine. Strict stencil: NaN unless all 4
    * corners are valid; cells anchored on the grid's top/left border
    * ring are outside the depth-1 output window and are NaN (the census
    * window is cells [1, H−2]×[1, W−2], stated by the oracle too). */
  def marchingSquaresCase(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                          gridH: Int, gridW: Int,
                          threshold: Double): Dataset[Tile] =
    stencil3x3(tiles, chunkY, chunkX, gridH, gridW) { (pad, padW, ctr) =>
      val tl = pad(ctr); val tr = pad(ctr + 1)
      val bl = pad(ctr + padW); val br = pad(ctr + padW + 1)
      if (tl.isNaN || tr.isNaN || bl.isNaN || br.isNaN) Double.NaN
      else {
        var cs = 0
        if (tl >= threshold) cs |= 8
        if (tr >= threshold) cs |= 4
        if (br >= threshold) cs |= 2
        if (bl >= threshold) cs |= 1
        cs.toDouble
      }
    }

  /** One contour SEGMENT from [[contourSegments]]: the two
    * linearly-interpolated edge crossings of a marching-squares cell, in
    * grid coordinates (y = row, x = col; the cell is anchored at its
    * top-left pixel (cellR, cellC)). `seg` is 0 or 1 (saddle cells emit
    * two segments). */
  final case class ContourSeg(level: Double, cellR: Int, cellC: Int, seg: Int,
                              y1: Double, x1: Double, y2: Double, x2: Double)

  /** Marching-squares contour segments WITH vertex interpolation — the
    * geometry half [[marchingSquaresCase]] scoped out (its census decides
    * which cells participate; this emits the actual iso-line pieces).
    * Per participating 2×2 cell and level T, each crossed edge's vertex
    * is the linear interpolation v0 + t·(v1−v0) = T ⇒ t = (T−v0)/(v1−v0)
    * along the edge; segments connect edge pairs by the standard case
    * table. SADDLES (cases 5/10) resolve as CENTER-BELOW — each inside
    * corner is isolated by its own segment — a fixed convention (no
    * center-average disambiguation), stated here because engines differ.
    *
    * DETERMINISM: over integer-valued rasters with a half-integer
    * threshold, t is ONE correctly-rounded IEEE divide of exact inputs
    * and the vertex coordinate ONE add — every engine computes the
    * identical double (the r26/r22 discipline), so consumers may hash
    * quantized coordinates directly. Endpoint order inside a segment is
    * fixed by the case table (first-listed edge first).
    *
    * Scale shape: rides the SAME depth-1 halo exchange as every 3×3
    * kernel (shuffle = data + 4·perimeter), then emits O(crossed cells)
    * rows — no join, no window; the downstream polyline stitching
    * (gaps-and-islands over shared endpoints) is a separate op. Cells
    * anchored on the grid's top/left border ring are outside the depth-1
    * output window (the [[marchingSquaresCase]] contract): anchors range
    * over [1, grid−2]². */
  def contourSegments(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                      gridH: Int, gridW: Int,
                      levels: Seq[Double]): Dataset[ContourSeg] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    // case -> crossed-edge pairs; edges coded 0=top,1=right,2=bottom,3=left
    val segTable: Array[Array[(Int, Int)]] = Array(
      /* 0 */ Array.empty, /* 1 */ Array((3, 2)), /* 2 */ Array((2, 1)),
      /* 3 */ Array((3, 1)), /* 4 */ Array((0, 1)),
      /* 5 */ Array((0, 1), (3, 2)), // saddle: TR isolated, BL isolated
      /* 6 */ Array((0, 2)), /* 7 */ Array((3, 0)), /* 8 */ Array((3, 0)),
      /* 9 */ Array((0, 2)),
      /* 10 */ Array((3, 0), (2, 1)), // saddle: TL isolated, BR isolated
      /* 11 */ Array((0, 1)), /* 12 */ Array((3, 1)), /* 13 */ Array((2, 1)),
      /* 14 */ Array((3, 2)), /* 15 */ Array.empty)
    val lv = levels.toArray
    haloGroups(tiles, chunkY, chunkX, gridH, gridW, depth = 1) {
      (band, tyc, txc, pad, padW, padR0, padC0) =>
        val outH = math.min(chunkY, gridH - tyc * chunkY)
        val outW = math.min(chunkX, gridW - txc * chunkX)
        val out = scala.collection.mutable.ArrayBuffer.empty[ContourSeg]
        var r = 0
        while (r < outH) {
          val gr = tyc * chunkY + r
          var c = 0
          while (c < outW) {
            val gc = txc * chunkX + c
            if (gr >= 1 && gr <= gridH - 2 && gc >= 1 && gc <= gridW - 2) {
              val ctr = (gr - padR0) * padW + (gc - padC0)
              val tl = pad(ctr); val tr = pad(ctr + 1)
              val bl = pad(ctr + padW); val br = pad(ctr + padW + 1)
              if (!tl.isNaN && !tr.isNaN && !bl.isNaN && !br.isNaN) {
                var li = 0
                while (li < lv.length) {
                  val t = lv(li)
                  var cs = 0
                  if (tl >= t) cs |= 8
                  if (tr >= t) cs |= 4
                  if (br >= t) cs |= 2
                  if (bl >= t) cs |= 1
                  val segs = segTable(cs)
                  var si = 0
                  while (si < segs.length) {
                    val (e1, e2) = segs(si)
                    // edge crossing (y, x); denominators are nonzero by
                    // construction (the case guarantees a straddle)
                    def y(e: Int): Double = e match {
                      case 0 => gr.toDouble
                      case 1 => gr + (t - tr) / (br - tr)
                      case 2 => (gr + 1).toDouble
                      case 3 => gr + (t - tl) / (bl - tl)
                    }
                    def x(e: Int): Double = e match {
                      case 0 => gc + (t - tl) / (tr - tl)
                      case 1 => (gc + 1).toDouble
                      case 2 => gc + (t - bl) / (br - bl)
                      case 3 => gc.toDouble
                    }
                    out += ContourSeg(t, gr, gc, si, y(e1), x(e1), y(e2), x(e2))
                    si += 1
                  }
                  li += 1
                }
              }
            }
            c += 1
          }
          r += 1
        }
        out.iterator
    }
  }

  /** Depth-1 specialization — every 3×3 kernel shares this one halo
    * exchange. */
  private def stencil3x3(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                         gridH: Int, gridW: Int)(
      kernel: (Array[Double], Int, Int) => Double): Dataset[Tile] =
    stencilK(tiles, chunkY, chunkX, gridH, gridW, depth = 1)(kernel)

  /** The shared halo exchange + per-chunk stencil loop, generalized to
    * halo DEPTH d (a (2d+1)×(2d+1) kernel needs d border pixels — the
    * `dask.array.map_overlap(depth=d)` parity the family is named
    * after). `kernel` sees the padded neighborhood array, its row
    * stride, and the center index; border pixels without a full
    * (2d+1)² in-grid neighborhood are NaN before the kernel is
    * consulted. Scale shape is unchanged: fragments reach the same ≤8
    * neighbor chunks (any d < chunk size), shuffle = data + 4d·perimeter
    * strips — still ≈(1 + 4d/chunk)× the input, one shuffle, no join. */
  private def stencilK(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                       gridH: Int, gridW: Int, depth: Int)(
      kernel: (Array[Double], Int, Int) => Double): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    haloGroups(tiles, chunkY, chunkX, gridH, gridW, depth) {
      (band, tyc, txc, pad, padW, padR0, padC0) =>
        val outH = math.min(chunkY, gridH - tyc * chunkY)
        val outW = math.min(chunkX, gridW - txc * chunkX)
        val out = new Array[Double](outH * outW)
        var r = 0
        while (r < outH) {
          val gr = tyc * chunkY + r
          var c = 0
          while (c < outW) {
            val gc = txc * chunkX + c
            out(r * outW + c) =
              if (gr >= depth && gr <= gridH - 1 - depth &&
                  gc >= depth && gc <= gridW - 1 - depth)
                kernel(pad, padW, (gr - padR0) * padW + (gc - padC0))
              else Double.NaN
            c += 1
          }
          r += 1
        }
        Iterator.single(Tile(-1, 0, band, 0L, tyc, txc, 0, 0, outH, outW, out))
    }
  }

  /** The halo exchange itself, decoupled from the per-pixel kernel shape:
    * fragments fan out to ≤8 neighbor chunks, one shuffle co-locates each
    * chunk's padded (chunk+2d)² neighborhood, and `emit` turns the padded
    * array into ANY row type — one dense output tile for the stencil
    * family ([[stencilK]]), O(crossed cells) segment rows for
    * [[contourSegments]]. Same scale shape for every consumer: shuffle =
    * data + 4d·perimeter strips, one exchange, no join. */
  /** Shared van Herk–Gil-Werman 2-D window extremum (van Herk 1992;
    * Gil & Werman 1993): separable row-then-column passes where each
    * 1-D pass costs 3 comparisons per cell REGARDLESS of radius —
    * block-local forward running extremum g and backward running
    * extremum h over blocks of w = 2r+1; any w-length window spans at
    * most two blocks, so its extremum is combine(h(start), g(end)).
    * Lines are virtually padded with the identity element (-inf for
    * max, +inf for min), which reproduces truncated-window (clamped)
    * edge semantics — a sentinel never wins against a real value.
    * Callers map nodata to the identity beforehand (ignore-nodata
    * semantics) or to a real value (background extension); raw NaN
    * would poison block-sized neighborhoods, never pass it in. */
  private[ops] def vhgwWindow2d(src: Array[Double], padH: Int, padW: Int,
                                radius: Int, isMax: Boolean): Array[Double] = {
    val w = 2 * radius + 1
    val npadRow = ((padW + 2 * radius + w - 1) / w) * w
    val npadCol = ((padH + 2 * radius + w - 1) / w) * w
    val lineBuf = new Array[Double](math.max(npadRow, npadCol))
    val gBuf = new Array[Double](math.max(npadRow, npadCol))
    val hBuf = new Array[Double](math.max(npadRow, npadCol))
    val sentinel =
      if (isMax) Double.NegativeInfinity else Double.PositiveInfinity
    def line(in: Array[Double], out: Array[Double], off: Int,
             stride: Int, n: Int, npad: Int): Unit = {
      var i = 0
      while (i < npad) { lineBuf(i) = sentinel; i += 1 }
      i = 0
      while (i < n) { lineBuf(radius + i) = in(off + i * stride); i += 1 }
      i = 0
      while (i < npad) {
        val v = lineBuf(i)
        gBuf(i) =
          if (i % w == 0) v
          else if (isMax) math.max(gBuf(i - 1), v)
          else math.min(gBuf(i - 1), v)
        i += 1
      }
      i = npad - 1
      while (i >= 0) {
        val v = lineBuf(i)
        hBuf(i) =
          if (i % w == w - 1) v
          else if (isMax) math.max(hBuf(i + 1), v)
          else math.min(hBuf(i + 1), v)
        i -= 1
      }
      // window of original cell j = padded [j, j + w - 1]
      var j = 0
      while (j < n) {
        out(off + j * stride) =
          if (isMax) math.max(hBuf(j), gBuf(j + w - 1))
          else math.min(hBuf(j), gBuf(j + w - 1))
        j += 1
      }
    }
    val mid = new Array[Double](src.length)
    var r = 0
    while (r < padH) { line(src, mid, r * padW, 1, padW, npadRow); r += 1 }
    val out = new Array[Double](src.length)
    var c = 0
    while (c < padW) { line(mid, out, c, padW, padH, npadCol); c += 1 }
    out
  }

  /** FOCAL MAX / MIN at arbitrary radius (ArcGIS Focal Statistics
    * MAXIMUM/MINIMUM; GRASS r.neighbors max/min) — the greyscale
    * dilation/erosion pair, radius-independent via [[vhgwWindow2d]]
    * (3 comparisons/px/pass at ANY radius). IGNORE-NODATA semantics,
    * the focal-statistics default: NaN cells and out-of-grid cells are
    * the identity (they never win), a window with no valid cell is NaN;
    * grid-edge windows truncate. Returns two bands per input band:
    * `<band>_max` and `<band>_min`. */
  def focalExtrema(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                   gridH: Int, gridW: Int, radius: Int): Dataset[Tile] = {
    require(radius >= 1, s"Focal: radius=$radius")
    val spark = tiles.sparkSession
    import spark.implicits._
    haloGroups(tiles, chunkY, chunkX, gridH, gridW, depth = radius) {
      (band, tyc, txc, pad, padW, padR0, padC0) =>
        val padH = pad.length / padW
        val bMax = new Array[Double](pad.length)
        val bMin = new Array[Double](pad.length)
        var i = 0
        while (i < pad.length) {
          val v = pad(i)
          bMax(i) = if (v.isNaN) Double.NegativeInfinity else v
          bMin(i) = if (v.isNaN) Double.PositiveInfinity else v
          i += 1
        }
        val mx = vhgwWindow2d(bMax, padH, padW, radius, isMax = true)
        val mn = vhgwWindow2d(bMin, padH, padW, radius, isMax = false)
        val outH = math.min(chunkY, gridH - tyc * chunkY)
        val outW = math.min(chunkX, gridW - txc * chunkX)
        val oMax = new Array[Double](outH * outW)
        val oMin = new Array[Double](outH * outW)
        var r = 0
        while (r < outH) {
          val pr = tyc * chunkY + r - padR0
          var c = 0
          while (c < outW) {
            val pc = txc * chunkX + c - padC0
            val vx = mx(pr * padW + pc)
            val vn = mn(pr * padW + pc)
            oMax(r * outW + c) = if (vx.isNegInfinity) Double.NaN else vx
            oMin(r * outW + c) = if (vn.isPosInfinity) Double.NaN else vn
            c += 1
          }
          r += 1
        }
        Iterator(
          Tile(-1, 0, band + "_max", 0L, tyc, txc, 0, 0, outH, outW, oMax),
          Tile(-1, 0, band + "_min", 0L, tyc, txc, 0, 0, outH, outW, oMin))
    }
  }

  private def haloGroups[T: org.apache.spark.sql.Encoder](
      tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
      gridH: Int, gridW: Int, depth: Int)(
      emit: (String, Int, Int, Array[Double], Int, Int, Int) => Iterator[T]): Dataset[T] = {
    require(depth >= 1 && depth < chunkY && depth < chunkX,
      s"Focal: halo depth $depth must be in [1, chunk) — a deeper halo " +
      "than the chunk would need fragments beyond the 8-neighbor " +
      "exchange; re-chunk coarser instead")
    val spark = tiles.sparkSession
    import spark.implicits._

    val frags = tiles.flatMap { t =>
      val r0 = t.yChunk * chunkY + t.rowOff
      val c0 = t.xChunk * chunkX + t.colOff
      for {
        dy <- -1 to 1
        dx <- -1 to 1
        tyc = t.yChunk + dy
        txc = t.xChunk + dx
        if tyc >= 0 && txc >= 0 &&
          tyc * chunkY < gridH && txc * chunkX < gridW
        // the target chunk's padded region, clipped to the raster
        pr0 = math.max(tyc * chunkY - depth, 0)
        pr1 = math.min((tyc + 1) * chunkY + depth, gridH)
        pc0 = math.max(txc * chunkX - depth, 0)
        pc1 = math.min((txc + 1) * chunkX + depth, gridW)
        // intersection with this tile's rectangle
        ir0 = math.max(r0, pr0); ir1 = math.min(r0 + t.height, pr1)
        ic0 = math.max(c0, pc0); ic1 = math.min(c0 + t.width, pc1)
        if ir0 < ir1 && ic0 < ic1
      } yield {
        val h = ir1 - ir0; val w = ic1 - ic0
        val px =
          if (h == t.height && w == t.width) t.pixels
          else {
            val out = new Array[Double](h * w)
            var r = 0
            while (r < h) {
              System.arraycopy(t.pixels, (ir0 - r0 + r) * t.width + (ic0 - c0),
                out, r * w, w)
              r += 1
            }
            out
          }
        HaloFrag(t.band, tyc, txc, t.itemIdx, ir0, ic0, h, w, px)
      }
    }

    frags.groupByKey(f => (f.band, f.tyc, f.txc)).flatMapGroups {
      (key: (String, Int, Int), it: Iterator[HaloFrag]) =>
        val (band, tyc, txc) = key
        // Padded neighborhood: rows [tyc*chunkY-d, (tyc+1)*chunkY+d) ∩ grid.
        val padR0 = tyc * chunkY - depth
        val padC0 = txc * chunkX - depth
        val padH = chunkY + 2 * depth
        val padW = chunkX + 2 * depth
        val pad = Array.fill(padH * padW)(Double.NaN)
        // Deterministic overlap resolution: splice in ascending layer
        // order; later (higher-itemIdx) VALID values overwrite.
        it.toArray.sortBy(f => (f.layer, f.row0, f.col0)).foreach { f =>
          var r = 0
          while (r < f.height) {
            var c = 0
            while (c < f.width) {
              val v = f.pixels(r * f.width + c)
              if (!v.isNaN)
                pad((f.row0 - padR0 + r) * padW + (f.col0 - padC0 + c)) = v
              c += 1
            }
            r += 1
          }
        }
        emit(band, tyc, txc, pad, padW, padR0, padC0)
    }
  }
}
