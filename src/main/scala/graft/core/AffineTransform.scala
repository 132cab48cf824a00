package graft.core

/** 2-D affine transform mapping pixel (col, row) -> world (x, y):
  * {{{ x = a*col + b*row + c ;  y = d*col + e*row + f }}}
  * Coefficient order matches the `affine.Affine` convention the reference
  * uses (`stackstac/raster_spec.py:31-40`). Only rectilinear (b == d == 0)
  * transforms are accepted by the planner, like the reference
  * (`stackstac/prepare.py:276-284`).
  */
final case class AffineTransform(a: Double, b: Double, c: Double,
                                 d: Double, e: Double, f: Double) {
  def apply(col: Double, row: Double): (Double, Double) =
    (a * col + b * row + c, d * col + e * row + f)

  def isRectilinear: Boolean = b == 0.0 && d == 0.0

  def xres: Double = math.abs(a)
  def yres: Double = math.abs(e)

  /** Inverse transform (world -> pixel). */
  def inverse: AffineTransform = {
    val det = a * e - b * d
    require(det != 0.0, s"Singular affine transform: $this")
    val ia = e / det; val ib = -b / det
    val id = -d / det; val ie = a / det
    val ic = -(ia * c + ib * f)
    val if_ = -(id * c + ie * f)
    AffineTransform(ia, ib, ic, id, ie, if_)
  }

  /** Bounds of a (ysize, xsize) raster under this transform — the 4-corner
    * envelope, as in reference `stackstac/geom_utils.py:18-37`. */
  def rasterBounds(ysize: Int, xsize: Int): Bounds = {
    val corners = Seq(apply(0, 0), apply(0, ysize), apply(xsize, ysize), apply(xsize, 0))
    val xs = corners.map(_._1); val ys = corners.map(_._2)
    Bounds(xs.min, ys.min, xs.max, ys.max)
  }
}

object AffineTransform {
  /** North-up transform from bounds + resolution (reference
    * `raster_spec.py:31-40`): top-left anchored, negative y scale. */
  def northUp(minx: Double, maxy: Double, xres: Double, yres: Double): AffineTransform =
    AffineTransform(xres, 0.0, minx, 0.0, -yres, maxy)

  /** Build from a GDAL-order 6-tuple or STAC `proj:transform` 9-tuple
    * (row-major 3x3; reference accepts both at `stackstac/prepare.py:242`). */
  def fromStac(coeffs: Seq[Double]): AffineTransform = coeffs match {
    case Seq(a, b, c, d, e, f)          => AffineTransform(a, b, c, d, e, f)
    case Seq(a, b, c, d, e, f, _, _, _) => AffineTransform(a, b, c, d, e, f)
    case other => throw new IllegalArgumentException(
      s"proj:transform must have 6 or 9 coefficients, got ${other.length}")
  }
}
