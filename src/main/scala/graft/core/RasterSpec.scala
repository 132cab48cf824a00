package graft.core

/** The output grid: CRS + bounds + per-axis resolution.
  * Mirrors reference `stackstac/raster_spec.py:12-63`, including the exact
  * GDAL shape rounding (`raster_spec.py:42-53`, which cites
  * OSGeo/gdal gdalwarp_lib.cpp#L3394-L3399 — "not quite the same as
  * `round`").
  */
final case class RasterSpec(epsg: Int, bounds: Bounds, xres: Double, yres: Double) {
  require(xres > 0, s"X resolution $xres must be > 0")
  require(yres > 0, s"Y resolution $yres must be > 0")
  require(bounds.minx < bounds.maxx, s"Invalid bounds: $bounds")
  require(bounds.miny < bounds.maxy, s"Invalid bounds: $bounds")

  def transform: AffineTransform =
    AffineTransform.northUp(bounds.minx, bounds.maxy, xres, yres)

  /** (height, width) with GDAL-style rounding. */
  def shape: (Int, Int) = {
    val width  = ((bounds.maxx - bounds.minx + (xres / 2)) / xres).toInt
    val height = ((bounds.maxy - bounds.miny + (yres / 2)) / yres).toInt
    (height, width)
  }

  def height: Int = shape._1
  def width: Int  = shape._2

  /** Pixel window (in this grid) covering `b`, GDAL-rounded.
    * Analog of `rasterio.windows.from_bounds` as used at reference
    * `stackstac/to_dask.py:134`. */
  def windowFor(b: Bounds): Window = {
    val inv = transform.inverse
    val (c0, r0) = inv(b.minx, b.maxy) // upper-left
    val (c1, r1) = inv(b.maxx, b.miny) // lower-right
    Window.fromEdges(c0, r0, c1, r1)
  }
}

/** Integer pixel rectangle: the spatial read unit (reference
  * `rasterio.windows.Window`, see `stackstac/to_dask.py:134,165`). */
final case class Window(colOff: Int, rowOff: Int, width: Int, height: Int) {
  def isEmpty: Boolean = width <= 0 || height <= 0
  def colEnd: Int = colOff + width
  def rowEnd: Int = rowOff + height

  def intersect(o: Window): Window = {
    val c0 = math.max(colOff, o.colOff); val r0 = math.max(rowOff, o.rowOff)
    val c1 = math.min(colEnd, o.colEnd); val r1 = math.min(rowEnd, o.rowEnd)
    Window(c0, r0, c1 - c0, r1 - r0)
  }

  def intersects(o: Window): Boolean = !intersect(o).isEmpty
}

object Window {
  /** Round fractional pixel edges like rasterio's default window rounding
    * (floor offsets, ceil the far edge). */
  def fromEdges(c0: Double, r0: Double, c1: Double, r1: Double): Window = {
    val colOff = math.floor(c0 + 1e-9).toInt
    val rowOff = math.floor(r0 + 1e-9).toInt
    val colEnd = math.ceil(c1 - 1e-9).toInt
    val rowEnd = math.ceil(r1 - 1e-9).toInt
    Window(colOff, rowOff, colEnd - colOff, rowEnd - rowOff)
  }
}
