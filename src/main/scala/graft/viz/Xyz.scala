package graft.viz

import graft.core.{Bounds, Proj, RasterSpec}

/** Slippy-map (XYZ) tile math — the reference's mercantile usage
  * (`geom_utils.py:307-383`, zoom formulas `show.py:791-809`). All pure
  * formula (OSM wiki), no external deps. */
object Xyz {
  private val WebMercMax = 20037508.342789244 // pi * R

  /** EPSG:3857 bounds of tile (z, x, y). */
  def tileBounds3857(z: Int, x: Int, y: Int): Bounds = {
    val n = 1 << z
    val size = 2 * WebMercMax / n
    val minx = -WebMercMax + x * size
    val maxy = WebMercMax - y * size
    Bounds(minx, maxy - size, minx + size, maxy)
  }

  /** The 256px output grid spec for one XYZ tile. */
  def tileSpec(z: Int, x: Int, y: Int, px: Int = 256): RasterSpec = {
    val b = tileBounds3857(z, x, y)
    RasterSpec(3857, b, b.width / px, b.height / px)
  }

  /** Tile containing a lon/lat at zoom z. */
  def tileOf(lon: Double, lat: Double, z: Int): (Int, Int) = {
    val n = 1 << z
    val xt = ((lon + 180.0) / 360.0 * n).toInt
    val latRad = math.toRadians(lat)
    val yt = ((1.0 - math.log(math.tan(latRad) + 1 / math.cos(latRad)) / math.Pi) / 2.0 * n).toInt
    (math.max(0, math.min(n - 1, xt)), math.max(0, math.min(n - 1, yt)))
  }

  /** Natural zoom so one data pixel ~= one screen pixel (reference
    * `show.py:791-809` log2 formula). `resM` = data resolution in
    * meters-per-pixel at the equator. */
  def naturalZoom(resM: Double, tilePx: Int = 256): Int = {
    val z = math.log(2 * WebMercMax / (resM * tilePx)) / math.log(2.0)
    math.max(0, math.ceil(z).toInt)
  }

  /** Does an array with bounds `b` (in `epsg`) overlap tile (z,x,y)?
    * None-overlap short-circuits tile rendering (`geom_utils.py:307-383`
    * returns None). */
  def overlapsTile(b: Bounds, epsg: Int, z: Int, x: Int, y: Int): Boolean =
    Proj.reprojectBounds(b, epsg, 3857).overlaps(tileBounds3857(z, x, y))
}
