package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.core.RasterSpec
import graft.scan.Tile

/** Bridge from the tile representation to a flat pixel DataFrame with
  * world coordinates — the xarray coordinate view (`prepare.py:445-461`:
  * x/y labels from bounds+resolution, topleft or center convention).
  * Lets users run arbitrary SQL over pixels (label slicing P7, percentile
  * A7, zonal stats) at the cost of explosion — the inverse bridge
  * (grouping back to tiles) is what the tile ops avoid paying.
  */
object Pixels {

  /** Explode tiles to (item_idx, band, time_micros, y, x, value) rows.
    * `center=true` labels pixel centers (reference default); NaN pixels
    * are dropped (sparse semantics: absent row == nodata). */
  def toPixels(tiles: Dataset[Tile], spec: RasterSpec, chunk: Int,
               center: Boolean = true): DataFrame =
    toPixels(tiles, spec, chunk, chunk, center)

  def toPixels(tiles: Dataset[Tile], spec: RasterSpec, chunkY: Int, chunkX: Int,
               center: Boolean): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val xres = spec.xres; val yres = spec.yres
    val minx = spec.bounds.minx; val maxy = spec.bounds.maxy
    val off = if (center) 0.5 else 0.0
    tiles.flatMap { t =>
      val rows = new scala.collection.mutable.ArrayBuffer[(Int, String, Long, Double, Double, Double)]()
      var r = 0
      while (r < t.height) {
        val gr = t.yChunk * chunkY + t.rowOff + r
        val y = maxy - (gr + off) * yres
        var c = 0
        while (c < t.width) {
          val v = t.pixels(r * t.width + c)
          if (!v.isNaN) {
            val gc = t.xChunk * chunkX + t.colOff + c
            rows += ((t.itemIdx, t.band, t.timeMicros, y, minx + (gc + off) * xres, v))
          }
          c += 1
        }
        r += 1
      }
      rows
    }.toDF("item_idx", "band", "time_micros", "y", "x", "value")
  }
}
