package graft.ops

import org.apache.spark.sql.Dataset
import graft.scan.{Tile, TileScan}

/** Elementwise algebra over tiles — the engine side of xarray band math
  * like NDVI (`(nir - red) / (nir + red)`, reference `README.md:52-53`).
  * Binary ops are the J5 self-join of SURVEY §2.3: align two
  * band-selections on (time item, spatial chunk) and zip their pixels.
  */
object TileAlgebra {

  /** Unary per-pixel map (NaN propagates through `f` naturally). */
  def mapPixels(ds: Dataset[Tile])(f: Double => Double): Dataset[Tile] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map { t =>
      val out = new Array[Double](t.pixels.length)
      var i = 0
      while (i < out.length) { out(i) = f(t.pixels(i)); i += 1 }
      t.copy(pixels = out)
    }
  }

  /** Binary per-pixel combine of two single-band tile sets, aligned on
    * (itemIdx, yChunk, xChunk). Sparse alignment: a pixel missing on
    * either side is NaN (matches xarray NaN propagation). Inner join is
    * correct for arithmetic because NaN op anything = NaN — absent tiles
    * would yield all-NaN tiles, which the sparse representation elides
    * anyway (R4).
    */
  def binary(a: Dataset[Tile], b: Dataset[Tile], chunk: Int, outBand: String)
            (f: (Double, Double) => Double): Dataset[Tile] =
    binary(a, b, chunk, chunk, outBand)(f)

  def binary(a: Dataset[Tile], b: Dataset[Tile], chunkY: Int, chunkX: Int,
             outBand: String)
            (f: (Double, Double) => Double): Dataset[Tile] = {
    val spark = a.sparkSession
    import spark.implicits._
    a.joinWith(b,
        a("itemIdx") === b("itemIdx") &&
        a("yChunk") === b("yChunk") && a("xChunk") === b("xChunk"),
        "inner")
      .map { case (ta, tb) =>
        val da = TileScan.densify(ta, chunkY, chunkX)
        val db = TileScan.densify(tb, chunkY, chunkX)
        val out = new Array[Double](da.length)
        var i = 0
        while (i < out.length) { out(i) = f(da(i), db(i)); i += 1 }
        Tile(ta.itemIdx, -1, outBand, ta.timeMicros, ta.yChunk, ta.xChunk,
             0, 0, chunkY, chunkX, out)
      }
  }

  /** NDVI: the canonical band-math query (reference `README.md:53`). */
  def ndvi(nir: Dataset[Tile], red: Dataset[Tile], chunk: Int): Dataset[Tile] =
    binary(nir, red, chunk, "ndvi")((n, r) => (n - r) / (n + r))
}
