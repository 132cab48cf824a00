package graft.ops

import org.apache.spark.sql.Dataset
import graft.scan.Tile

/** GLOBAL histogram equalization (the classic contrast stretch of
  * image processing; `gdal_translate`-adjacent, and the global cousin
  * of the per-viewport percentile range in [[graft.viz.TileServer]]):
  * every pixel is remapped through the corpus-wide CDF of pixel VALUES
  * so the output histogram is as flat as the value multiset allows.
  *
  * Exact-integer contract: out(v) = (cdf(v) − cdf_min) · (levels−1)
  * div (N − cdf_min), all in BIGINT (truncating division — identical
  * in any engine for the non-negative operands the formula produces),
  * where cdf(v) counts pixels with value ≤ v, cdf_min = cdf(min value)
  * and N = total valid pixels. NaN rides NaN. A constant raster
  * (N = cdf_min) degenerates to all-zeros by definition here.
  *
  * Scale shape — the TWO-PASS BROADCAST-REMAP pattern: pass 1 is a
  * map-side-combined value census (shuffle = distinct values, not
  * pixels); the CDF is then a MODEL-sized table (one row per distinct
  * value) that moves driver→executors as a broadcast lookup, and pass 2
  * remaps every tile locally — zero pixel shuffle end to end. The
  * census being model-sized is a PRECONDITION, not a hope: a
  * continuous-valued raster would blow it up, so `maxDistinct` guards
  * loudly (quantize upstream — equalization is defined on discrete
  * levels anyway) — the driver-held-state discipline of the kmeans/
  * vocabulary ops. */
object Equalize {

  def histEq(tiles: Dataset[Tile], levels: Int = 256,
             maxDistinct: Int = 65536): Dataset[Tile] = {
    require(levels >= 2, s"Equalize: levels=$levels")
    val spark = tiles.sparkSession
    import spark.implicits._
    // -0.0 normalizes to 0.0 BEFORE grouping (Spark group keys already
    // do this) so the remap lookup below can't miss on a -0.0 pixel.
    val censusDs = tiles
      .flatMap(_.pixels.iterator.filterNot(_.isNaN)
        .map(v => if (v == 0.0) 0.0 else v))
      .groupByKey(identity).count()
    // Bound the fetch BEFORE collecting: a continuous-valued raster has
    // a pixel-scale census, and the guard must fire without ever
    // materializing it on the driver (the ann/Ann.scala limit-then-check
    // pattern). limit(maxDistinct + 1) returns the WHOLE census when it
    // fits, and exactly one surplus row when it doesn't.
    val census = censusDs.limit(maxDistinct + 1).collect()
    if (census.length > maxDistinct) throw new IllegalStateException(
      s"Equalize: > $maxDistinct distinct pixel values — the CDF table " +
      "must stay model-sized to broadcast; quantize the raster upstream.")
    val sorted = census.sortBy(_._1)
    val n = sorted.iterator.map(_._2).sum
    if (n == 0) return tiles // all-NaN input: nothing to remap
    val cdfMin = sorted.head._2
    var cum = 0L
    val mapped = sorted.map { case (v, c) =>
      cum += c
      val eq = if (n == cdfMin) 0L
        else (cum - cdfMin) * (levels - 1) / (n - cdfMin)
      v -> eq.toDouble
    }.toMap
    val bc = spark.sparkContext.broadcast(mapped)
    tiles.map { t =>
      val out = new Array[Double](t.pixels.length)
      var i = 0
      while (i < out.length) {
        val v = t.pixels(i)
        // mirror the census-side -0.0 normalization, and fail loudly
        // (with the value) on any other miss rather than a bare NSEE
        out(i) =
          if (v.isNaN) Double.NaN
          else bc.value.getOrElse(if (v == 0.0) 0.0 else v,
            throw new IllegalStateException(
              s"Equalize: pixel value $v missing from the CDF census"))
        i += 1
      }
      t.copy(pixels = out)
    }
  }
}
