package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.scan.Tile

/** NaN-skipping per-pixel median over a tile group — the reference's
  * flagship reduction (`rgb.resample(time="MS").median("time")`,
  * `docs/basic.ipynb` cell 10). Exact (xarray-compatible linear
  * interpolation between the two middle order statistics).
  *
  * Buffer holds one growing value list per pixel. Group cardinality along
  * time is small (items per calendar period — typically < 100), so the
  * buffer is O(chunk_px × period_items); the shuffle is the same
  * partial/final aggregation shape as mean. For huge periods, switch to
  * the explode-pixels + `percentile` fallback (same result, more shuffle).
  */
final case class MedianBuf(values: Array[Array[Double]])

final class PixelMedianAgg(chunkH: Int, chunkW: Int)
    extends Aggregator[Tile, MedianBuf, Array[Double]] {
  private val n = chunkH * chunkW

  def zero: MedianBuf = MedianBuf(Array.fill(n)(Array.empty[Double]))

  def reduce(b: MedianBuf, t: Tile): MedianBuf = {
    var r = 0
    while (r < t.height) {
      val rowBase = (t.rowOff + r) * chunkW + t.colOff
      val srcBase = r * t.width
      var c = 0
      while (c < t.width) {
        val v = t.pixels(srcBase + c)
        if (!v.isNaN) {
          val pos = rowBase + c
          b.values(pos) = b.values(pos) :+ v
        }
        c += 1
      }
      r += 1
    }
    b
  }

  def merge(a: MedianBuf, b: MedianBuf): MedianBuf = {
    var i = 0
    while (i < n) {
      if (b.values(i).nonEmpty)
        a.values(i) = if (a.values(i).isEmpty) b.values(i) else a.values(i) ++ b.values(i)
      i += 1
    }
    a
  }

  def finish(b: MedianBuf): Array[Double] = {
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val vs = b.values(i)
      out(i) =
        if (vs.isEmpty) Double.NaN
        else {
          java.util.Arrays.sort(vs)
          val m = vs.length
          if (m % 2 == 1) vs(m / 2)
          else (vs(m / 2 - 1) + vs(m / 2)) / 2.0
        }
      i += 1
    }
    out
  }

  def bufferEncoder: Encoder[MedianBuf] = Encoders.product[MedianBuf]
  def outputEncoder: Encoder[Array[Double]] = ExprEncoders.doubleArray
}

object Median {
  /** Per-pixel median per calendar period, like [[Mosaic.temporalMean]]. */
  def temporal(tiles: Dataset[Tile], chunk: Int,
               truncMicros: Long => Long): Dataset[(Long, CompositeTile)] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val agg = new PixelMedianAgg(chunk, chunk).toColumn
    tiles
      .groupByKey(t => (truncMicros(t.timeMicros), t.band, t.yChunk, t.xChunk))
      .agg(agg.name("pixels"))
      .map { case ((period, band, yc, xc), px) =>
        (period, CompositeTile(band, yc, xc, chunk, chunk, px)) }
  }
}
