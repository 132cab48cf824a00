package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.scan.Tile

/** NaN-skipping per-pixel median over a tile group — the reference's
  * flagship reduction (`rgb.resample(time="MS").median("time")`,
  * `docs/basic.ipynb` cell 10). Exact (xarray-compatible linear
  * interpolation between the two middle order statistics).
  *
  * Buffer holds one growing value list per pixel (capacity-doubling with
  * an explicit fill count — amortized O(1) per sample, never the O(k²)
  * reallocation an immutable append would cost). Group cardinality along
  * time is small (items per calendar period — typically < 100), so the
  * buffer is O(chunk_px × period_items); the shuffle is the same
  * partial/final aggregation shape as mean. For huge periods, switch to
  * the explode-pixels + `percentile` fallback (same result, more shuffle).
  */
final case class MedianBuf(values: Array[Array[Double]], counts: Array[Int])

final class PixelMedianAgg(chunkH: Int, chunkW: Int)
    extends Aggregator[Tile, MedianBuf, Array[Double]] {
  private val n = chunkH * chunkW

  def zero: MedianBuf = MedianBuf(Array.fill(n)(Array.empty[Double]), new Array[Int](n))

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
          var arr = b.values(pos)
          val cnt = b.counts(pos)
          if (cnt == arr.length) { // grow: double, min 4
            val na = new Array[Double](math.max(4, arr.length * 2))
            System.arraycopy(arr, 0, na, 0, cnt)
            arr = na; b.values(pos) = na
          }
          arr(cnt) = v
          b.counts(pos) = cnt + 1
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
      val bc = b.counts(i)
      if (bc > 0) {
        val ac = a.counts(i)
        if (ac == 0) { a.values(i) = b.values(i); a.counts(i) = bc }
        else { // exact-size combine (merge happens once per shuffle hop)
          val na = new Array[Double](ac + bc)
          System.arraycopy(a.values(i), 0, na, 0, ac)
          System.arraycopy(b.values(i), 0, na, ac, bc)
          a.values(i) = na; a.counts(i) = ac + bc
        }
      }
      i += 1
    }
    a
  }

  def finish(b: MedianBuf): Array[Double] = {
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val vs = b.values(i); val m = b.counts(i)
      out(i) =
        if (m == 0) Double.NaN
        else {
          java.util.Arrays.sort(vs, 0, m)
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

/** Per-pixel arbitrary quantile over a tile group — xarray's
  * `.quantile(q, dim="time")` with linear interpolation between order
  * statistics (same convention as numpy's default). Shares the growable
  * per-pixel buffer shape with [[PixelMedianAgg]]. */
final class PixelQuantileAgg(chunkH: Int, chunkW: Int, q: Double)
    extends Aggregator[Tile, MedianBuf, Array[Double]] {
  require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0,1]")
  private val inner = new PixelMedianAgg(chunkH, chunkW)
  private val n = chunkH * chunkW

  def zero: MedianBuf = inner.zero
  def reduce(b: MedianBuf, t: Tile): MedianBuf = inner.reduce(b, t)
  def merge(a: MedianBuf, b: MedianBuf): MedianBuf = inner.merge(a, b)

  def finish(b: MedianBuf): Array[Double] = {
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val vs = b.values(i); val m = b.counts(i)
      out(i) =
        if (m == 0) Double.NaN
        else {
          java.util.Arrays.sort(vs, 0, m)
          val pos = (m - 1) * q
          val lo = math.floor(pos).toInt
          val hi = math.ceil(pos).toInt
          if (lo == hi) vs(lo)
          else vs(lo) + (vs(hi) - vs(lo)) * (pos - lo)
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
               truncMicros: Long => Long): Dataset[(Long, CompositeTile)] =
    temporal(tiles, chunk, chunk, truncMicros)

  /** Per-pixel q-quantile per calendar period (xarray `.quantile`). */
  def temporalQuantile(tiles: Dataset[Tile], chunk: Int, q: Double,
                       truncMicros: Long => Long): Dataset[(Long, CompositeTile)] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val agg = new PixelQuantileAgg(chunk, chunk, q).toColumn
    tiles
      .groupByKey(t => (truncMicros(t.timeMicros), t.band, t.yChunk, t.xChunk))
      .agg(agg.name("pixels"))
      .map { case ((period, band, yc, xc), px) =>
        (period, CompositeTile(band, yc, xc, chunk, chunk, px)) }
  }

  def temporal(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
               truncMicros: Long => Long): Dataset[(Long, CompositeTile)] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val agg = new PixelMedianAgg(chunkY, chunkX).toColumn
    tiles
      .groupByKey(t => (truncMicros(t.timeMicros), t.band, t.yChunk, t.xChunk))
      .agg(agg.name("pixels"))
      .map { case ((period, band, yc, xc), px) =>
        (period, CompositeTile(band, yc, xc, chunkY, chunkX, px)) }
  }
}
