package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.scan.Tile

/** Result of flattening the time dimension of one (band, yChunk, xChunk)
  * group: a dense chunk rectangle. */
final case class CompositeTile(
    band: String, yChunk: Int, xChunk: Int, height: Int, width: Int,
    pixels: Array[Double])

final case class MosaicBuf(values: Array[Double], order: Array[Int])

/** First-valid-pixel composite over the time axis — the reference `mosaic`
  * (`stackstac/ops.py:156-224`).
  *
  * The reference scans layers last→first (or first→last when `reverse`)
  * and keeps the first valid pixel, short-circuiting when complete
  * (`ops.py:44-72`). That formulation is order-dependent; a Spark
  * `Aggregator` must be commutative, so we restate it order-independently:
  * "first valid scanning last→first" == "the valid sample with the
  * **largest** time order index" (smallest when `reverse`). The buffer
  * tracks, per pixel, the best order index seen — `reduce`/`merge` are
  * then elementwise max/min-by and Catalyst's partial aggregation *is* the
  * reference's tree reduction (`ops.py:87-153`).
  *
  * Like the reference dtype guard (`ops.py:202-208`) we only support NaN
  * nodata here; integer dtypes are represented as doubles in tiles.
  */
final class MosaicAgg(chunkH: Int, chunkW: Int, reverse: Boolean = false)
    extends Aggregator[Tile, MosaicBuf, Array[Double]] {

  private val n = chunkH * chunkW
  // Sentinel meaning "no valid sample yet".
  private val worst = if (reverse) Int.MaxValue else Int.MinValue
  private def better(a: Int, b: Int): Boolean = if (reverse) a < b else a > b

  def zero: MosaicBuf = MosaicBuf(Array.fill(n)(Double.NaN), Array.fill(n)(worst))

  def reduce(buf: MosaicBuf, t: Tile): MosaicBuf = {
    var r = 0
    while (r < t.height) {
      val rowBase = (t.rowOff + r) * chunkW + t.colOff
      val srcBase = r * t.width
      var c = 0
      while (c < t.width) {
        val v = t.pixels(srcBase + c)
        if (!v.isNaN) {
          val pos = rowBase + c
          if (buf.order(pos) == worst || better(t.itemIdx, buf.order(pos))) {
            buf.values(pos) = v
            buf.order(pos) = t.itemIdx
          }
        }
        c += 1
      }
      r += 1
    }
    buf
  }

  def merge(a: MosaicBuf, b: MosaicBuf): MosaicBuf = {
    var i = 0
    while (i < n) {
      if (b.order(i) != worst && (a.order(i) == worst || better(b.order(i), a.order(i)))) {
        a.values(i) = b.values(i)
        a.order(i) = b.order(i)
      }
      i += 1
    }
    a
  }

  def finish(buf: MosaicBuf): Array[Double] = buf.values
  def bufferEncoder: Encoder[MosaicBuf] = Encoders.product[MosaicBuf]
  def outputEncoder: Encoder[Array[Double]] = ExprEncoders.doubleArray
}

/** NaN-skipping per-pixel mean over a tile group — the engine side of
  * `arr.resample(time=...).mean()` (reference `README.md:55`,
  * `docs/basic.ipynb` cell 10). */
final case class MeanBuf(sum: Array[Double], count: Array[Long])

final class PixelMeanAgg(chunkH: Int, chunkW: Int)
    extends Aggregator[Tile, MeanBuf, Array[Double]] {
  private val n = chunkH * chunkW
  def zero: MeanBuf = MeanBuf(new Array[Double](n), new Array[Long](n))
  def reduce(b: MeanBuf, t: Tile): MeanBuf = {
    var r = 0
    while (r < t.height) {
      val rowBase = (t.rowOff + r) * chunkW + t.colOff
      val srcBase = r * t.width
      var c = 0
      while (c < t.width) {
        val v = t.pixels(srcBase + c)
        if (!v.isNaN) { b.sum(rowBase + c) += v; b.count(rowBase + c) += 1 }
        c += 1
      }
      r += 1
    }
    b
  }
  def merge(a: MeanBuf, b: MeanBuf): MeanBuf = {
    var i = 0
    while (i < n) { a.sum(i) += b.sum(i); a.count(i) += b.count(i); i += 1 }
    a
  }
  def finish(b: MeanBuf): Array[Double] = {
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = if (b.count(i) == 0) Double.NaN else b.sum(i) / b.count(i); i += 1 }
    out
  }
  def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
  def outputEncoder: Encoder[Array[Double]] = ExprEncoders.doubleArray
}

private[ops] object ExprEncoders {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val doubleArray: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

object Mosaic {
  /** Mosaic a tile Dataset over time, per (band, spatial chunk). Catalyst
    * plans the partial/final aggregation (the reference's hand-built
    * `da.reduction` tree, `ops.py:133-153`, comes for free). */
  def apply(tiles: Dataset[Tile], chunk: Int, reverse: Boolean = false): Dataset[CompositeTile] =
    apply(tiles, chunk, chunk, reverse)

  /** Rectangular-chunk form (edges from the [[graft.scan.Chunks]] grammar). */
  def apply(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
            reverse: Boolean): Dataset[CompositeTile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val agg = new MosaicAgg(chunkY, chunkX, reverse).toColumn
    tiles
      .groupByKey(t => (t.band, t.yChunk, t.xChunk))
      .agg(agg.name("pixels"))
      .map { case ((band, yc, xc), px) => CompositeTile(band, yc, xc, chunkY, chunkX, px) }
  }

  /** Per-pixel NaN-skipping mean per calendar period (epoch-truncated),
    * the engine half of W3 temporal resampling. `truncMicros` maps a
    * tile's timestamp to its period start. */
  def temporalMean(tiles: Dataset[Tile], chunk: Int,
                   truncMicros: Long => Long): Dataset[(Long, CompositeTile)] =
    temporalMean(tiles, chunk, chunk, truncMicros)

  def temporalMean(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
                   truncMicros: Long => Long): Dataset[(Long, CompositeTile)] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val agg = new PixelMeanAgg(chunkY, chunkX).toColumn
    tiles
      .groupByKey(t => (truncMicros(t.timeMicros), t.band, t.yChunk, t.xChunk))
      .agg(agg.name("pixels"))
      .map { case ((period, band, yc, xc), px) =>
        (period, CompositeTile(band, yc, xc, chunkY, chunkX, px)) }
  }
}
