package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.scan.Tile

/** Incremental first-valid composite over a STREAM of scenes — the
  * streaming twin of [[graft.ops.Mosaic]] (the reference is batch-only;
  * this is the engine's §2.9 extension for the real-world shape where
  * STAC items arrive continuously and the composite must stay current).
  *
  * State per (band, yChunk, xChunk): the running pixel plane plus each
  * pixel's winning (timeMicros, itemIdx) key — the same argmax-by-time
  * semantics as `MosaicAgg`, so the final state is INDEPENDENT of scene
  * arrival order (late or out-of-order scenes commute). State size is
  * bounded: chunks × (8+8) bytes/px, regardless of stream length.
  * Emits one snapshot row per group per micro-batch (update mode);
  * `updates` strictly increases, so the row with the max `updates` per
  * group is the final composite.
  *
  * '''State eviction.''' The group universe is the FINITE output grid —
  * at most `bands × ceil(gridH/chunk) × ceil(gridW/chunk)` keys,
  * independent of stream length — so `NoTimeout` is correct by design:
  * the state IS the live composite, and evicting a chunk would silently
  * forget its pixels (the next scene would restart that chunk from
  * blank). Total state is therefore `groups × chunk² × 16` bytes,
  * sized up front, not by traffic. The one way to unbound it is an
  * unbounded BAND set (band is part of the key): bound bands upstream
  * (`tiles.filter($"band".isin(...))`) before streaming, exactly as a
  * batch mosaic would pick its bands. If a deployment truly needs
  * per-band retirement (e.g. rotating ephemeral bands), swap
  * `NoTimeout` for `ProcessingTimeTimeout` and re-emit a tombstone on
  * `gs.hasTimedOut` — but then downstream must treat a chunk's
  * disappearance as data loss, which is why it is not the default.
  */
object StreamMosaic {

  final case class Snapshot(band: String, yChunk: Int, xChunk: Int,
                            updates: Int, nValid: Int,
                            sumV: Long, posChk: Long)

  /** `pos_chk`/`sumV` quantize pixels with `.toLong` — exact for the
    * integer-valued composites the oracles use. `chunk` is the square
    * chunk edge; `gridW` the full grid width in pixels (for global
    * positions). */
  def apply(tiles: Dataset[Tile], chunk: Int, gridW: Int): Dataset[Snapshot] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.product[(Array[Double], Array[Long], Int)]
    tiles.groupByKey(t => (t.band, t.yChunk, t.xChunk))
      .mapGroupsWithState[(Array[Double], Array[Long], Int), Snapshot](
        GroupStateTimeout.NoTimeout) {
        (key: (String, Int, Int), it: Iterator[Tile],
         gs: GroupState[(Array[Double], Array[Long], Int)]) =>
          val n = chunk * chunk
          val (vals, win, updates0) = gs.getOption.getOrElse(
            (Array.fill(n)(Double.NaN), Array.fill(n)(Long.MinValue), 0))
          it.foreach { t =>
            var r = 0
            while (r < t.height) {
              var c = 0
              while (c < t.width) {
                val v = t.pixels(r * t.width + c)
                if (!v.isNaN) {
                  val pos = (t.rowOff + r) * chunk + t.colOff + c
                  // argmax by (timeMicros, itemIdx) — MosaicAgg's tiebreak
                  val k = t.timeMicros * 4096L + t.itemIdx
                  if (k > win(pos)) { vals(pos) = v; win(pos) = k }
                }
                c += 1
              }
              r += 1
            }
          }
          gs.update((vals, win, updates0 + 1))
          var nValid = 0; var sumV = 0L; var posChk = 0L
          var i = 0
          while (i < n) {
            val v = vals(i)
            if (!v.isNaN) {
              val gr = key._2 * chunk + i / chunk
              val gc = key._3 * chunk + i % chunk
              val q = v.toLong
              nValid += 1; sumV += q; posChk += q * (gr.toLong * gridW + gc)
            }
            i += 1
          }
          Snapshot(key._1, key._2, key._3, updates0 + 1, nValid, sumV, posChk)
      }
  }
}
