package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter (Bloom 1970) — set-membership with bounded state and
  * one-sided error: k hash positions per value over an m-bit array;
  * a probe is "maybe present" iff ALL k bits are set (false-positive
  * rate ≈ (1 − e^(−kn/m))^k, never a false negative).
  *
  * Built RELATIONALLY, not as a UDAF (the [[CountMin]] discipline): the
  * bit array is literally `groupBy(word).agg(bit_or(1 << bit))` over
  * the (value × k positions) explosion — map-side combined, the shuffle
  * carries ≤ ⌈m/63⌉ rows no matter the input size, and the "sketch" is
  * a word-table DataFrame any engine replays (positions are the
  * [[Kmv.hash60]] md5 construction). Words hold 63 BITS, not 64: the
  * sign bit never participates, so `1 << bit` can't overflow in ANY
  * engine's checked BIGINT shift and the word values compare equal
  * everywhere — one wasted bit per word buys exact cross-engine replay.
  *
  * Probing is map-side: the dense word array (model-sized — m = 2²⁰
  * bits is ~17k longs) rides the plan as a literal, and membership is k
  * bit-tests per row with ZERO joins — the 100 TB shape: build once
  * over the blocklist/benchmark/seen-set (its size doesn't matter, the
  * sketch is m bits), then prune a corpus-sized scan before any
  * exact/expensive pass (decontamination grams, seen-URL dedup, join
  * pruning). */
object Bloom {

  /** Bits per word: 63, keeping the sign bit out of every engine's
    * shift/OR/compare path. */
  val BitsPerWord = 63

  private def position(valueCol: Column, j: Int, m: Int): Column =
    pmod(Kmv.hash60(concat(lit(s"$j|"), valueCol.cast("string"))), lit(m.toLong))

  /** The word table: (word_idx, word), ≤ ⌈m/63⌉ rows — one pass,
    * map-side combined, replayable by any SQL engine. */
  def table(df: DataFrame, valueCol: Column, m: Int, k: Int): DataFrame = {
    require(m >= BitsPerWord && k >= 1, s"need m >= 63, k >= 1 (got m=$m, k=$k)")
    df.select(explode(array((0 until k).map(j =>
        position(valueCol, j, m)): _*)).as("pos"))
      .select(floor(col("pos") / BitsPerWord).cast("long").as("word_idx"),
              pmod(col("pos"), lit(BitsPerWord.toLong)).cast("int").as("bit"))
      .groupBy(col("word_idx"))
      .agg(bit_or(call_function("shiftleft", lit(1L), col("bit"))).as("word"))
  }

  /** Densify the word table to the driver-side model literal the probe
    * path embeds: index w of the result is word w's bits (absent words
    * are 0). Guarded — the array is the SKETCH, sized by m alone. */
  def words(bloom: DataFrame, m: Int, maxWords: Int = 1 << 22): Array[Long] = {
    val n = (m + BitsPerWord - 1) / BitsPerWord
    require(n <= maxWords,
      s"Bloom.words: m=$m needs $n words > maxWords=$maxWords — a bloom " +
      "array is a model literal by contract; shrink m or raise maxWords.")
    val out = new Array[Long](n)
    bloom.select(col("word_idx"), col("word")).collect().foreach { r =>
      out(r.getLong(0).toInt) = r.getLong(1)
    }
    out
  }

  /** Map-side membership: k bit-tests against the embedded word array,
    * no join, no shuffle — true = maybe present, false = DEFINITELY
    * absent (the side that prunes). */
  def mightContain(valueCol: Column, words: Seq[Long], m: Int, k: Int): Column = {
    require(k >= 1 && words.nonEmpty)
    val wl = lit(words.toArray)
    (0 until k).map { j =>
      val pos = position(valueCol, j, m)
      val bit = pmod(pos, lit(BitsPerWord.toLong)).cast("int")
      val widx = floor(pos / BitsPerWord).cast("int")
      (element_at(wl, widx + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), bit)) =!= lit(0L))
    }.reduce(_ && _)
  }
}
