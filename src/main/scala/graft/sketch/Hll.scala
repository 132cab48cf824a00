package graft.sketch

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007), built
  * DETERMINISTIC so a SQL engine can replay it bit-for-bit — the same
  * discipline as [[Kmv]], trading the usual seeded-hash family for the
  * fixed 60-bit md5 hash ([[Kmv.hash60]]).
  *
  * Layout for precision `p` (m = 2^p registers over a w = 60−p bit
  * suffix): bucket = top p bits, rank = leading-zero count of the w-bit
  * suffix + 1 (suffix 0 ⇒ rank w+1). Register state is m BYTES,
  * mergeable by elementwise max — Spark runs it with map-side partial
  * aggregation, so the shuffle carries (groups × m) bytes however many
  * rows feed it; KMV carries k longs, HLL m bytes: at equal accuracy
  * (~1.04/√m vs ~1/√k) HLL's state is 8× smaller, which is why it is
  * the census sketch of choice for high-cardinality groupBys at 100 TB.
  *
  * The aggregator emits the two EXACT integers the estimator needs —
  * `s` = Σ_j 2^(w+1−M_j) (the harmonic-mean denominator scaled by
  * 2^(w+1), an exact BIGINT: every term is a nonnegative power of two,
  * so no float summation-order drift can enter the sketch itself) and
  * `zeros` = #{j : M_j = 0}. [[estimate]] turns them into the HLL
  * number with the standard small-range linear-counting correction;
  * the float work is a fixed-shape scalar expression on two integers,
  * identical in any IEEE engine (the large-range 2^32 correction is
  * moot at a 60-bit hash). Query `k2_hll_sketch` replays registers,
  * `s`, `zeros`, and the corrected estimate in DuckDB.
  */
object Hll {

  private final class HllAgg(p: Int)
      extends Aggregator[Long, Array[Byte], (Long, Long)] {
    private val m = 1 << p
    private val w = 60 - p

    override def zero: Array[Byte] = new Array[Byte](m)

    override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
      val bucket = (h >>> w).toInt
      val rest = h & ((1L << w) - 1)
      val rank =
        if (rest == 0L) w + 1
        else w + java.lang.Long.numberOfLeadingZeros(rest) - 63
      if (rank > b(bucket)) b(bucket) = rank.toByte
      b
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(b: Array[Byte]): (Long, Long) = {
      var s = 0L
      var zeros = 0L
      var i = 0
      while (i < m) {
        s += 1L << (w + 1 - b(i))
        if (b(i) == 0) zeros += 1
        i += 1
      }
      (s, zeros)
    }

    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  }

  /** Aggregate column: struct(`_1` = s, `_2` = zeros) of the HLL sketch
    * over [[Kmv.hash60]] values. */
  def sketch(hashCol: Column, p: Int = 8): Column = {
    require(p >= 4 && p <= 16, s"precision p=$p outside [4,16]")
    udaf(new HllAgg(p), Encoders.scalaLong)(hashCol)
  }

  /** Bias-corrected HLL estimate from the sketch struct: the classic
    * alpha_m·m²·2^(w+1)/s with linear counting below 2.5·m when empty
    * registers remain. Same fixed-shape double expression a SQL replay
    * writes. alpha_m follows Flajolet et al. 2007 fig. 3 exactly: the
    * small-m constants 0.673/0.697/0.709 for m = 16/32/64 (p = 4/5/6),
    * 0.7213/(1+1.079/m) for m ≥ 128 — the round-8 advice closed the
    * small-p bias that came from applying the large-m constant
    * everywhere. */
  def estimate(sketchCol: Column, p: Int = 8): Column = {
    val m = (1 << p).toDouble
    val pow = math.pow(2.0, 61 - p) // 2^(w+1), exact
    val alpha = p match {
      case 4 => lit(0.673)
      case 5 => lit(0.697)
      case 6 => lit(0.709)
      case _ => lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m))
    }
    val raw = alpha * lit(m) * lit(m) * lit(pow) /
      sketchCol.getField("_1").cast("double")
    val zeros = sketchCol.getField("_2")
    when(raw < lit(2.5) * lit(m) && zeros > 0,
      lit(m) * log(lit(m) / zeros.cast("double")))
      .otherwise(raw)
  }
}
