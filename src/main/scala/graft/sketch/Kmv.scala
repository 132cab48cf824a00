package graft.sketch

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV / bottom-k) distinct-count sketch.
  *
  * Keeps the k smallest distinct 60-bit hashes of the values seen; the
  * k-th smallest hash h_k estimates the distinct count as
  * `(k-1) * 2^60 / h_k` (Bar-Yossef et al., "Counting distinct elements
  * in a data stream", RANDOM 2002). Unlike HyperLogLog the estimator is
  * exactly deterministic for a fixed hash — which lets the DuckDB oracle
  * reproduce it bit-for-bit — and the sketch is a mergeable bounded
  * state (k longs), so Spark runs it with map-side partial aggregation:
  * each task reduces its rows to ≤k hashes before the shuffle, and the
  * reducer merges per-task sketches. No global distinct, no sort, no
  * window — at 100 TB the shuffle carries (groups × k) longs only.
  */
object Kmv {

  /** 60-bit md5-derived hash, identical in DuckDB:
    * `('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Insert a hash into a sorted bottom-k array (no-op on duplicates or
    * values above the current k-th smallest). Shared by the estimate
    * aggregator and [[Theta]]'s sketch-array aggregator. */
  private[sketch] def insertBottomK(b: Array[Long], v: Long, k: Int): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, v)
    if (pos >= 0) b // duplicate hash
    else if (b.length < k) {
      val ins = -pos - 1
      val out = new Array[Long](b.length + 1)
      System.arraycopy(b, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(b, ins, out, ins + 1, b.length - ins)
      out
    } else if (v < b(k - 1)) {
      val ins = -pos - 1
      val out = new Array[Long](k)
      System.arraycopy(b, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(b, ins, out, ins + 1, k - 1 - ins)
      out
    } else b
  }

  /** Sorted array of the ≤k smallest DISTINCT hash values. */
  private final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Long] {
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], v: Long): Array[Long] = insertBottomK(b, v, k)

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      b.foldLeft(a)((acc, v) => insertBottomK(acc, v, k))

    override def finish(b: Array[Long]): Long =
      if (b.length < k) b.length.toLong
      else math.floor((k - 1).toDouble * math.pow(2.0, 60) / b(k - 1).toDouble).toLong

    override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Aggregate column: distinct-count estimate of the 60-bit hashes fed
    * in (use [[hash60]] on the raw value). Exact when the group has
    * fewer than k distinct values. */
  def distinctEstimate(hashCol: Column, k: Int = 64): Column =
    udaf(new KmvAgg(k), Encoders.scalaLong)(hashCol)
}
