package graft.sketch

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** t-digest quantile sketch (Dunning & Ertl, "Computing extremely
  * accurate quantiles using t-digests") — the MERGEABLE percentile the
  * serving layer's range scan wants at 100 TB (the reference's
  * `show.py:493` TODO: its viz range is an exact percentile over a
  * collect; a digest makes it one map-side-combined pass): each task
  * folds its rows into a bounded centroid list, the shuffle carries
  * (groups × O(δ)) doubles, and merged digests answer any quantile.
  *
  * Scale function: k₁(q) = δ/2π·asin(2q−1) — tail-biased capacity, so
  * relative accuracy is best exactly where viz ranges and p99 gates
  * read it. Size bound: a compressed digest holds < 2δ centroids
  * regardless of input size. Accuracy: rank error is O(1/δ) at the
  * median and tighter toward the tails — δ=200 keeps observed error
  * well under 1% rank, an order inside the 2.5% gate the spec and a11's
  * oracle assert.
  *
  * DETERMINISM, stated honestly: unlike KMV/HLL/CountMin, a t-digest's
  * centroid means depend on merge ORDER, which Spark does not fix — so
  * the raw digest is NOT hash-stable across parallelism. Consumers gate
  * on its GUARANTEED property instead: the a11 oracle query verifies
  * each estimate's exact rank against the data inside the query and
  * hashes the boolean verdicts plus coarse rank buckets, which are
  * merge-order-invariant by the accuracy bound. Queries needing exact,
  * engine-replayable quantiles keep a7's exact percentile; the digest
  * is the single-pass path when the corpus no longer fits one. */
object TDigest {

  /** Compress a flattened (mean, weight) pair array to the k₁-scale
    * capacity bound. Deterministic for a fixed input multiset: sorts by
    * (mean, weight) first. */
  private[sketch] def compress(buf: Array[Double], delta: Double): Array[Double] = {
    val n = buf.length / 2
    if (n <= 1) return buf
    val idx = Array.range(0, n).sortBy(i => (buf(2 * i), buf(2 * i + 1)))
    var total = 0.0
    idx.foreach(i => total += buf(2 * i + 1))
    def kFn(q: Double): Double = {
      val qq = math.min(1.0, math.max(0.0, q))
      delta / (2.0 * math.Pi) * math.asin(2.0 * qq - 1.0)
    }
    val out = new scala.collection.mutable.ArrayBuffer[Double](2 * n)
    var curM = buf(2 * idx(0)); var curW = buf(2 * idx(0) + 1)
    var cumBefore = 0.0
    var i = 1
    while (i < n) {
      val m = buf(2 * idx(i)); val w = buf(2 * idx(i) + 1)
      if (kFn((cumBefore + curW + w) / total) - kFn(cumBefore / total) <= 1.0) {
        val nw = curW + w
        curM += (m - curM) * w / nw
        curW = nw
      } else {
        out += curM; out += curW
        cumBefore += curW
        curM = m; curW = w
      }
      i += 1
    }
    out += curM; out += curW
    out.toArray
  }

  /** Quantile estimate from a COMPRESSED digest: linear interpolation
    * between adjacent centroid means at their cumulative-weight
    * midpoints (the standard t-digest read), exact min/max behavior at
    * the extremes of the centroid list. */
  def quantile(digest: Array[Double], q: Double): Double = {
    val n = digest.length / 2
    require(n > 0, "TDigest.quantile: empty digest")
    var total = 0.0
    var i = 0
    while (i < n) { total += digest(2 * i + 1); i += 1 }
    val target = q * total
    var cum = 0.0
    i = 0
    while (i < n) {
      val w = digest(2 * i + 1)
      val mid = cum + w / 2.0
      if (target <= mid) {
        if (i == 0) return digest(0)
        val pw = digest(2 * (i - 1) + 1)
        val pmid = cum - pw / 2.0
        val f = if (mid == pmid) 0.0 else (target - pmid) / (mid - pmid)
        return digest(2 * (i - 1)) + f * (digest(2 * i) - digest(2 * (i - 1)))
      }
      cum += w
      i += 1
    }
    digest(2 * (n - 1))
  }

  /** Merge two compressed digests (storage-side use: per-shard digests
    * folded into a corpus digest). */
  def merge(a: Array[Double], b: Array[Double], delta: Double = 200.0): Array[Double] =
    compress(a ++ b, delta)

  private final class TDigestAgg(delta: Double, bufCap: Int)
      extends Aggregator[Double, TDigestBuf, Array[Double]] {
    override def zero: TDigestBuf = TDigestBuf(Array.emptyDoubleArray, 0)

    /** Capacity-doubling append with an explicit fill cursor (the
      * `PixelMedianAgg` discipline, `ops/Median.scala`): amortized O(1)
      * per row — never the per-row `Arrays.copyOf` an immutable append
      * costs. At the bufCap boundary the pairs compress in place,
      * reusing the capacity array so growth never re-doubles. */
    override def reduce(b: TDigestBuf, v: Double): TDigestBuf = {
      var arr = b.buf
      val fill = b.fill
      if (fill + 2 > arr.length) { // grow: double, min 16 doubles
        val na = new Array[Double](math.max(16, arr.length * 2))
        System.arraycopy(arr, 0, na, 0, fill)
        arr = na
      }
      arr(fill) = v
      arr(fill + 1) = 1.0
      if ((fill + 2) / 2 > bufCap) {
        val compressed = compress(java.util.Arrays.copyOf(arr, fill + 2), delta)
        System.arraycopy(compressed, 0, arr, 0, compressed.length)
        TDigestBuf(arr, compressed.length)
      } else TDigestBuf(arr, fill + 2)
    }

    override def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = {
      val merged = new Array[Double](a.fill + b.fill)
      System.arraycopy(a.buf, 0, merged, 0, a.fill)
      System.arraycopy(b.buf, 0, merged, a.fill, b.fill)
      val compressed = compress(merged, delta)
      TDigestBuf(compressed, compressed.length)
    }

    override def finish(b: TDigestBuf): Array[Double] =
      compress(java.util.Arrays.copyOf(b.buf, b.fill), delta)

    override def bufferEncoder: Encoder[TDigestBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[TDigestBuf]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Digest column aggregator: `df.agg(TDigest.digest(col("x")))` →
    * flattened (mean, weight) pairs. Map-side combined like every
    * Aggregator — the shuffle carries O(δ) doubles per group. */
  def digest(c: Column, delta: Double = 200.0, bufCap: Int = 512): Column =
    udaf(new TDigestAgg(delta, bufCap), Encoders.scalaDouble)(c)
}

/** Map-side accumulation buffer: flattened (mean, weight) pairs in a
  * capacity-doubling array with an explicit fill cursor — only
  * `buf(0 until fill)` is live; the slack beyond the cursor is
  * uninitialized capacity. Both fill and capacity are bounded by
  * ~2·bufCap doubles (the bufCap-boundary compress in `reduce` keeps
  * fill small and reuses the array), so a serialized partial buffer is
  * at most ~2·bufCap doubles per group — same order as before. */
final case class TDigestBuf(buf: Array[Double], fill: Int)
