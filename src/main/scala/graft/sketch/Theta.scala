package graft.sketch

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Theta-sketch SET OPERATIONS over bottom-k (KMV) sketches — distinct
  * counts of unions, intersections, and differences of sets that were
  * sketched INDEPENDENTLY (Dasgupta, Lang, Rhodes, Thaler — the Apache
  * DataSketches theta family).
  *
  * Why it exists beside [[Kmv]]/[[Hll]]: those answer "how many
  * distinct" for ONE stream; governance questions about corpora are
  * relational — how many distinct n-grams/tokens/urls do shard A and
  * shard B SHARE, how many are unique to A — and re-scanning both
  * corpora per pair is the thing a 100 TB pipeline cannot afford. With
  * theta sketches each corpus is scanned ONCE into a k-long array; every
  * pairwise union/intersection/difference estimate is then pure
  * expression arithmetic over two KB-sized arrays (an n×m corpus grid
  * costs n sketches + n·m array ops, not n·m scans — the sketch-side
  * companion of [[graft.dedup.Dedup.contaminationMatrix]]'s exact
  * overlap census).
  *
  * Math (all exactly deterministic for the fixed [[Kmv.hash60]], so the
  * DuckDB oracle replays estimates bit-for-bit): each sketch is the
  * sorted bottom-k distinct hashes; θ = k-th smallest (or 2^60 when the
  * set had < k distinct values — the sketch is then EXACT). For two
  * sketches with θ_ab = min(θ_a, θ_b), every hash below θ_ab is a
  * uniform sample of A ∪ B at rate θ_ab/2^60, so
  * |A ∩ B| ≈ |{h ∈ a ∩ b : h < θ_ab}| · 2^60/θ_ab, and likewise for
  * difference; the union re-sketches the merged sample (falling back to
  * the standard (k−1)·2^60/h_k KMV estimator when it fills). Estimates
  * floor through double division — exact: counts ≤ k ≤ 2^11 keep
  * cnt·2^60 inside the 53-bit mantissa, and both engines divide the
  * same IEEE doubles.
  */
object Theta {

  /** θ domain bound: 2^60 (the [[Kmv.hash60]] hash space). */
  val ThetaMax: Long = 1L << 60

  private final class SketchAgg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], v: Long): Array[Long] =
      Kmv.insertBottomK(b, v, k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      b.foldLeft(a)((acc, v) => Kmv.insertBottomK(acc, v, k))
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Aggregate column: the sketch itself — sorted bottom-k distinct
    * hashes (feed [[Kmv.hash60]] of the raw value). Mergeable bounded
    * state: map-side partial aggregation reduces every task to ≤ k
    * longs before the shuffle. */
  def sketch(hashCol: Column, k: Int = 64): Column =
    udaf(new SketchAgg(k), Encoders.scalaLong)(hashCol)

  /** θ of a sketch array: its k-th smallest hash, or 2^60 when the set
    * had fewer than k distinct values (sketch exact). */
  def theta(sk: Column, k: Int): Column =
    when(size(sk) < k, lit(ThetaMax)).otherwise(element_at(sk, k))

  private def estimate(cnt: Column, th: Column): Column =
    floor(cnt.cast("double") * lit(math.pow(2.0, 60)) / th.cast("double"))
      .cast("long")

  /** Distinct-count estimate of one sketch (the [[Kmv]] estimator,
    * expression form). */
  def distinctEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) /
        element_at(sk, k).cast("double")).cast("long"))

  /** |A ∩ B| estimate from two independently built sketches. */
  def intersectEstimate(a: Column, b: Column, k: Int): Column = {
    val th = least(theta(a, k), theta(b, k))
    estimate(size(filter(array_intersect(a, b), h => h < th)), th)
  }

  /** |A ∖ B| estimate from two independently built sketches. */
  def diffEstimate(a: Column, b: Column, k: Int): Column = {
    val th = least(theta(a, k), theta(b, k))
    estimate(size(filter(array_except(a, b), h => h < th)), th)
  }

  /** |A ∪ B| estimate: re-sketch the merged below-θ sample; when it
    * fills past k, fall back to the standard KMV estimator on the
    * merged bottom-k. */
  def unionEstimate(a: Column, b: Column, k: Int): Column = {
    val th = least(theta(a, k), theta(b, k))
    val merged = array_sort(filter(array_union(a, b), h => h < th))
    when(size(merged) > k,
      floor(lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) /
        element_at(merged, k).cast("double")).cast("long"))
    .otherwise(estimate(size(merged), th))
  }
}
