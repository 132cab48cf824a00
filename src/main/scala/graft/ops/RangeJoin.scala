package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-×-large PURE range (interval) join via time bucketing — the
  * join shape Spark has no native scalable plan for: a condition that
  * is ONLY a range (`r.ts BETWEEN l.ts + lower AND l.ts + upper`, no
  * equi-key) plans as BroadcastNestedLoopJoin — a driver-killing
  * broadcast of one full side — or, with broadcast disabled, a
  * cartesian product. (With an equi-key present Spark already does the
  * right thing: equi-join + range as post-filter; `j3` covers the
  * small-dim broadcast case and [[AsOfJoin]] the nearest-match case.
  * This operator is for the remaining cell: both sides data-scale, no
  * shared key.)
  *
  * The standard fix is BINNING: bucket the time axis at `bucketSec`;
  * each right row owns one bucket (a map-side projection), each left
  * row explodes to the ⌈(upper−lower)/bucket⌉+1 buckets its window can
  * touch, and the join becomes a SHUFFLED EQUI-JOIN on bucket id with
  * the exact range predicate as a post-filter. Shuffle volume is
  * |L|·spanBuckets + |R| rows; per-bucket work is |L∩bucket|·|R∩bucket|
  * — the join's true candidate count, with task granularity = one
  * bucket (size `bucketSec` near the window span keeps the explode
  * factor ≤ 2 while keeping buckets fine enough to parallelize; AQE
  * splits hot buckets). Optional `keys` tighten the join key to
  * (keys, bucket).
  *
  * Exact integer arithmetic throughout (micros, pmod floor-division) —
  * engine-replayable; bounds are INCLUSIVE on both ends (SQL BETWEEN).
  * Returns left.*, right.* for every qualifying pair; non-key column
  * names must be disjoint.
  */
object RangeJoin {

  /** True floor division for micros (pmod is non-negative). */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))) / w).cast("long")

  def byBuckets(left: DataFrame, right: DataFrame,
                tsLeft: Column, tsRight: Column,
                lowerSec: Long, upperSec: Long, bucketSec: Long,
                keys: Seq[String] = Nil): DataFrame = {
    require(lowerSec <= upperSec, s"need lowerSec <= upperSec (got $lowerSec > $upperSec)")
    require(bucketSec > 0, s"bucketSec must be positive (got $bucketSec)")
    val spanBuckets = (upperSec - lowerSec) / bucketSec + 2
    require(spanBuckets <= 64,
      s"window spans up to $spanBuckets buckets — raise bucketSec (explode factor must stay small)")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.subsetOf(keys.toSet),
      s"non-key columns shared by both sides: ${(overlap -- keys).mkString(", ")} — rename them")
    require(!left.columns.contains("__bkt") && !right.columns.contains("__bkt"),
      "__bkt is a reserved scratch column name")
    val w = bucketSec * 1000000L
    val lm = unix_micros(tsLeft)
    val rm = unix_micros(tsRight)
    val lx = left.withColumn("__bkt",
      explode(sequence(floorDiv(lm + lowerSec * 1000000L, w),
                       floorDiv(lm + upperSec * 1000000L, w))))
    val rx = right.withColumn("__bkt", floorDiv(rm, w))
    lx.join(rx, ("__bkt" +: keys).toSeq)
      .filter(rm.between(lm + lowerSec * 1000000L, lm + upperSec * 1000000L))
      .drop("__bkt")
  }

  /** Interval × interval OVERLAP join — the remaining range-join cell
    * after [[byBuckets]] (point-in-window): BOTH sides are intervals
    * and a pair qualifies iff they intersect (`l.start ≤ r.end AND
    * r.start ≤ l.end`, inclusive ends — concurrent sessions,
    * incident-to-maintenance correlation, co-occurring spans). Naive
    * Spark plans this as BNLJ/cartesian exactly like the point case.
    *
    * Both sides explode to every bucket their interval covers (explode
    * factor = interval length in buckets — guarded per row at ≤
    * `maxSpanBuckets` by a pre-explode raise_error, ONE comparison per
    * input row, not per element: the v10 lesson about hot-loop guards).
    * An overlapping pair shares every bucket of the overlap, so it
    * would meet once PER shared bucket; the responsibility rule —
    * emit only in the bucket containing `max(l.start, r.start)`, the
    * overlap's left edge, unique per pair and covered by both sides —
    * makes each pair surface EXACTLY once with no post-dedup pass.
    * Shuffle volume is Σ interval-lengths in buckets; per-bucket work
    * is the true concurrent-pair count; AQE splits hot buckets.
    * Returns left.* ++ right.* ++ `overlap_us`. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: Column, lEnd: Column,
                      rStart: Column, rEnd: Column,
                      bucketSec: Long, maxSpanBuckets: Int = 64,
                      keys: Seq[String] = Nil): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive (got $bucketSec)")
    require(maxSpanBuckets >= 1, s"maxSpanBuckets must be >= 1 (got $maxSpanBuckets)")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.subsetOf(keys.toSet),
      s"non-key columns shared by both sides: ${(overlap -- keys).mkString(", ")} — rename them")
    require(!left.columns.contains("__bkt") && !right.columns.contains("__bkt"),
      "__bkt is a reserved scratch column name")
    val w = bucketSec * 1000000L
    val ls = unix_micros(lStart); val le = unix_micros(lEnd)
    val rs = unix_micros(rStart); val re = unix_micros(rEnd)
    def spanGuarded(s: Column, e: Column, side: String): Column = {
      val span = floorDiv(e, w) - floorDiv(s, w)
      when(e < s, raise_error(lit(s"$side interval has end < start")))
        .when(span > maxSpanBuckets, raise_error(concat(
          lit(s"$side interval spans "), span,
          lit(s" buckets > maxSpanBuckets=$maxSpanBuckets — raise bucketSec"))))
        .otherwise(sequence(floorDiv(s, w), floorDiv(e, w)))
    }
    val lx = left.withColumn("__bkt", explode(spanGuarded(ls, le, "left")))
    val rx = right.withColumn("__bkt", explode(spanGuarded(rs, re, "right")))
    lx.join(rx, ("__bkt" +: keys).toSeq)
      .filter(ls <= re && rs <= le)
      .filter(col("__bkt") === floorDiv(greatest(ls, rs), w))
      .withColumn("overlap_us", least(le, re) - greatest(ls, rs))
      .drop("__bkt")
  }
}
