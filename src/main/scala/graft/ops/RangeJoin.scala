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
}
