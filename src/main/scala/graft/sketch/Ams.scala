package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AMS (Alon–Matias–Szegedy 1996) second-frequency-moment sketch.
  *
  * F2 = Σ_v f(v)² — the self-join size of the value column. Exact F2
  * needs the full frequency census; the AMS estimator needs `d` integer
  * counters TOTAL: counter j is z_j = Σ_rows σ_j(v), with σ_j(v) ∈
  * {−1, +1} a hash-derived sign, and each z_j² is an unbiased estimate
  * of F2. The committed estimate is the MEDIAN of the d squares
  * (median-of-estimates in place of the classic
  * median-of-means-of-independent-copies — one level, fixed d, fully
  * deterministic for the fixed hash so an independent engine replays
  * it bit-for-bit).
  *
  * Why it matters at 100 TB: F2 is the planner's self-join /
  * skew-density statistic (a skewed key census in one number). The
  * sketch is a map-side-combined `groupBy(j).sum(sign)` — the shuffle
  * carries d longs TOTAL regardless of corpus size, the same
  * bounded-state discipline as [[Kmv]]/[[Hll]]/[[CountMin]] (those
  * answer "how many distinct" / "how often does v occur"; this answers
  * "how concentrated is the whole distribution").
  *
  * Determinism: counter j's sign is bit j of the value's single
  * md5-derived 60-bit hash ([[Kmv.hash60]] — one digest per row for
  * all d counters), so DuckDB replays signs, counters, squares, and
  * the median pick exactly.
  */
object Ams {

  /** The d-counter sketch: (j, z) for j ∈ [0, d). One corpus scan,
    * map-side combined; d rows out. Counter j's sign is BIT j of the
    * value's single 60-bit hash — one digest per row however large d
    * is (the md5 bits are independent, the standard one-hash-many-bits
    * economy; d ≤ 60 keeps every counter on a distinct bit). At 100 TB
    * the digest is the scan's dominant per-row cost, so this is a d×
    * saving over hashing (j, v) pairs. */
  def f2Sketch(df: DataFrame, valueCol: Column, d: Int): DataFrame = {
    require(d >= 1 && d <= 60, s"need 1 <= d <= 60 (got $d)")
    val sign = lit(1L) - lit(2L) * pmod(expr("shiftright(__h, cast(__j as int))"), lit(2L))
    df.select(Kmv.hash60(valueCol).as("__h"))
      .select(col("__h"), explode(sequence(lit(0), lit(d - 1))).as("__j"))
      .select(col("__j").as("j"), sign.as("s"))
      .groupBy(col("j"))
      .agg(sum(col("s")).as("z"))
  }

  /** Median-of-squares estimate from a [[f2Sketch]] frame: one row
    * (est). Ties and even d resolve deterministically: squares are
    * ordered (z², j) and the ⌈d/2⌉-th is committed. Pure arithmetic on
    * a d-row frame — no data-sized work. */
  def f2Estimate(sketch: DataFrame, d: Int): DataFrame = {
    require(d >= 1, s"need d >= 1 (got $d)")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("z2"), col("j"))
    sketch.select(col("j"), (col("z") * col("z")).as("z2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === lit((d + 1) / 2))
      .select(col("z2").as("est"))
  }
}
