package graft

import org.apache.spark.sql.functions._
import graft.sketch.CountMin

/** Count-min: the over-count guarantee under forced collisions, exact
  * recovery when collision-free, bounded table size, parallelism
  * invariance, and map-side partial aggregation in the build plan. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val words = {
    val vocab = (0 until 200).map(i => s"w$i")
    // zipf-ish: w_i appears 200-i times
    vocab.zipWithIndex.flatMap { case (w, i) => Seq.fill(200 - i)(w) }
  }
  private lazy val df = words.toDF("v").cache()

  test("every estimate over-counts under forced collisions; min across rows tightens") {
    val exact = words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    val probes = exact.keys.toSeq.toDF("v")
    // w=16 over 200 distinct values: collisions guaranteed
    val cm = CountMin.table(df, $"v", d = 4, w = 16)
    assert(cm.count() <= 4L * 16L, "counter table must stay within d*w rows")
    val est = CountMin.estimate(cm, probes, $"v", d = 4, w = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (w, c) =>
      assert(est(w) >= c, s"$w: est ${est(w)} under-counts exact $c")
    }
    assert(exact.exists { case (w, c) => est(w) > c },
      "w=16 over 200 keys must produce at least one strict over-count")
    // a single-row sketch (d=1) can only be looser or equal
    val est1 = CountMin.estimate(CountMin.table(df, $"v", d = 1, w = 16),
        probes, $"v", d = 1, w = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.keys.foreach { w =>
      assert(est1(w) >= est(w), s"$w: d=4 min ${est(w)} looser than d=1 ${est1(w)}")
    }
  }

  test("collision-free width recovers exact counts; absent probes read 0") {
    val exact = words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    val probes = (exact.keys.toSeq :+ "never_seen").toDF("v")
    val est = CountMin.estimate(CountMin.table(df, $"v", d = 4, w = 65536),
        probes, $"v", d = 4, w = 65536)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (w, c) => assert(est(w) === c, s"$w: ${est(w)} != $c") }
    assert(est("never_seen") === 0L)
  }

  test("parallelism-invariant; build plan partial-aggregates map-side") {
    def run(parts: Int) =
      CountMin.table(df.repartition(parts), $"v", d = 4, w = 16)
        .orderBy("row", "bucket").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(1) === run(13))
    val plan = CountMin.table(df, $"v", d = 4, w = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"counter build must map-side combine:\n$plan")
  }

  test("heavy hitters: lossless prefilter (no false negatives), exact output") {
    val exact = words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    val expect = exact.filter(_._2 >= 150L)
    // collision-heavy width: prefilter is loose but must still be lossless
    val hh = CountMin.heavyHitters(df, $"v", d = 4, w = 16, threshold = 150L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.map(t => t._1 -> t._2).toMap === expect,
      "heavy-hitter set must equal the exact >= threshold census")
    hh.foreach { case (w, ex, est) =>
      assert(est >= ex, s"$w: est $est under-counts exact $ex")
    }
  }

  test("heavy hitters: adequate width makes the prefilter selective") {
    // w=4096 over 200 keys: near-collision-free, so candidate rows ~= true
    // heavy-hitter rows; verify via estimateMapSide directly.
    val cm = CountMin.table(df, $"v", d = 4, w = 4096)
    val candidates = CountMin.estimateMapSide(df, $"v", cm, d = 4, w = 4096)
      .filter(col("est") >= 150L)
    val exactRows = words.count(w => words.count(_ == w) >= 150).toLong
    assert(candidates.count() === exactRows,
      "collision-free prefilter must pass exactly the true heavy-hitter rows")
    val plan = candidates.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size === 4,
      s"map-side estimate must be 4 broadcast joins, no exchange:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffle join allowed:\n$plan")
  }
}
