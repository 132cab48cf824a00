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
}
