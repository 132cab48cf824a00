package graft

import org.apache.spark.sql.functions._
import graft.sketch.Census

/** Histogram-census quantiles: pinned against a driver-side sorted
  * reference (the census answer must be the smallest bucket upper bound
  * covering the rank), floor-division for negative values, and the
  * map-side partial-aggregation plan shape.
  */
class CensusSpec extends SparkSpec {
  import spark.implicits._

  /** Exact reference: smallest B = (b+1)*w - 1 with |{v ≤ B}| ≥ ⌈p·n/1000⌉. */
  private def expected(vals: Seq[Long], w: Long, p: Int): Long = {
    val n = vals.size.toLong
    val rank = math.max(1L, (p * n + 999L) / 1000L)
    val buckets = vals.map(v => Math.floorDiv(v, w)).sorted
    val b = buckets(rank.toInt - 1)
    (b + 1) * w - 1
  }

  test("matches sorted reference on a skewed multi-group column") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val v = if (g == "a") rnd.nextInt(100).toLong else (rnd.nextInt(40) * rnd.nextInt(40)).toLong
      (g, v)
    }
    val df = rows.toDF("g", "v")
    val out = Census.histQuantiles(df, $"v", Seq("g"), bucketWidth = 8L,
        permille = Seq(500, 900, 990))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (g <- Seq("a", "b"); p <- Seq(500, 900, 990)) {
      val vals = rows.filter(_._1 == g).map(_._2)
      assert(out((g, p)) === expected(vals, 8L, p), s"group $g permille $p")
    }
  }

  test("negative values use mathematical floor buckets") {
    val df = Seq(("x", -17L), ("x", -1L), ("x", 0L), ("x", 5L)).toDF("g", "v")
    // buckets at w=8: floor(-17/8)=-3, floor(-1/8)=-1, 0, 0 → p500 rank 2 → bucket -1 → upper -1
    val out = Census.histQuantiles(df, $"v", Seq("g"), 8L, Seq(500))
      .collect().map(r => r.getLong(2))
    assert(out.toSeq === Seq(-1L))
  }

  test("permille 1000 is the max; permille 1 is the min bucket") {
    val df = Seq(("x", 3L), ("x", 100L), ("x", 999L)).toDF("g", "v")
    val out = Census.histQuantiles(df, $"v", Seq("g"), 10L, Seq(1, 1000))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out(1) === 9L)      // bucket 0 upper bound
    assert(out(1000) === 999L) // bucket 99 upper bound: (99+1)*10-1
  }

  test("census aggregation is map-side combined (partial HashAggregate)") {
    val df = (1 to 100).map(i => ("g" + (i % 2), i.toLong)).toDF("g", "v")
    val plan = Census.histQuantiles(df, $"v", Seq("g"), 4L, Seq(500))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"), s"expected partial aggregation in:\n$plan")
  }

  test("rejects bad arguments") {
    val df = Seq(("x", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Census.histQuantiles(df, $"v", Seq("g"), 0L, Seq(500))
    }
    intercept[IllegalArgumentException] {
      Census.histQuantiles(df, $"v", Seq("g"), 8L, Seq(0))
    }
  }
}
