package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** The bucketed co-located join contract (j13): both sides written
  * `bucketBy(k, key)` join WITHOUT any Exchange — the storage layout
  * replaces the shuffle — while the identical unbucketed join pays two.
  * This is the property that matters at 100 TB: the layout cost is paid
  * once at write time, every subsequent key join is shuffle-free. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(p: SparkPlan): Int = {
    val expanded = p.collect {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case _: ShuffleExchangeExec => 1
    }
    expanded.sum
  }

  test("bucketed-by-key join plans with ZERO exchange; unbucketed pays two") {
    val li = (1L to 2000L).map(i => (i % 500, i.toDouble % 50 + 1)).toDF("k", "q")
    val ord = (1L to 600L).map(i => (i % 500, i * 7)).toDF("k2", "c")
    li.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("graft_bjs_a")
    ord.write.bucketBy(8, "k2").sortBy("k2").mode("overwrite")
      .saveAsTable("graft_bjs_b")
    try {
      // disable broadcast so the join shape under test is SMJ/shuffle
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("graft_bjs_a")
          .join(spark.table("graft_bjs_b"), $"k" === $"k2")
        val rows = j.count()
        assert(rows > 0)
        assert(exchanges(j.queryExecution.executedPlan) == 0,
          s"bucketed join must not shuffle:\n${j.queryExecution.executedPlan}")
        // negative control: same data unbucketed shuffles both sides
        val u = li.join(ord, $"k" === $"k2")
        u.count()
        assert(exchanges(u.queryExecution.executedPlan) >= 2,
          s"unbucketed control should shuffle:\n${u.queryExecution.executedPlan}")
        // and the answers agree
        assert(u.count() == rows)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bjs_a")
      spark.sql("DROP TABLE IF EXISTS graft_bjs_b")
    }
  }

  test("bucketed aggregation on the bucket key also skips the exchange") {
    val li = (1L to 2000L).map(i => (i % 100, i.toDouble)).toDF("k", "v")
    li.write.bucketBy(8, "k").mode("overwrite").saveAsTable("graft_bjs_c")
    try {
      val a = spark.table("graft_bjs_c").groupBy($"k").agg(sum($"v"))
      a.count()
      assert(exchanges(a.queryExecution.executedPlan) == 0,
        s"groupBy on the bucket key must not shuffle:\n${a.queryExecution.executedPlan}")
    } finally spark.sql("DROP TABLE IF EXISTS graft_bjs_c")
  }
}
