package graft

import org.apache.spark.sql.functions._

/** Bucketing: the pre-shuffle co-location strategy for repeated big-big
  * joins at 100 TB — both tables bucketed by the join key into the same
  * bucket count join WITHOUT any Exchange in the plan (each task zips
  * bucket i with bucket i). The 600k-row local test proves the plan
  * shape; the win scales with data size since the avoided shuffle is
  * O(data).
  */
class BucketedJoinSpec extends SparkSpec {

  test("equal-bucketed tables sort-merge join with zero exchanges and match the shuffled result") {
    import spark.implicits._
    val base = "file:/tmp/graft_bucketed"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    orders.write.mode("overwrite").option("path", s"$base/orders")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    lineitem.write.mode("overwrite").option("path", s"$base/lineitem")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle decision
      val joinOnly = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
        .select($"l_quantity", $"o_orderpriority")
      val p = joinOnly.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$p")

      val joined = joinOnly
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").cast("long").as("qty"))
      val bucketed = joined.orderBy($"o_orderpriority").as[(String, Long, Long)].collect().toSeq
      val plain = lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").cast("long").as("qty"))
        .orderBy($"o_orderpriority").as[(String, Long, Long)].collect().toSeq
      assert(bucketed === plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  import PlanCounts.exchanges

  test("bucketed-by-key join plans with ZERO exchange; unbucketed pays two") {
    import spark.implicits._
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

  test("MISMATCHED bucket counts (8 vs 16) re-introduce an exchange — the contract's failure mode") {
    import spark.implicits._
    // the j13 sizing rule's second clause: buckets ≈ data/target-task
    // AND both sides must agree on the count. 8-vs-16 is the easy
    // mistake (each side sized independently); the co-location contract
    // breaks and at least one side pays the shuffle again.
    val li = (1L to 2000L).map(i => (i % 500, i.toDouble % 50 + 1)).toDF("k", "q")
    val ord = (1L to 600L).map(i => (i % 500, i * 7)).toDF("k2", "c")
    li.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("graft_bjs_m8")
    ord.write.bucketBy(16, "k2").sortBy("k2").mode("overwrite")
      .saveAsTable("graft_bjs_m16")
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("graft_bjs_m8")
          .join(spark.table("graft_bjs_m16"), $"k" === $"k2")
        val rows = j.count()
        assert(rows > 0)
        assert(exchanges(j.queryExecution.executedPlan) >= 1,
          s"8-vs-16 bucket counts should force a shuffle on one side:\n${j.queryExecution.executedPlan}")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bjs_m8")
      spark.sql("DROP TABLE IF EXISTS graft_bjs_m16")
    }
  }

  test("bucketed aggregation on the bucket key also skips the exchange") {
    import spark.implicits._
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
