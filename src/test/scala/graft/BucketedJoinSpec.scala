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
}
