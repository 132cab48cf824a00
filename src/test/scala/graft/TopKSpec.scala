package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.TopK

/** Bounded-state grouped top-k: window-form equality on real data, tie
  * semantics, the partial-aggregate plan shape, parallelism invariance,
  * and duplicate handling. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("perGroup == the window idiom on the part table (incl. ties)") {
    val part = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
      .withColumn("cents", floor($"p_retailprice" * 100 + 0.5).cast("long"))
    val agg = TopK.perGroup(part.withColumn("neg", -$"cents"),
        Seq("p_brand"), $"neg", $"p_partkey", 3, keyCol = "negc", idCol = "p_partkey")
      .select($"p_brand", $"rk", $"p_partkey", (-$"negc").as("cents"))
    val w = Window.partitionBy($"p_brand").orderBy($"cents".desc, $"p_partkey")
    val win = part.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .select($"p_brand", $"rk", $"p_partkey", $"cents")
    assert(agg.count() > 0)
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty)
  }

  test("plan: partial + final aggregate, no Window, no corpus sort") {
    val df = spark.range(0, 1000)
      .select(($"id" % 7).as("g"), $"id".as("v"))
    val plan = TopK.perGroup(df, Seq("g"), $"v", $"v", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "top-k fell back to a window")
    assert(plan.sliding("ObjectHashAggregate".length).count(_ == "ObjectHashAggregate") >= 2
      || plan.sliding("SortAggregate".length).count(_ == "SortAggregate") >= 2,
      s"expected partial+final aggregate pair in:\n$plan")
  }

  test("duplicate pairs collapse; fewer rows than k returns them all; parallelism-invariant") {
    val df = Seq((1L, 5L), (1L, 5L), (1L, 7L)).toDF("g", "v")
    val out = TopK.perGroup(df, Seq("g"), $"v", $"v", 5)
      .select($"rk", $"key").as[(Int, Long)].collect().toSeq.sorted
    assert(out === Seq((1, 5L), (2, 7L))) // (5,5) twice is ONE pair
    val big = spark.range(0, 5000).select(($"id" % 3).as("g"), ($"id" * 37 % 101).as("v"), $"id".as("t"))
    def run(parts: Int) = TopK.perGroup(big.repartition(parts), Seq("g"), $"v", $"t", 4)
      .orderBy($"g", $"rk").collect().map(_.toSeq).toSeq
    assert(run(1) === run(13))
  }
}
