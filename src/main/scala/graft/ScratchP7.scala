package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ScratchP7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import spark.implicits._
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCRATCH $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }
    spark.read.parquet(s"$dir/nation.parquet").count()

    def body(df0: DataFrame): DataFrame =
      df0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .filter($"ts" >= lit("2024-01-05").cast("timestamp") &&
                $"ts" <  lit("2024-01-12").cast("timestamp") &&
                $"event_type".isin("click", "view") &&
                $"user_id".between(10, 500))
        .select($"event_id", $"ts", $"user_id", $"event_type")
        .orderBy($"event_id")

    // A: with the conf.set on every read (what t() does today)
    def qA(): DataFrame = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      body(spark.read.parquet(s"$dir/events.parquet"))
    }
    // B: no conf.set (session already has it)
    def qB(): DataFrame = body(spark.read.parquet(s"$dir/events.parquet"))

    (1 to 3).foreach(i => time(s"A(conf.set) run$i")(qA().count()))
    (1 to 3).foreach(i => time(s"B(no set)   run$i")(qB().count()))
    (1 to 3).foreach(i => time(s"A(conf.set) again$i")(qA().count()))
    spark.stop()
  }
}
