package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for v10_pq_adc stage timing (not part of the library). */
object ProfV10 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("profv10").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.ann.Ann

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count()
    // full query, warm
    for (i <- 0 until 3) {
      time(s"full_pass_$i") {
        val prepared = Ann.prepare(emb, "vec_id", "embedding")
        val cb = Ann.pqCodebook(prepared, numSub = 4, subDim = 16, ks = 4, iters = 1)
        val codes = Ann.pqEncode(prepared, cb, numSub = 4, subDim = 16)
        Ann.pqAdcTopK(codes, cb, prepared.filter($"id" % 50 === 0),
            numSub = 4, subDim = 16, ks = 4, k = 5)
          .orderBy($"qid", $"rk").collect().length
      }
    }
    // stage split
    val prepared = Ann.prepare(emb, "vec_id", "embedding")
    val cb = time("pqCodebook")(Ann.pqCodebook(prepared, 4, 16, 4, 1))
    val codes = time("pqEncode_plan")(Ann.pqEncode(prepared, cb, 4, 16))
    time("pqEncode_run")(codes.count())
    val res = time("adc_plan")(Ann.pqAdcTopK(codes, cb, prepared.filter($"id" % 50 === 0), 4, 16, 4, 5))
    time("adc_run")(res.orderBy($"qid", $"rk").collect().length)
    spark.stop()
  }
}
