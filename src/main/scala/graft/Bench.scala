package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark) // dot_long/sorted_jaccard*/hamming_dist in SQL
    // Warm the session so the first timed query isn't charged JVM/codegen
    // startup: run one real parquet scan + hash-agg + sort pipeline.
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().orderBy("r_name").collect()
    // n>=3 runs per query, report the MEDIAN: single-shot timings at this
    // scale are dominated by first-run codegen/AQE warmup noise (r2 saw
    // +-0.4 s swings on sub-second joins), and the median of 3 is robust
    // to one outlier in either direction.
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    // Optional comma-separated name filter, for isolating one query's time
    // from any run-order/session-state effect of the full alphabetical
    // sweep (e.g. SPARK_GRAFT_BENCH_ONLY=w5_session_window).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val samples = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val results = selected.map { case (name, fn) =>
      val raw = (0 until n).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      samples(name) = raw
      val times = raw.sorted
      // Queries that persist intermediates (d2/d5/d7/x10/x11) create a
      // fresh cached frame per run and never unpersist (their result is
      // lazy; ContextCleaner reclaims on GC). Drop the blocks BETWEEN
      // queries — within-query warm caching stays honest, but 3 × 97
      // runs can't build cache-eviction pressure that taxes whoever runs
      // later in the alphabet.
      spark.catalog.clearCache()
      name -> times(times.size / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","n":$n,"cpus":$cpus}"""
    // The driver scrapes stdout and has truncated the tail twice
    // (BENCH_r04/r05 "parsed": null lost per-query history for ~30
    // queries) — so the artifact of record is a FILE the bench writes
    // itself; stdout stays for the driver's one-line contract.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench-latest.json")
    // the file additionally carries every raw sample (run order, not
    // sorted): medians alone can't distinguish a cold-run outlier from a
    // steady-state regression when a round-over-round diff moves.
    val samp = samples.map { case (k, v) => s"\"" + k + "\":" + v.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val fileLine = line.dropRight(1) + s""","samples":$samp}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (fileLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(line)
    spark.stop()
  }
}
