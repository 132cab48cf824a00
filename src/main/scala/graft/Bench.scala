package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Queries whose r6 medians swung with machine load (heavy shuffles /
    * iterative jobs / fixture-cache first-touch): these get a deeper
    * sample count so the committed median is the steady state, not one
    * cold outlier — the round-6 verdict's lead ask. */
  private val heavyTail = Set(
    "x4_dup_clusters", "x5_dedup_corpus", "x10_incremental_dedup",
    "x11_full_pipeline", "d2_minhash_lsh", "d9_semdedup",
    "d10_semdedup_capped", "d4_ngram_jaccard", "m2_decode_png", "m4_resize")

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
    // Sampling policy (round 7): every query runs `warmup` discarded
    // passes first — SCALE.md measured the cold first sample at 1.3–3x
    // steady state (codegen, AQE re-plan, cache/fixture first-touch) —
    // then n timed samples whose MEDIAN is reported; the heavy tail
    // (see heavyTail) gets max(n, 5) timed samples because its n=3
    // medians have read up to 2.7x high under machine-load swings.
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1").toInt
    // Optional comma-separated name filter, for isolating one query's time
    // from any run-order/session-state effect of the full alphabetical
    // sweep (e.g. SPARK_GRAFT_BENCH_ONLY=w5_session_window).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val samples = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val results = selected.map { case (name, fn) =>
      val nq = if (heavyTail(name)) math.max(n, 5) else n
      val raw = (0 until warmup + nq).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      samples(name) = raw // run order; first `warmup` entries were discarded
      val times = raw.drop(warmup).sorted
      // Queries that persist intermediates (d2/d5/d7/x10/x11) create a
      // fresh cached frame per run and never unpersist (their result is
      // lazy; ContextCleaner reclaims on GC). Drop the blocks BETWEEN
      // queries — within-query warm caching stays honest, but ~5 × 107
      // runs can't build cache-eviction pressure that taxes whoever runs
      // later in the alphabet.
      spark.catalog.clearCache()
      val med = times(times.size / 2)
      System.err.println(f"[bench] $name%-24s median $med%8.3f s  " +
        raw.map(t => f"$t%.3f").mkString("[", ",", "]"))
      name -> med
    }
    def r4(v: Double): Double = math.rint(v * 10000) / 10000
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":${r4(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","n":$n,"cpus":$cpus,"warmup":$warmup}"""
    // The driver scrapes stdout and has truncated the tail twice
    // (BENCH_r04/r05 "parsed": null lost per-query history for ~30
    // queries) — so: (a) stdout carries ONLY this one line (progress goes
    // to stderr), rounded to 4 decimals to keep it short, flushed
    // immediately; (b) the artifact of record is a FILE the bench writes
    // itself with the full detail.
    println(line)
    System.out.flush()
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench-latest.json")
    // the file additionally carries every raw sample in run order —
    // INCLUDING the discarded warm-up passes (the first `warmup` entries
    // of each array): medians alone can't distinguish a cold-run outlier
    // from a steady-state regression when a round-over-round diff moves.
    val samp = samples.map { case (k, v) => s"\"" + k + "\":" + v.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val heavyList = heavyTail.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val policy = s""""policy":{"warmup_discarded":$warmup,"n":$n,"n_heavy":${math.max(n, 5)},"heavy":$heavyList}"""
    val fileLine = line.dropRight(1) + s""","samples":$samp,$policy}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (fileLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
