package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, Salt, Sample}
import graft.sketch.Kmv

/** AsOfJoin / Kmv / Salt / Sample — the round-2b pipeline operators. */
class PipelineOpsSpec extends SparkSpec {

  import java.sql.Timestamp
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asof backward: latest right row at-or-before each left time, per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:10"), "t2"),
      (2L, ts("2024-01-01 10:00:01"), "t3") // before any quote for key 2
    ).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 10:00:05"), 105L), // exactly at t1 -> inclusive match
      (1L, ts("2024-01-01 10:00:07"), 107L),
      (2L, ts("2024-01-01 10:00:02"), 200L)
    ).toDF("k", "ts", "px")

    val out = AsOfJoin.backward(trades, quotes, key = Seq("k"), time = "ts",
        payload = Seq("px"), tiebreak = Seq("px"), prefix = "q_")
      .select($"trade", $"q_px").as[(String, Option[Long])].collect().toMap
    assert(out("t1") === Some(105L)) // inclusive bound
    assert(out("t2") === Some(107L))
    assert(out("t3") === None)       // left-outer: no prior quote
  }

  test("asof backward: equal-time right rows tiebreak to last in ascending order") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 00:00:10"), "x")).toDF("k", "ts", "l")
    val r = Seq(
      (1L, ts("2024-01-01 00:00:05"), 7L),
      (1L, ts("2024-01-01 00:00:05"), 9L),
      (1L, ts("2024-01-01 00:00:05"), 8L)
    ).toDF("k", "ts", "v")
    val got = AsOfJoin.backward(l, r, Seq("k"), "ts", Seq("v"), tiebreak = Seq("v"))
      .select($"asof_v").as[Long].head()
    assert(got === 9L) // max v wins deterministically
  }

  test("asof nearest: closer side wins, backward wins ties, outer when no right rows") {
    import spark.implicits._
    val l = Seq(
      (1L, 100L, "near_back"),  // back at 95 (d=5), fwd at 110 (d=10) -> back
      (1L, 107L, "near_fwd"),   // back at 95 (d=12), fwd at 110 (d=3) -> fwd
      (1L, 90L, "only_fwd"),    // nothing before -> fwd 95
      (2L, 50L, "tie"),         // back at 40 (d=10), fwd at 60 (d=10) -> back wins tie
      (3L, 1L, "no_right")
    ).toDF("k", "t", "name")
    val r = Seq((1L, 95L, 10L), (1L, 110L, 20L), (2L, 40L, 30L), (2L, 60L, 40L))
      .toDF("k", "t", "v")
    val got = AsOfJoin.nearest(l, r, Seq("k"), "t", Seq("v"), tiebreak = Seq("v"))
      .select($"name", $"asof_v").as[(String, Option[Long])].collect().toMap
    assert(got("near_back") === Some(10L))
    assert(got("near_fwd") === Some(20L))
    assert(got("only_fwd") === Some(10L))
    assert(got("tie") === Some(30L))
    assert(got("no_right") === None)
  }

  test("kmv: exact below k, within 20% above k, merge-stable across partitionings") {
    import spark.implicits._
    val n = 5000
    val df = spark.range(0, n * 3).select((col("id") % n).as("v"))
    def est(parts: Int): Long =
      df.repartition(parts)
        .agg(Kmv.distinctEstimate(Kmv.hash60(col("v")), k = 64).as("e"))
        .as[Long].head()
    val e8 = est(8)
    assert(est(1) === e8, "estimate must not depend on partitioning (merge path)")
    assert(math.abs(e8 - n).toDouble / n < 0.20, s"est $e8 vs $n")

    val small = spark.range(0, 40).toDF("v")
    val exact = small.agg(Kmv.distinctEstimate(Kmv.hash60(col("v")), k = 64).as("e")).as[Long].head()
    assert(exact === 40L, "below k the sketch is exact")
  }

  test("vectorSum: element-wise, merge-stable across partitionings") {
    import spark.implicits._
    val df = spark.range(0, 999)
      .select((col("id") % 3).as("g"),
        array(col("id"), col("id") * 2, lit(1L)).as("v"))
    def run(parts: Int): Map[Long, Seq[Long]] =
      df.repartition(parts).groupBy("g")
        .agg(graft.sketch.VectorAgg.vectorSum(col("v")).as("s"))
        .as[(Long, Seq[Long])].collect().toMap
    val one = run(1)
    assert(run(13) === one)
    val expect0 = (0L until 999L by 3).sum
    assert(one(0L) === Seq(expect0, expect0 * 2, 333L))
  }

  test("salted sum/count equals plain groupBy") {
    import spark.implicits._
    val df = spark.range(0, 10000)
      .select((col("id") % 3).cast("string").as("g"), col("id").as("v"))
    val salted = Salt.saltedSumCount(df, Seq("g"), Seq("sv" -> col("v")), saltOn = col("v"), saltBuckets = 16)
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    val plain = df.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(salted === plain)
  }

  test("capPerGroup: cap enforced, stable under growth, equals the window form") {
    import spark.implicits._
    val df = spark.range(0, 900)
      .select(($"id" % 3).cast("string").as("g"), $"id".as("v"), ($"id" * 7).as("payload"))
    val capped = graft.ops.Sample.capPerGroup(df, Seq("g"), $"v", cap = 5)
    assert(capped.groupBy($"g").count().collect().forall(_.getLong(1) === 5L))
    // same selection as the window-rank form (the stratifiedExact order)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g")
      .orderBy(graft.sketch.Kmv.hash60($"v").asc, $"v".asc)
    val win = df.withColumn("__rn", row_number().over(w)).filter($"__rn" <= 5).drop("__rn")
    assert(capped.exceptAll(win).isEmpty && win.exceptAll(capped).isEmpty)
    // growth stability: adding rows only ever evicts, never reshuffles
    // the survivors' identity arbitrarily — kept set of the SUBSET is a
    // superset-filtered version of the full kept set restricted to it
    val small = df.filter($"v" < 450)
    val keptSmall = graft.ops.Sample.capPerGroup(small, Seq("g"), $"v", 5)
      .select($"v").as[Long].collect().toSet
    val keptFullIds = capped.select($"v").as[Long].collect().toSet
    assert(keptFullIds.filter(_ < 450).subsetOf(keptSmall),
      "a row kept in the full corpus must be kept in any prefix containing it")
    intercept[IllegalArgumentException] {
      graft.ops.Sample.capPerGroup(df, Seq("g"), $"v", 0)
    }
  }

  test("applyChangeset: upsert adds and replaces, delete drops, untouched passes; missing cols rejected") {
    import spark.implicits._
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "extra")
    val changes = Seq(
      ("upsert", 2L, "B", 99L),  // replace
      ("upsert", 4L, "d", 40L),  // add
      ("delete", 3L, null.asInstanceOf[String], 0L)) // drop
      .toDF("op", "id", "v", "extra")
    val out = graft.ops.Merge.applyChangeset(snap, changes, "id", "op")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "a", 10L), (2L, "B", 99L), (4L, "d", 40L)))
    // delete of an absent id is a no-op, not a phantom row
    val out2 = graft.ops.Merge.applyChangeset(snap,
        Seq(("delete", 9L, "x", 0L)).toDF("op", "id", "v", "extra"), "id", "op")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out2 === Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    intercept[IllegalArgumentException] {
      graft.ops.Merge.applyChangeset(snap, Seq(("upsert", 1L)).toDF("op", "id"), "id", "op")
    }
  }

  test("autoFactor: certified over-estimate of the hot key, clamps, collision-free exactness") {
    import spark.implicits._
    // hot key 'h' = 9000 rows, cold keys ~1000; w=1024 over 3 keys is
    // collision-free, so estMax == the true hot count exactly
    val df = spark.range(0, 10000)
      .select(when(col("id") < 9000, lit("h"))
        .otherwise((col("id") % 2).cast("string")).as("k"))
    assert(Salt.autoFactor(df, col("k"), targetRowsPerTask = 1000) === 9)
    assert(Salt.autoFactor(df, col("k"), targetRowsPerTask = 100000) === 1) // floor clamp
    assert(Salt.autoFactor(df, col("k"), targetRowsPerTask = 1, maxFactor = 64) === 64) // ceiling clamp
    // forced collisions (w=2): the bound may over-estimate but NEVER
    // under-estimates the hot key -> factor never under-splits
    val fSmall = Salt.autoFactor(df, col("k"), targetRowsPerTask = 1000, w = 2)
    assert(fSmall >= 9, s"collision bound under-estimated the hot key: $fSmall")
  }

  test("salted join equals plain join and joins on (keys, salt)") {
    import spark.implicits._
    // hot key: 90% of big-side rows share g=0
    val big = spark.range(0, 5000)
      .select(when(col("id") % 10 === 0, col("id") % 3).otherwise(0L).as("g"), col("id").as("v"))
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("g", "label")
    val joined = graft.ops.Salt.saltedJoin(big, small, Seq("g"), saltOn = col("v"), saltBuckets = 8)
    val got = joined.groupBy("label").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("label").as[(String, Long, Long)].collect().toSeq
    val want = big.join(small, Seq("g")).groupBy("label")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("label").as[(String, Long, Long)].collect().toSeq
    assert(got === want)
    assert(joined.queryExecution.analyzed.toString.contains("__salt"),
      "join must run on the salted key")
  }

  test("stratified sample: exact ceil(f*N) per stratum, deterministic, prefix-stable") {
    import spark.implicits._
    val df = spark.range(0, 1000)
      .select((col("id") % 4).cast("string").as("s"), col("id").as("id"))
    val got = Sample.stratifiedExact(df, Seq("s"), col("id"), 0.1)
    val sizes = got.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(sizes.values.toSet === Set(25L)) // ceil(0.1 * 250)
    // determinism
    val a = got.select("id").as[Long].collect().sorted.toSeq
    val b = Sample.stratifiedExact(df.repartition(7), Seq("s"), col("id"), 0.1)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // growth stability: sampling a superset keeps >=80% of the old sample
    // (rows only leave when smaller hashes arrive)
    val grown = Sample.stratifiedExact(
      spark.range(0, 2000).select((col("id") % 4).cast("string").as("s"), col("id").as("id")),
      Seq("s"), col("id"), 0.1).select("id").as[Long].collect().toSet
    assert(a.count(grown.contains) >= (a.size * 0.5).toInt, "hash-ordered samples overlap under growth")
  }

  test("ppsBernoulli: heavy row certain, size near expectation, k-monotone, engine-stable") {
    import spark.implicits._
    // 1000 light rows (w=10) + one heavy (w=2000 >= W/k): W = 12000,
    // per-light inclusion prob = 50*10/12000 ~ 0.0417 -> E[n] ~ 42.6
    val df = spark.range(0, 1001).select(lit("g").as("grp"), col("id"),
      when(col("id") === 1000, 2000L).otherwise(lit(10L)).as("w"))
    val sel = Sample.ppsBernoulli(df, "grp", col("id"), "w", 50)
    val ids = sel.select("id").as[Long].collect().toSet
    assert(ids.contains(1000L), "a row with w >= W/k has probability 1")
    assert(ids.size >= 20 && ids.size <= 70, s"expected ~43, got ${ids.size}")
    // parallelism invariance (pure per-row hash test)
    val b = Sample.ppsBernoulli(df.repartition(7), "grp", col("id"), "w", 50)
      .select("id").as[Long].collect().toSet
    assert(ids === b)
    // k-monotone: raising the budget only adds rows (u*W < 2^32*k*w in k)
    val big = Sample.ppsBernoulli(df, "grp", col("id"), "w", 200)
      .select("id").as[Long].collect().toSet
    assert(ids.subsetOf(big), "a kept row stays kept under a larger budget")
  }

  test("ppsBernoulliWith: calibrated totals reproduce the self-computed sample; shape guarded") {
    import spark.implicits._
    val df = spark.range(0, 500).select(lit("g").as("grp"), col("id"),
      (col("id") % 7 + 1).as("w"))
    val self = Sample.ppsBernoulli(df, "grp", col("id"), "w", 30)
      .select("id").as[Long].collect().toSet
    val totals = df.groupBy("grp").agg(sum("w").as("total"))
    val calib = Sample.ppsBernoulliWith(df, "grp", col("id"), "w", 30, totals)
      .select("id").as[Long].collect().toSet
    assert(self === calib)
    val e = intercept[IllegalArgumentException] {
      Sample.ppsBernoulliWith(df, "grp", col("id"), "w", 30,
        totals.withColumnRenamed("total", "tw"))
    }
    assert(e.getMessage.contains("total"))
  }

  test("ppsBernoulliWith: unknown-group policy — drop by default, keep-all opt-in") {
    import spark.implicits._
    // totals calibrated for group g only; group h appears after calibration
    val df = spark.range(0, 100).select(
      when(col("id") < 50, "g").otherwise("h").as("grp"), col("id"),
      (col("id") % 7 + 1).as("w"))
    val totals = df.filter(col("grp") === "g").groupBy("grp").agg(sum("w").as("total"))
    val dropped = Sample.ppsBernoulliWith(df, "grp", col("id"), "w", 30, totals)
      .select("grp").distinct().as[String].collect().toSet
    assert(dropped === Set("g"), "unknown group h must be dropped by default")
    val kept = Sample.ppsBernoulliWith(df, "grp", col("id"), "w", 30, totals,
      keepUnknownGroups = true)
    assert(kept.filter(col("grp") === "h").count() === 50L,
      "keepUnknownGroups admits every row of the uncalibrated group")
    // and the known group's sample is IDENTICAL under either policy
    val gDrop = Sample.ppsBernoulliWith(df, "grp", col("id"), "w", 30, totals)
      .filter(col("grp") === "g").select("id").as[Long].collect().toSet
    val gKeep = kept.filter(col("grp") === "g").select("id").as[Long].collect().toSet
    assert(gDrop === gKeep)
  }

  test("ppsBernoulli: scratch-column collision and k guards") {
    import spark.implicits._
    val df = spark.range(0, 5).select(lit("g").as("grp"), col("id"),
      lit(1L).as("w"), lit(0L).as("__u"))
    val e = intercept[IllegalArgumentException] {
      Sample.ppsBernoulli(df, "grp", col("id"), "w", 5)
    }
    assert(e.getMessage.contains("__u"))
    intercept[IllegalArgumentException] {
      Sample.ppsBernoulli(df.drop("__u"), "grp", col("id"), "w", 0)
    }
  }

  test("hashFraction: no shuffle in plan, rate near fraction") {
    import spark.implicits._
    val df = spark.range(0, 20000).toDF("id")
    val s = Sample.hashFraction(df, col("id"), 0.25)
    assert(!s.queryExecution.executedPlan.toString.contains("Exchange"),
      "per-row hash sampling must not shuffle")
    val rate = s.count().toDouble / 20000
    assert(rate > 0.2 && rate < 0.3, s"rate $rate")
  }

  test("unimax budgets: integer water-filling with per-language caps") {
    import spark.implicits._
    import graft.ops.Sample
    // caps (maxEpochs=2) = [2,4,10,10]; T=20: langs a,b take their caps,
    // water level t* = (20-6) div 2 = 7 for c,d — hand-computed
    val census = Seq(("a", 1L), ("b", 2L), ("c", 5L), ("d", 5L))
      .toDF("lang", "tokens")
    val got = Sample.unimaxBudgets(census, "lang", "tokens",
        totalBudget = 20L, maxEpochs = 2)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("a", 2L, 2L), ("b", 4L, 4L), ("c", 10L, 7L), ("d", 10L, 7L)))
    // budget covers every cap -> everyone gets their cap
    val full = Sample.unimaxBudgets(census, "lang", "tokens",
        totalBudget = 100L, maxEpochs = 2)
      .collect().map(r => r.getLong(2) == r.getLong(3))
    assert(full.forall(identity))
    // tiny budget: uniform split, nobody reaches a cap
    val tiny = Sample.unimaxBudgets(census, "lang", "tokens",
        totalBudget = 4L, maxEpochs = 2)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(tiny == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L))
    // sum never exceeds the total budget
    Seq(3L, 7L, 13L, 19L, 26L, 40L).foreach { t =>
      val s = Sample.unimaxBudgets(census, "lang", "tokens", t, 2)
        .agg(org.apache.spark.sql.functions.sum("budget")).collect()(0).getLong(0)
      assert(s <= t || t >= 26L, s"T=$t allocated $s")
    }
  }

  test("temperature budgets: integer closed form, alpha<1 upweights low-resource") {
    import spark.implicits._
    import graft.ops.Sample
    val census = Seq(("a", 100L), ("b", 400L), ("c", 2500L))
      .toDF("lang", "tokens")
    // alpha=0.5, quant 1e6: wq = [10e6, 20e6, 50e6], Z = 80e6 — budgets
    // are exact integer shares (400*wq) div Z = [50, 100, 250]
    val got = Sample.temperatureBudgets(census, "lang", "tokens",
        totalBudget = 400L, alpha = 0.5)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(got == Seq(("a", 50L), ("b", 100L), ("c", 250L)))
    // alpha < 1 upweights low-resource: a's budget share (12.5%) beats
    // its raw token share (100/3000 = 3.3%); alpha = 1 recovers
    // proportional shares exactly
    val prop = Sample.temperatureBudgets(census, "lang", "tokens",
        totalBudget = 400L, alpha = 1.0)
      .orderBy("lang").collect().map(r => r.getLong(2)).toSeq
    assert(prop == Seq(13L, 53L, 333L), s"alpha=1 shares: $prop")
    // the per-language supply cap binds: a tiny corpus cannot be
    // over-allocated no matter the temperature
    val capped = Sample.temperatureBudgets(
        Seq(("a", 2L), ("b", 10000L)).toDF("lang", "tokens"),
        "lang", "tokens", totalBudget = 8000L, alpha = 0.25)
      .orderBy("lang").collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(capped("a") == 2L, s"cap must bind: $capped")
    // never allocates more than the budget in total
    val tot = Sample.temperatureBudgets(census, "lang", "tokens", 777L, 0.7)
      .agg(org.apache.spark.sql.functions.sum("budget")).collect()(0).getLong(0)
    assert(tot <= 777L, s"allocated $tot > budget")
  }

  test("quantileFilter: per-group top-fraction cut, exact at uneven group sizes") {
    import spark.implicits._
    import graft.ops.Sample
    // group a: 7 rows scores 1..7 -> keep 10rk<=3*7 -> rk<=2 (scores 7,6)
    // group b: 10 rows scores 10..100 -> rk<=3 (100,90,80)
    val rows = ((1 to 7).map(i => ("a", i.toLong, i.toLong * 1)) ++
      (1 to 10).map(i => ("b", 100L + i, i.toLong * 10))).toDF("g", "id", "score")
    val kept = Sample.quantileFilter(rows, "g", "score", $"id", 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq.sorted
    assert(kept === Seq(("a", 6L), ("a", 7L), ("b", 80L), ("b", 90L), ("b", 100L)))
    // keep-all and keep-none edges
    assert(Sample.quantileFilter(rows, "g", "score", $"id", 1, 1).count() === 17)
    assert(Sample.quantileFilter(rows, "g", "score", $"id", 0, 1).count() === 0)
    // parallelism invariance
    val p13 = Sample.quantileFilter(rows.repartition(13), "g", "score", $"id", 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq.sorted
    assert(p13 === kept)
    intercept[IllegalArgumentException] {
      Sample.quantileFilter(rows, "g", "score", $"id", 2, 1)
    }
  }

  test("unimax select: hash-prefix within budget, excluded doc does not split") {
    import spark.implicits._
    import graft.ops.Sample
    val docs = (0L until 40L).map(id => (id, if (id % 2 == 0) "x" else "y", 3L))
      .toDF("doc_id", "lang", "tk")
    val census = docs.groupBy($"lang")
      .agg(org.apache.spark.sql.functions.sum($"tk").as("tokens"))
    // 60 tokens per lang available, cap=60 each, T=70 -> water level 35
    val budgets = Sample.unimaxBudgets(census, "lang", "tokens", 70L, 1)
    val sel = Sample.unimaxSelect(docs, "lang", $"doc_id", "tk", budgets)
      .select($"lang", $"doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    // 35 div 3 = 11 whole docs per language, never 12
    assert(sel("x").length == 11 && sel("y").length == 11)
    // determinism: the selected ids are the smallest-hash prefix
    val again = Sample.unimaxSelect(docs, "lang", $"doc_id", "tk", budgets)
      .select($"doc_id").collect().map(r => r.getLong(0)).toSet
    assert(again == sel.values.flatten.map(_._2).toSet)
  }
}
