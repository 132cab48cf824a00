package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines. */
object Sample {

  /** Exact-size stratified sample: within each stratum, keep the
    * `ceil(fraction * N_stratum)` rows with the smallest md5 hash of
    * `idCol` (tiebroken by the id itself). Hash-ordered selection makes
    * the sample (a) deterministic across runs and cluster sizes,
    * (b) stable under data growth — a row stays sampled until enough
    * smaller-hash rows arrive — and (c) reproducible by any engine with
    * md5 (the DuckDB oracle recomputes it exactly).
    *
    * One shuffle (by stratum) serves both the per-stratum count and the
    * rank. Strata are assumed to fit a task's sort (documents per
    * language at 100 TB: salt-split or switch to approximate per-row
    * hash-threshold sampling via [[hashFraction]] when a stratum is a
    * significant share of the data).
    */
  def stratifiedExact(df: DataFrame,
                      strata: Seq[String],
                      idCol: Column,
                      fraction: Double): DataFrame = {
    val part = Window.partitionBy(strata.map(col): _*)
    val byHash = part.orderBy(graft.sketch.Kmv.hash60(idCol).asc, idCol.asc)
    df.withColumn("__nt", count(lit(1)).over(part))
      .withColumn("__rn", row_number().over(byHash))
      .filter(col("__rn") <= ceil(col("__nt") * fraction))
      .drop("__nt", "__rn")
  }

  /** Frequency CAP per group — keep at most `cap` rows per group (the
    * per-domain / per-cluster downsampling a crawl pipeline applies to
    * hot sources), selected by the [[stratifiedExact]] hash order
    * (deterministic across runs/engines, stable under data growth: a
    * kept row leaves only when smaller hashes arrive). Unlike
    * stratifiedExact's window (corpus shuffle + per-group sort), the
    * selection runs through [[TopK.perGroup]]'s bounded-state
    * aggregator: map-side partial aggregation ships ≤ groups×cap
    * (hash, id) pairs, hot groups cost cap buffer slots per task, and
    * the kept rows come back by equi-join on (group, id). `idCol` must
    * be integral (cast to long) and unique. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], idCol: Column,
                  cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1 (got $cap)")
    val reserved = Seq("__capid", "__caph").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"reserved scratch columns present: ${reserved.mkString(", ")}")
    val keyed = df.withColumn("__capid", idCol.cast("long"))
      .withColumn("__caph", graft.sketch.Kmv.hash60(col("__capid")))
    val sel = TopK.perGroup(keyed, groupCols, col("__caph"), col("__capid"),
        cap, keyCol = "__caph", idCol = "__capid")
      .select(groupCols.map(col) :+ col("__capid"): _*)
    keyed.join(sel, groupCols :+ "__capid").drop("__caph", "__capid")
  }

  /** Approximate fraction sample, fully per-row (no shuffle, no state):
    * keep rows whose hash bucket falls below `fraction` of the bucket
    * space. The scale path when exact stratum sizes don't matter. */
  def hashFraction(df: DataFrame, idCol: Column, fraction: Double, buckets: Int = 1000000): DataFrame =
    df.filter(pmod(graft.sketch.Kmv.hash60(idCol), lit(buckets.toLong)) < lit((fraction * buckets).toLong))

  /** UniMax per-language token budgets (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining", arXiv:2304.09151): distribute a total
    * token budget `totalBudget` as uniformly as possible across
    * languages, capping each language at `maxEpochs` passes over its
    * available tokens. This is WATER-FILLING with per-language cap
    * cap_l = maxEpochs · tokens_l, and has the closed form: sort
    * languages by cap ascending; the first rank i where the equal share
    * of the remaining budget, t_i = (T − Σ_{j<i} cap_j) div (k−i+1),
    * no longer exceeds cap_i is the water level t*: languages below it
    * get their full cap, languages at-or-above it get t*. (If the total
    * budget covers every cap, everyone gets their cap.) Pure integer
    * arithmetic — floor division, deterministic ties by language — so
    * any SQL engine replays it exactly; Σ budgets ≤ totalBudget with
    * slack < k from the floors.
    *
    * `census` is the (langCol, tokens) table — k rows, one per
    * language. All windows here run over that k-row frame (KB-sized at
    * any corpus scale — language counts don't grow with data), never
    * over the corpus. Returns (langCol, tokens, cap, budget). */
  def unimaxBudgets(census: DataFrame, langCol: String, tokensCol: String,
                    totalBudget: Long, maxEpochs: Int): DataFrame = {
    val byCap = Window.orderBy(col("cap").asc, col(langCol).asc)
    val all = Window.partitionBy()
    val ranked = census
      .select(col(langCol), col(tokensCol).cast("long").as("tokens"),
        (col(tokensCol).cast("long") * maxEpochs).as("cap"))
      .withColumn("i", row_number().over(byCap))
      .withColumn("k", count(lit(1)).over(all))
      .withColumn("prefix", sum(col("cap")).over(byCap)) // inclusive
      .withColumn("tcand",
        expr(s"($totalBudget - (prefix - cap)) div (k - i + 1)"))
      .withColumn("hit", col("tcand") <= col("cap"))
    // water level = tcand at the FIRST hit rank (null when budget covers
    // every cap). A k-row frame: the min-over-all window is metadata.
    ranked
      .withColumn("istar", min(when(col("hit"), col("i"))).over(all))
      .withColumn("tstar", max(when(col("i") === col("istar"), col("tcand"))).over(all))
      .select(col(langCol), col("tokens"), col("cap"),
        when(col("istar").isNull || col("i") < col("istar"), col("cap"))
          .otherwise(greatest(col("tstar"), lit(0L))).as("budget"))
  }

  /** Temperature-based language budgets — the mixture baseline UniMax
    * improves on (Conneau et al. 2020 §3.1 exponentiated sampling;
    * Chung et al. 2023's comparison axis): budget_l ∝ tokens_l^alpha
    * (alpha = 1/T; alpha < 1 upweights low-resource languages), capped
    * at the language's own token count. Closed form over the k-row
    * census — no iteration, no corpus pass.
    *
    * Determinism discipline: the weight tokens^alpha is quantized to
    * integer units BEFORE normalization, so both the normalizer Z and
    * every budget are exact integer arithmetic (floor(totalBudget · wq
    * / Z)) — aggregation-order-proof and engine-replayable. The product
    * totalBudget · wq runs through a DECIMAL(38,0) intermediate, NOT
    * Long: at quantDigits=6 and alpha=0.5 a language beyond ~8.5e7
    * tokens already pushed the Long product past 2^63 and non-ANSI
    * Spark wrapped silently (round-9 advice); decimal keeps the math
    * exact up to 10^38-scale products — beyond any realistic
    * budget × weight. Feed the result to [[unimaxSelect]] — selection
    * is budget-driven and shared between the two policies. */
  def temperatureBudgets(census: DataFrame, langCol: String, tokensCol: String,
                         totalBudget: Long, alpha: Double,
                         quantDigits: Int = 6): DataFrame = {
    val all = Window.partitionBy()
    val q = math.pow(10.0, quantDigits)
    census.select(col(langCol), col(tokensCol).cast("long").as("tokens"))
      .withColumn("wq",
        floor(pow(col("tokens").cast("double"), lit(alpha)) * lit(q) + lit(0.5))
          .cast("long"))
      .withColumn("z", sum(col("wq")).over(all))
      .select(col(langCol), col("tokens"),
        least(col("tokens"),
          expr(s"(CAST($totalBudget AS DECIMAL(38,0)) * wq) div z")).as("budget"))
  }

  /** Deterministic proportional interleave — the ORDER the training job
    * reads the mixed corpus in (the "data order file" step after
    * [[unimaxBudgets]]/[[temperatureBudgets]] pick WHAT to train on):
    * each group's rows spread evenly through the global sequence, so no
    * source clumps and every prefix of the order is (within rounding)
    * the same mixture as the whole — the property curriculum-free
    * pretraining wants from its shuffle, delivered deterministically.
    *
    * The schedule is fair-queueing's virtual-finish-time rule: rank each
    * group's rows r = 1..m_g in [[stratifiedExact]] hash order, give row
    * r the key (2r−1)/(2·m_g) ∈ (0,1) — the midpoint of its equal slice
    * — and emit rows globally by key. Computed as integer
    * ((2r−1)·10^18) div (2·m_g) through DECIMAL(38,0) (the
    * [[temperatureBudgets]] overflow discipline: (2r−1)·10^18 passes
    * Long at r ≈ 4.6e6 — far below a 100 TB corpus), ties broken by
    * (group, r) — exact, engine-replayable arithmetic end to end.
    *
    * Plan shape at scale: the per-group census is a k-row broadcast;
    * ranking is one shuffle by group (same stratum-fits-a-task caveat as
    * [[stratifiedExact]] — salt-split a dominant group); the global rank
    * is a RANGE-PARTITIONED sort plus per-partition row numbers lifted by
    * broadcast prefix offsets — never a single-partition window (the
    * global-row_number trap serializes 100 TB through one task). The
    * offset census is one ≤#partitions-row collect, so this call runs a
    * job eagerly (the kmeans/BPE bounded-census discipline). The full
    * sort key (key, group, rank) is tie-free, so ANY contiguous range
    * boundary choice yields the same global ranks — pos is deterministic
    * across runs, cluster sizes, and partition counts. Returns the input
    * rows + (pos) with pos = 1..N in interleave order. */
  def interleaveOrder(df: DataFrame, groupCol: String, idCol: Column): DataFrame =
    interleaveCore(df, Nil, groupCol, idCol)

  /** CURRICULUM variant of [[interleaveOrder]]: the order is phase-major
    * (easy → hard, or whatever `phaseCol` encodes, ascending), and
    * WITHIN each phase the groups interleave proportionally — Bengio
    * et al. 2009's curriculum schedule with the x33 mixture guarantee
    * per stage. Same plan shape; the rank window and census key by
    * (phase, group) and the phase leads the global sort key. */
  def interleaveOrderPhased(df: DataFrame, phaseCol: String, groupCol: String,
                            idCol: Column): DataFrame =
    interleaveCore(df, Seq(phaseCol), groupCol, idCol)

  private def interleaveCore(df: DataFrame, phaseCols: Seq[String],
                             groupCol: String, idCol: Column): DataFrame = {
    val reserved = Seq("__im", "__ir", "__ik", "__pid", "pos").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"reserved scratch columns present: ${reserved.mkString(", ")}")
    val pCols = phaseCols.map(col)
    val part = Window.partitionBy(pCols :+ col(groupCol): _*)
    val byHash = part.orderBy(graft.sketch.Kmv.hash60(idCol).asc, idCol.asc)
    val keyed = df.withColumn("__im", count(lit(1)).over(part))
      .withColumn("__ir", row_number().over(byHash))
      .withColumn("__ik", expr(
        "(CAST(2 * __ir - 1 AS DECIMAL(38,0)) * 1000000000000000000) div (2 * __im)"))
    val sortKeys = pCols.map(_.asc) ++
      Seq(col("__ik").asc, col(groupCol).asc, col("__ir").asc)
    // The census below and the final projection must see the SAME range
    // boundaries (repartitionByRange samples, so two independent plans
    // of this frame could place rows in different partitions) — persist
    // pins one physical frame for both. persist, NOT localCheckpoint:
    // the retained lineage makes an executor-loss recompute flow through
    // the already-built exchange (fixed partitioner object, same shuffle
    // outputs → identical pids), where checkpointed blocks would be
    // simply lost and fail the query.
    val sorted = keyed
      .repartitionByRange(sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    // exclusive prefix offsets over the ≤#partitions-row census — this
    // collect is an EAGER job at construction time (inherent: the
    // offsets are literals in the returned plan)
    val counts = sorted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.foldLeft(Map.empty[Int, Long] -> 0L) {
      case ((m, acc), (pid, n)) => (m + (pid -> acc), acc + n)
    }._1
    val inPart = Window.partitionBy(col("__pid")).orderBy(sortKeys: _*)
    sorted
      .withColumn("pos",
        (element_at(typedLit(offsets), col("__pid")) + row_number().over(inPart))
          .cast("long"))
      .drop("__im", "__ir", "__ik", "__pid")
  }

  /** Per-group score-QUANTILE filter — the calibrated quality cut
    * (FineWeb/RefinedWeb-style): keep each group's top keepNum/keepDen
    * fraction BY SCORE, so the absolute threshold differs per group
    * (per crawl dump, per source domain) and a uniformly-scored global
    * cut cannot starve clean-but-modest sources. Exact integer
    * arithmetic end to end: rank·keepDen ≤ n·keepNum (cross-multiplied,
    * never a float fraction), ties (score desc, id asc), so the kept
    * set is identical at any parallelism and engine.
    *
    * Plan shape: ONE shuffle by group for the rank window + group count
    * (same stratum-fits-a-task caveat as [[stratifiedExact]] — salt-
    * split a dominant group). Returns the kept input rows unchanged. */
  def quantileFilter(df: DataFrame, groupCol: String, scoreCol: String,
                     idCol: Column, keepNum: Int, keepDen: Int): DataFrame = {
    require(keepDen >= 1 && keepNum >= 0 && keepNum <= keepDen,
      s"quantileFilter: keep fraction $keepNum/$keepDen out of [0,1]")
    val reserved = Seq("__qr", "__qn").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"reserved scratch columns present: ${reserved.mkString(", ")}")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol).desc, idCol.asc)
    val cw = Window.partitionBy(col(groupCol))
    df.withColumn("__qr", row_number().over(w))
      .withColumn("__qn", count(lit(1)).over(cw))
      .filter(lit(keepDen.toLong) * col("__qr") <= lit(keepNum.toLong) * col("__qn"))
      .drop("__qr", "__qn")
  }

  /** Weight-proportional (PPS) Poisson sampling: include each row
    * independently with probability min(1, k·w/W) — expected sample size
    * k per group, zero coordination between rows. This is the sampling
    * scheme that actually survives 100 TB: no global order, no reservoir
    * state, no prefix sum — one broadcast of the per-group weight totals
    * and one embarrassingly-parallel filter.
    *
    * Exactness discipline: the uniform is the first 32 bits of
    * md5(id) — the [[stratifiedExact]] hash family — and the inclusion
    * test `u·W < 2³²·k·w` is evaluated in DECIMAL(38,0) so both sides
    * are EXACT integers in any engine (never a float probability whose
    * last ulp could flip a row near the threshold). Heavy rows with
    * w ≥ W/k are always included (probability capped at 1), the PPS
    * contract. Deterministic across runs, cluster sizes, and engines;
    * stable under resampling with a larger k (a kept row stays kept).
    *
    * Returns the selected rows unchanged. */
  def ppsBernoulli(df: DataFrame, groupCol: String, idCol: Column,
                   weightCol: String, k: Int): DataFrame =
    ppsBernoulliWith(df, groupCol, idCol, weightCol, k,
      df.groupBy(col(groupCol)).agg(sum(col(weightCol)).as("total")))

  /** The CALIBRATED form of [[ppsBernoulli]]: per-group totals come from
    * the caller (yesterday's census, a control table) instead of a pass
    * over `df` — which makes the filter fully STATELESS and therefore
    * streaming-legal: admit rows of an unbounded stream at PPS rates
    * calibrated offline, one broadcast stream-static join, no
    * aggregation state. `totals` must be exactly (groupCol, total).
    *
    * UNKNOWN GROUPS — rows whose group is ABSENT from `totals` (a
    * brand-new group appearing in the stream after calibration): by
    * default they are DROPPED (`keepUnknownGroups = false`) — there is
    * no calibrated rate to admit them at, and the census that recounts
    * totals should see them before any are admitted. This is a POLICY
    * choice, not "sampled out": a monitoring census should read the
    * pre-filter stream, and the drop count is new-group arrivals, not
    * PPS rejections. Pass `keepUnknownGroups = true` for the
    * admit-then-recalibrate posture (admit every row of a group with no
    * known total — conservative for data retention, unbounded until the
    * next calibration). */
  def ppsBernoulliWith(df: DataFrame, groupCol: String, idCol: Column,
                       weightCol: String, k: Int, totals: DataFrame,
                       keepUnknownGroups: Boolean = false): DataFrame = {
    require(k >= 1, s"ppsBernoulli: k=$k")
    val reserved = Seq("__u", "__W").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"reserved scratch columns present: ${reserved.mkString(", ")}")
    require(totals.columns.toSet == Set(groupCol, "total"),
      s"totals must be exactly ($groupCol, total), got " +
      totals.columns.mkString("(", ", ", ")"))
    // Operand precisions chosen so each product is exactly DECIMAL(38,0)
    // with no Spark precision-overflow null: u < 2^32 (10 digits),
    // W < 10^28; 2^32·k fits a long (k is Int), w < 10^19.
    val admit =
      col("__u").cast("decimal(10,0)") * col("__W").cast("decimal(28,0)") <
        lit(4294967296L * k).cast("decimal(19,0)") *
        col(weightCol).cast("decimal(19,0)")
    df.join(broadcast(totals.select(col(groupCol), col("total").as("__W"))),
        Seq(groupCol), "left")
      .withColumn("__u",
        conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long"))
      .filter(if (keepUnknownGroups) col("__W").isNull || admit
              else col("__W").isNotNull && admit)
      .drop("__u", "__W")
  }

  /** UniMax selection: given per-language budgets ([[unimaxBudgets]]),
    * keep each language's hash-ordered prefix of documents whose running
    * token total stays within the budget (a doc that would cross the
    * line is excluded). Hash order = the [[stratifiedExact]] discipline:
    * deterministic across runs/engines/cluster sizes, stable under data
    * growth. The per-language cumsum window is the exactness path (same
    * stratum-fits-a-task caveat as stratifiedExact — salt-split or
    * budget-threshold the hash space when one language dominates).
    * Returns the selected rows with (tokensCol, budget) attached. */
  def unimaxSelect(df: DataFrame, langCol: String, idCol: Column,
                   tokensCol: String, budgets: DataFrame): DataFrame = {
    val byHash = Window.partitionBy(col(langCol))
      .orderBy(graft.sketch.Kmv.hash60(idCol).asc, idCol.asc)
    df.join(broadcast(budgets.select(col(langCol), col("budget"))), Seq(langCol))
      .withColumn("__cum", sum(col(tokensCol)).over(byHash))
      .filter(col("__cum") <= col("budget"))
      .drop("__cum")
  }
}
