package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Deduplication operators for large text corpora, as reusable DataFrame
  * transformers. All hash choices are md5-derived so results are
  * deterministic and reproducible across engines and runs (no seed state
  * on executors).
  *
  * Scale notes (100 TB design): every stage is a map, a groupBy on a
  * bounded key, or a key-equality join — no driver collects. Signature
  * and band tables are O(n_docs); the candidate join's fan-out is the LSH
  * parameter choice (more rows per band = fewer, higher-precision
  * candidates), which is exactly the knob a 1000-executor run tunes.
  */
object Dedup {

  /** 64-bit (60-bit) deterministic token hash: first 15 md5 hex digits. */
  def tokenHash(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long")

  /** Exact duplicate groups by full-content hash.
    * Returns (contentHash, n, canonicalId) for groups with n > 1. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), md5(col(textCol)).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("canonical"))
      .filter(col("n") > 1)

  /** Word n-gram shingle array (distinct, sorted token-hash form). n=1
    * gives token-set semantics. */
  /** Sorted distinct 60-bit hashes of the word n-grams of `textCol` —
    * the set representation behind MinHash verify, n-gram jaccard, and
    * decontamination. Native one-pass kernel ([[graft.functions
    * .GraftFunctions.shingle_hashes]]); [[shinglesDeclarative]] is the
    * HOF reference implementation it is property-tested against. */
  def shingles(textCol: Column, n: Int): Column =
    org.apache.spark.sql.graftx.GraftExpr.ngramHashes(textCol, n, sortedDistinct = true)

  /** Declarative (built-ins only) equivalent of [[shingles]] — interpreter
    * -bound on the per-gram lambdas, kept as the oracle for NgramHashSpec. */
  def shinglesDeclarative(textCol: Column, n: Int): Column = {
    val toks = split(textCol, " ")
    val grams =
      if (n == 1) toks
      else transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    array_sort(array_distinct(transform(grams, g => tokenHash(g))))
  }

  /** MinHash signature columns `h0..h{k-1}`:
    * minhash_i = min(md5(i + "|" + shingle)). Lexicographic min of a
    * uniform hash is a valid minhash family. Computed MAP-SIDE per
    * document (array_min over a transform of the shingle array) — the
    * previous explode + groupBy shape shuffled every token row across the
    * cluster just to take 8 mins; this one shuffles nothing. */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       numHashes: Int, shingleN: Int = 1): DataFrame = {
    // Native one-pass kernel: k running digest minima per doc (MinhashSig);
    // the declarative equivalent (kept in minhashSignatureDeclarative for
    // the parity spec) interpreted k×grams md5 lambdas per row. The array
    // is computed in ONE projection and elements extracted in a second —
    // CollapseProject keeps non-cheap expressions single, so the kernel
    // runs once per row, not once per h_i (plan-asserted in NgramHashSpec).
    val sig = org.apache.spark.sql.graftx.GraftExpr
      .minhashSig(col(textCol), shingleN, numHashes)
    df.select(col(idCol).as("id"), sig.as("_sig"))
      .select(col("id") +:
        (0 until numHashes).map(i => element_at(col("_sig"), i + 1).as(s"h$i")): _*)
  }

  /** Declarative (built-ins only) equivalent of [[minhashSignature]] —
    * the reference the native kernel is property-tested against. */
  def minhashSignatureDeclarative(df: DataFrame, idCol: String, textCol: String,
                                  numHashes: Int, shingleN: Int = 1): DataFrame = {
    val toksArr = array_distinct(
      if (shingleN == 1) split(col(textCol), " ")
      else {
        val t = split(col(textCol), " ")
        transform(sequence(lit(0), size(t) - shingleN),
          i => concat_ws(" ", (0 until shingleN).map(k => element_at(t, i + k + 1)): _*))
      })
    val withToks = df.select(col(idCol).as("id"), toksArr.as("toks"))
    val cols = (0 until numHashes).map(i =>
      array_min(transform(col("toks"), t => md5(concat(lit(s"$i|"), t)))).as(s"h$i"))
    withToks.select((col("id") +: cols): _*)
  }

  /** LSH band table (id, band, key) from a signature DataFrame. ONE pass:
    * the per-band keys form an array column and `posexplode` yields
    * (band, key) rows — the previous union-of-selects shape re-evaluated
    * the entire signature subtree once PER BAND (B full corpus scans;
    * measured 22 parquet scans in the d2 plan before this). */
  def lshBands(sig: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val keys = array((0 until numBands).map { b =>
      val ks = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      md5(concat(ks: _*))
    }: _*)
    sig.select(col("id"), posexplode(keys).as(Seq("band", "key")))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates from band collisions,
    * verified with exact jaccard over hashed shingle sets.
    * Returns (id_a, id_b, jaccard) for pairs >= threshold. */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 8, rowsPerBand: Int = 4,
                 shingleN: Int = 1, threshold: Double = 0.9): DataFrame = {
    // The signature is the expensive subtree (corpus scan + shuffle) and
    // every stage below references it; Spark performs no CSE across those
    // branches, so persist the one O(n_docs × k) table instead of
    // re-aggregating per consumer (ContextCleaner reclaims the blocks
    // when the plan is GC'd).
    val sig = minhashSignature(df, idCol, textCol, numHashes, shingleN).persist()
    val bands = lshBands(sig, numHashes, rowsPerBand)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    // 100 TB shape: `sets` is O(corpus tokens) and must never be broadcast.
    // Prune it to the docs that survived banding (a tiny, broadcast-able id
    // set) before the verify joins; AQE picks broadcast iff a side fits.
    // The id set comes from hot-bucket membership (>= 2 docs ⇒ every member
    // pairs), so the quadratic pair join `cand` is evaluated exactly once —
    // in the verify below — never replayed to derive the ids.
    val hot = bands.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("nb")).filter(col("nb") > 1).drop("nb")
    val candIds = bands.join(hot, Seq("band", "key"), "left_semi")
      .select(col("id")).distinct()
    val sets = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("st"))
      .join(candIds, Seq("id"), "left_semi")
    val j = GraftFunctions.sorted_jaccard_long(col("sa.st"), col("sb.st"))
    cand
      .join(sets.as("sa"), col("id_a") === col("sa.id"))
      .join(sets.as("sb"), col("id_b") === col("sb.id"))
      .filter(j >= threshold)
      .select(col("id_a"), col("id_b"), j.as("jaccard"))
  }

  /** Densified ONE-PERMUTATION MinHash signature (Li, Owen & Zhang 2012;
    * densification: Shrivastava & Li 2014 — the modern production
    * minhash): ONE 60-bit hash per shingle routes it to bin
    * j = h mod k with value v = h div k; the signature's slot j is the
    * min v of its bin, and an EMPTY bin borrows from the nearest
    * non-empty bin to its right (cyclically), offset by t·densifyC per
    * step so borrowed values stay distinguishable. Collision probability
    * per slot equals the Jaccard similarity, same as k independent
    * minhashes — but the corpus is hashed ONCE instead of k times.
    *
    * Scale rationale: classic k-hash minhash ([[minhashSignature]])
    * evaluates k digests per shingle, and hashing the token stream IS
    * the dominant cost of minhash-LSH at 100 TB (the banding and verify
    * joins touch only signatures and candidates). OPH makes signature
    * construction one digest per shingle — a k× cut of the pipeline's
    * biggest term — at an accuracy loss the densification bounds. Plan
    * shape: explode → ONE groupBy(id) with k conditional mins (map-side
    * combined, ≤ k values per doc cross the wire), densification is a
    * pure projection (coalesce chain over the k bins). Deterministic:
    * fixed hash, fixed rotation — engine-replayable (query `d11`).
    * Returns (id, h0..h{k-1}) Long slots, null only for empty docs. */
  def ophSignature(df: DataFrame, idCol: String, textCol: String,
                   k: Int, shingleN: Int = 1,
                   densifyC: Long = 1L << 44): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val toks = df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), shingleN)).as("hv"))
    val bins = (0 until k).map(j =>
      min(when(pmod(col("hv"), lit(k.toLong)) === j, expr(s"hv div $k"))).as(s"m$j"))
    val m = toks.groupBy(col("id")).agg(bins.head, bins.tail: _*)
    val slots = (0 until k).map { j =>
      coalesce((0 until k).map(t =>
        col(s"m${(j + t) % k}") + lit(t.toLong * densifyC)): _*).as(s"h$j")
    }
    m.select(col("id") +: slots: _*)
  }

  /** SimHash fingerprint (nBits <= 32) over distinct tokens. Compare with
    * [[graft.functions.GraftFunctions.hamming_dist]]. Token hash width
    * follows nBits: 4 md5 hex chars (16 bits) up to nBits=16 — the d3
    * oracle's exact form — else 8 chars (32 bits). */
  def simhash(df: DataFrame, idCol: String, textCol: String, nBits: Int = 16): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .withColumn("h",
        if (nBits <= 16) conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("int")
        else conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
    val sums = (0 until nBits).map(j =>
      sum(when((shiftright(col("h"), j) % 2) === 1, 1).otherwise(-1)).as(s"s$j"))
    val agg = toks.groupBy(col("id")).agg(sums.head, sums.tail: _*)
    val value = (0 until nBits).map(j =>
      when(col(s"s$j") > 0, 1L << j).otherwise(0L)).reduce(_ + _)
    agg.select(col("id"), value.as("simhash"))
  }

  /** Multi-index SimHash near-dup pairs within `maxHamming` — the
    * web-crawl dedup shape: split the nBits fingerprint into `bands`
    * equal segments; by pigeonhole a pair with hamming <= bands-1 agrees
    * on at least one WHOLE segment, so candidates come from an equi-join
    * on (band, segment value) — never the n² pair space — and the exact
    * distance verify is the codegen'd `hamming_dist`. Recall is exact for
    * maxHamming < bands. */
  def simhashNear(df: DataFrame, idCol: String, textCol: String,
                  nBits: Int = 16, bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(nBits % bands == 0, s"nBits $nBits must divide into $bands bands")
    require(maxHamming < bands, "pigeonhole needs maxHamming < bands")
    val seg = nBits / bands
    val sh = simhash(df, idCol, textCol, nBits)
    // one pass over the fingerprint table (posexplode), not one
    // re-aggregation per band — see lshBands
    val segKeys = array((0 until bands).map(b =>
      shiftright(col("simhash"), b * seg) % (1 << seg)): _*)
    val banded = sh.select(col("id"), col("simhash"),
      posexplode(segKeys).as(Seq("band", "key")))
    // First-colliding-band ownership: band b emits a pair only when no
    // earlier segment also matches, so each pair appears exactly once —
    // identical fingerprints (the skewed common case) collide in EVERY
    // band, and a distinct() here would shuffle the pair space ×bands.
    // Carrying the fingerprint also removes the two verify re-joins.
    val noEarlier = (0 until bands - 1).map { i =>
      (col("a.band") <= i) ||
        (shiftright(col("a.simhash"), i * seg) % (1 << seg)) =!=
        (shiftright(col("b.simhash"), i * seg) % (1 << seg))
    }.reduce(_ && _)
    val hd = GraftFunctions.hamming_dist(col("a.simhash"), col("b.simhash"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .filter(noEarlier)
      .filter(hd <= maxHamming)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), hd.as("hamming"))
  }

  /** Brute-force n-gram jaccard over all pairs — the EXACTNESS BASELINE,
    * deliberately quadratic: the `a.id < b.id` theta join is a cartesian
    * with a filter, O(n²) candidates with no pruning. That is the right
    * tool for a bounded slice (a verification sample, an LSH bucket's
    * members, a golden fixture) and a corpus-killer for anything else, so
    * the function REFUSES unbounded inputs: unless `allowFullCross=true`,
    * it counts the input first (one cheap aggregate on a frame this small
    * by assumption) and throws loudly above `maxRows`, pointing at
    * [[minhashLsh]] — the same fail-loudly discipline as
    * [[connectedComponents]]' fixpoint check. At 100 TB nothing reaches
    * this function without LSH pruning; the guard makes that a contract
    * instead of a comment. */
  /** Asymmetric CONTAINMENT join — find (a, b) pairs where at least
    * `tPermille`/1000 of a's shingle set lies inside b's
    * (C(a→b) = |S(a) ∩ S(b)| / |S(a)|, Broder 1997 "containment"):
    * quotes, excerpt pages, wrapper-around-original boilerplate — the
    * near-dup class Jaccard-based LSH structurally MISSES, because a
    * short doc fully contained in a long one has tiny Jaccard (|A|/|B|)
    * and its MinHash signatures disagree almost everywhere.
    *
    * Candidate generation is the PREFIX FILTER of the set-similarity-
    * join family (Chaudhuri, Ganti, Kaushik ICDE 2006; Xiao et al.
    * PPJoin): order the gram universe globally by (docfreq, gram) —
    * rarest first — and take each probe doc's first
    * |A| − ⌈t·|A|⌉ + 1 grams in that order. Pigeonhole: if C(a→b) ≥ t,
    * fewer than that many of a's grams can miss b, so at least one
    * PREFIX gram of a is in b — an equi-join of prefixes against the
    * full inverted index is a LOSSLESS candidate generator. Because
    * prefixes take the RAREST grams, the join keys are low-docfreq by
    * construction: candidate volume is Σ_g |prefix probes of g|·df(g)
    * over rare g, never all-pairs, and the worst skew key is bounded by
    * the census (the common grams that would explode the join never
    * enter a prefix unless t is very low and docs are tiny).
    *
    * All thresholds are integer permille (⌈t·|A|⌉ = (t·|A| + 999) div
    * 1000), so the whole pipeline — census, prefix rank, pigeonhole
    * size, verify — is exact integer arithmetic any engine replays.
    * Verify is one merge-pass intersect count
    * ([[GraftFunctions.sorted_intersect_long]]) on the candidate pairs
    * only. Returns (id_a, id_b, n_a, inter, cont_pm) with
    * cont_pm = (inter·1000) div |S(a)| ≥ tPermille, id_a ≠ id_b (both
    * directions reported independently — containment is asymmetric). */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int, tPermille: Int): DataFrame = {
    require(tPermille >= 1 && tPermille <= 1000,
      s"tPermille must be in [1, 1000] (got $tPermille)")
    val grams = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("gs"))
      .filter(size(col("gs")) > 0)
    val occ = grams.select(col("id"), explode(col("gs")).as("g"))
    // global rarity order: docfreq census over distinct (doc, gram)
    val dfreq = occ.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // prefix size p = |A| - ceil(t*|A|/1000) + 1 (pigeonhole bound)
    val pw = Window.partitionBy(col("id")).orderBy(col("df"), col("g"))
    val ceilT = {
      // ceil(t·|A|/1000) in exact integers: (x − x mod 1000) / 1000 on
      // the nudged numerator (the repo's pmod floor-division pattern)
      val x = col("na") * tPermille + 999
      ((x - pmod(x, lit(1000))) / 1000).cast("long")
    }
    val prefixes = occ.join(dfreq, Seq("g"))
      .withColumn("rn", row_number().over(pw))
      .join(grams.select(col("id"), size(col("gs")).as("na")), Seq("id"))
      .filter(col("rn") <= col("na") - ceilT + 1)
      .select(col("id").as("id_a"), col("g"))
    val inv = occ.select(col("id").as("id_b"), col("g"))
    val cand = prefixes.join(inv, Seq("g"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val inter = GraftFunctions.sorted_intersect_long(col("a.gs"), col("b.gs"))
    cand.join(grams.as("a"), col("id_a") === col("a.id"))
      .join(grams.as("b"), col("id_b") === col("b.id"))
      .select(col("id_a"), col("id_b"), size(col("a.gs")).cast("long").as("n_a"),
        inter.cast("long").as("inter"))
      .withColumn("cont_pm",
        ((col("inter") * 1000 - pmod(col("inter") * 1000, col("n_a"))) / col("n_a"))
          .cast("long"))
      .filter(col("cont_pm") >= tPermille)
  }

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxRows: Long = 100000L,
                        allowFullCross: Boolean = false): DataFrame = {
    if (!allowFullCross) {
      val rows = df.count()
      require(rows <= maxRows,
        s"ngramJaccardPairs: input has $rows rows > maxRows=$maxRows; the " +
        "all-pairs theta join is O(n^2) and would cartesian the corpus. " +
        "Use Dedup.minhashLsh for candidate generation (then verify the " +
        "candidate pairs), raise maxRows, or pass allowFullCross=true if " +
        "the input really is a bounded slice.")
    }
    val grams = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("gs"))
    val j = GraftFunctions.sorted_jaccard_long(col("a.gs"), col("b.gs"))
    grams.as("a").join(grams.as("b"), col("a.id") < col("b.id"))
      .filter(j >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), j.as("jaccard"))
  }

  /** The EVALUATE member of the dedup family ([[graft.ann.Ann]]'s
    * recall-census twin, v22): the MEASURED LSH S-curve. Ground truth is
    * the exact all-pairs n-gram Jaccard over a bounded evaluation slice
    * ([[ngramJaccardPairs]]'s guard applies — recall evaluation is
    * exact-search-priced by definition, so it runs on a SLICE, never the
    * corpus); candidates are the banding pair space at (numHashes,
    * rowsPerBand). The census buckets truth pairs by Jaccard decile and
    * reports the empirical candidate-hit rate per bucket — the measured
    * form of the collision model P[cand] = 1 − (1 − j^r)^b that every
    * (numHashes, rowsPerBand) sizing decision reads off. Returns
    * (jac_band, n_pairs, n_cand, hit_ppm), hit_ppm an exact integer div.
    * Disjoint pairs (j = 0) are excluded — they are the no-signal mass. */
  def lshRecallCensus(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 8, rowsPerBand: Int = 4,
                      shingleN: Int = 1, maxRows: Long = 20000L): DataFrame = {
    val truth = ngramJaccardPairs(df, idCol, textCol, shingleN,
        threshold = 0.0, maxRows)
      .filter(col("jaccard") > 0.0)
    val sig = minhashSignature(df, idCol, textCol, numHashes, shingleN)
    val bands = lshBands(sig, numHashes, rowsPerBand)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
      .withColumn("hit", lit(1L))
    truth.join(cand, Seq("id_a", "id_b"), "left")
      .withColumn("jac_band", floor(col("jaccard") * 10).cast("int"))
      .groupBy(col("jac_band"))
      .agg(count(lit(1)).as("n_pairs"),
           sum(coalesce(col("hit"), lit(0L))).as("n_cand"))
      .withColumn("hit_ppm", expr("(n_cand * 1000000) div n_pairs"))
      .orderBy(col("jac_band"))
  }

  /** Exact duplicated-SPAN removal — the substring-level dedup of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (suffix-array ExactSubstr), re-expressed as a distributed
    * n-gram coverage problem: any token run of length >= n that occurs
    * more than once in the corpus is covered by at least one duplicated
    * n-gram, and conversely every duplicated n-gram IS a repeated
    * n-token run — so deleting exactly the tokens covered by duplicated
    * n-grams deletes exactly the >= n-token repeated substrings, without
    * any global suffix array. Within-doc repeats count (a doc repeating
    * its own boilerplate twice has both copies removed, same as
    * ExactSubstr).
    *
    * Scale shape: positional gram hashes are a single codegen pass per
    * doc ([[org.apache.spark.sql.graftx.NgramHash]] — no per-gram string
    * churn); the duplicate census is ONE groupBy on the 60-bit gram hash
    * (map-side combined, uniformly distributed keys — no skew by
    * construction); duplicated starts come back by equi-join on that
    * same hash (AQE reuses the census exchange). Coverage is then
    * per-doc LOCAL math: starts collect to a per-doc array (size = that
    * doc's duplicated-gram count, not corpus-sized) and a codegen HOF
    * marks covered positions — O(len · |starts|) per doc, no further
    * shuffle. Returns one row per input doc:
    * (id, n_tokens, n_removed, kept_text) where kept_text is the doc
    * with covered tokens deleted (empty string if everything was).
    */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                            n: Int): DataFrame = {
    val toks = spanToks(df, idCol, textCol, n)
    val grams = toks.select(col("id"), posexplode(col("gh")).as(Seq("p", "g")))
    val dup = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).select(col("g"))
    rewriteCovered(toks, grams, dup, n)
  }

  /** (id, tk, gh) token/positional-gram-hash frame — persisted: three
    * consumers (gram census, duplicated-starts join, final rewrite join),
    * and the upstream may be a whole filter pipeline (see x14) that must
    * not be re-scanned per branch; ContextCleaner reclaims the blocks
    * when the plan is GC'd (the d2/d5 discipline). */
  private def spanToks(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("tk"),
      org.apache.spark.sql.graftx.GraftExpr
        .ngramHashes(col(textCol), n, sortedDistinct = false).as("gh"))
      .persist()

  /** Shared rewrite stage: join the duplicated gram set back to start
    * positions, then per-doc-local HOF coverage math — no further
    * shuffle. Returns (id, n_tokens, n_removed, kept_text). */
  private def rewriteCovered(toks: DataFrame, grams: DataFrame,
                             dup: DataFrame, n: Int): DataFrame = {
    val starts = grams.join(dup, Seq("g"))
      .groupBy(col("id")).agg(collect_list(col("p")).as("starts"))
    // the O(len·|starts|) coverage scan runs ONCE per doc: materialize the
    // kept-position array in its own projection, then derive n_removed and
    // kept_text from that array (both derivations are O(len))
    toks.join(starts, Seq("id"), "left")
      .select(col("id"), col("tk"),
        coalesce(col("starts"), array().cast("array<int>")).as("ss"))
      .select(col("id"), col("tk"),
        expr(s"filter(sequence(0, size(tk) - 1), " +
          s"t -> NOT exists(ss, s -> s <= t AND t < s + $n))").as("kept"))
      .select(col("id"),
        size(col("tk")).cast("long").as("n_tokens"),
        (size(col("tk")) - size(col("kept"))).cast("long").as("n_removed"),
        expr("concat_ws(' ', transform(kept, t -> element_at(tk, t + 1)))")
          .as("kept_text"))
  }

  /** The STORED gram index for incremental span dedup: the (g, c)
    * occurrence census of the accumulated corpus. Build once at ingest,
    * write to a bucketed/partitioned table, and feed [[admitSpans]] each
    * day — the span-dedup twin of [[buildIndex]]/`Ann.assign`. */
  def spanIndex(df: DataFrame, idCol: String, textCol: String,
                n: Int): DataFrame =
    spanToks(df, idCol, textCol, n)
      .select(col("id"), posexplode(col("gh")).as(Seq("p", "g")))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))

  /** Fold a new batch's gram census into the stored index — the nightly
    * index maintenance step after [[admitSpans]]: counts add, so
    * `mergeSpanIndex(spanIndex(old), spanIndex(batch)) ==
    * spanIndex(old ∪ batch)` exactly (pinned by DedupSpec). One
    * union + groupBy on the uniform 60-bit key; at 100 TB this is the
    * only operation that ever touches the full index, and it is a plain
    * additive merge a bucketed table makes shuffle-free. */
  def mergeSpanIndex(index: DataFrame, delta: DataFrame): DataFrame =
    index.select(col("g"), col("c")).union(delta.select(col("g"), col("c")))
      .groupBy(col("g")).agg(sum(col("c")).as("c"))

  /** Incremental duplicated-span removal — the daily-ingest path: rewrite
    * a NEW batch against the accumulated corpus WITHOUT re-scanning it.
    * A new-batch gram is duplicated iff it already occurs in the stored
    * index (any new occurrence of existing text is a repeat — the old
    * corpus is immutable and stays as ingested) OR it occurs more than
    * once within the batch itself. Cost at 100 TB: the old corpus
    * contributes only its gram census (built once by [[spanIndex]],
    * merged additively batch over batch); each day pays one batch-sized
    * gram pass plus an equi-join against the index — never a second scan
    * of history. Exactly [[removeDuplicatedSpans]]' rewrite semantics on
    * the batch side, so `spanIndex(old) + admitSpans(new)` equals the
    * full-corpus rerun restricted to the new docs (pinned by DedupSpec).
    */
  def admitSpans(newDf: DataFrame, index: DataFrame,
                 idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = spanToks(newDf, idCol, textCol, n)
    val grams = toks.select(col("id"), posexplode(col("gh")).as(Seq("p", "g")))
    val dup = grams.groupBy(col("g")).agg(count(lit(1)).as("cn"))
      .join(index.select(col("g"), col("c")), Seq("g"), "left")
      .filter(col("cn") + coalesce(col("c"), lit(0L)) > 1)
      .select(col("g"))
    rewriteCovered(toks, grams, dup, n)
  }

  /** Verified STAR edges from MinHash-LSH banding: each hot-bucket member
    * is joined to its bucket's min-id root (never to every other member),
    * and the (root, member) edge survives iff exact jaccard >= threshold.
    * This is the connectivity input for [[dedupCorpus]] — for cluster
    * FORMATION a spanning star per bucket connects exactly the same docs
    * as the all-pairs join, while emitting Σ(m−1) edges per bucket instead
    * of Σ m(m−1)/2. That quadratic term is the LSH skew bomb: a crawl
    * corpus with a 10⁵-copy boilerplate cluster yields 5·10⁹ pairs
    * all-pairs but 10⁵ star edges (measured on the sf0.1 fixture: 190 891
    * pairs → 4 882 edges). Trade-off, documented: two members of a
    * COLLISION bucket that are similar to each other but not to the root
    * no longer connect — acceptable for near-dup removal, where bucket
    * collisions below threshold are noise by definition. [[minhashLsh]]
    * keeps the reference all-PAIRS listing semantics for callers that
    * need every verified pair (d2). */
  def minhashStarEdges(df: DataFrame, idCol: String, textCol: String,
                       numHashes: Int = 8, rowsPerBand: Int = 4,
                       shingleN: Int = 1, threshold: Double = 0.9): DataFrame = {
    val sig = minhashSignature(df, idCol, textCol, numHashes, shingleN).persist()
    val bands = lshBands(sig, numHashes, rowsPerBand)
    val roots = bands.groupBy(col("band"), col("key"))
      .agg(min(col("id")).as("root"), count(lit(1)).as("m"))
      .filter(col("m") > 1).drop("m")
    val cand = bands.join(roots, Seq("band", "key"))
      .filter(col("id") =!= col("root"))
      .select(col("root").as("id_a"), col("id").as("id_b")).distinct()
    // Token-set table pruned to candidate endpoints before the verify
    // joins (same discipline as minhashLsh: never broadcast the corpus-
    // sized set table; the candidate id set is tiny and semi-joins it).
    val candIds = cand.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val sets = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("st"))
      .join(candIds, Seq("id"), "left_semi")
    val j = GraftFunctions.sorted_jaccard_long(col("sa.st"), col("sb.st"))
    cand
      .join(sets.as("sa"), col("id_a") === col("sa.id"))
      .join(sets.as("sb"), col("id_b") === col("sb.id"))
      .filter(j >= threshold)
      .select(col("id_a"), col("id_b"), j.as("jaccard"))
  }

  /** End-to-end near-duplicate REMOVAL — the one-call form of the
    * training-data pipeline chain: verified star edges
    * ([[minhashStarEdges]] — linear in bucket size where the all-pairs
    * listing is quadratic) → duplicate clusters
    * ([[connectedComponents]]) → keep each cluster's min-id
    * representative and drop the rest. Returns `df` minus the
    * non-representative near-dups; rows in no dup pair pass through
    * untouched. Scale shape: the anti-join key set is O(dup rows), tiny
    * relative to the corpus, and every stage inherits the bucketed /
    * lineage-truncated designs of its building blocks. */
  def dedupCorpus(df: DataFrame, idCol: String, textCol: String,
                  numHashes: Int = 8, rowsPerBand: Int = 4,
                  shingleN: Int = 1, threshold: Double = 0.9): DataFrame = {
    val edges = minhashStarEdges(df, idCol, textCol, numHashes, rowsPerBand,
      shingleN, threshold).select(col("id_a"), col("id_b"))
    val comp = connectedComponents(edges)
    val losers = comp.filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** The stored-index pair consumed by [[admitIncrement]]: the LSH band
    * table `(id, band, key)` and the shingle-set table `(id, st)` for a
    * corpus. Build once when the corpus is (re)built, write both to
    * parquet (bucket by `id` for join locality), and feed every
    * subsequent increment — the corpus itself is never re-read. */
  def buildIndex(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 8, rowsPerBand: Int = 4,
                 shingleN: Int = 1): (DataFrame, DataFrame) = {
    val bands = lshBands(
      minhashSignature(df, idCol, textCol, numHashes, shingleN), numHashes, rowsPerBand)
    val sets = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("st"))
    (bands, sets)
  }

  /** Single-table admission index `(id, st, band, key)` — the v2 shape of
    * [[buildIndex]] where the document's shingle set RIDES each band row,
    * so [[admitIncrementFused]] can verify exact jaccard INLINE in the
    * band-collision join with no set-table joins at all. Built join-free:
    * one projection computes the signature array AND the shingle set, then
    * `posexplode` of the per-band keys (byte-identical to [[lshBands]]
    * keys, so v1 and v2 indexes of the same corpus collide identically).
    *
    * Trade-off, stated: the index stores `st` once per band row
    * (numBands× the bytes of the separate sets table) to delete two
    * corpus-index joins, two semi-joins and two candidate `distinct`s per
    * increment — measured 19.7 s → 3.3 s of task time on the s9 admission
    * stream. At numBands=2 the byte overhead is 2×; for wide banding
    * (numBands ≥ 8) prefer the two-table [[buildIndex]]/[[admitIncrement]]
    * pair. */
  def buildAdmitIndex(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 8, rowsPerBand: Int = 4,
                      shingleN: Int = 1): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val sig = org.apache.spark.sql.graftx.GraftExpr
      .minhashSig(col(textCol), shingleN, numHashes)
    val withSig = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("st"), sig.as("_sig"))
    val keys = array((0 until numBands).map { b =>
      val ks = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => element_at(col("_sig"), i + 1))
      md5(concat(ks: _*))
    }: _*)
    withSig.select(col("id"), col("st"), posexplode(keys).as(Seq("band", "key")))
  }

  /** [[admitIncrement]] with verification FUSED into the collision join —
    * same admission semantics (a new doc is rejected iff it verifies at
    * `>= threshold` exact jaccard against an old doc sharing any band key,
    * or against its own bucket's min-id root), same admitted set
    * (property-tested against [[admitIncrement]] in DedupSpec), one third
    * the stages: the old side is the single-table [[buildAdmitIndex]]
    * `(id, st, band, key)`, so collision and verify are ONE join and the
    * candidate `distinct`s collapse into the final rejected-id distinct
    * (a duplicate collision just re-evaluates one cheap jaccard).
    *
    * Returns `(admitted, batchIdx)`: `admitted` = `newDf` minus rejected
    * rows; `batchIdx` = the EAGERLY CHECKPOINTED v2 index rows of the
    * whole batch (the one action this function runs — the O(new) frame
    * every downstream branch reuses). Append the admitted rows' index as
    * `batchIdx.join(admittedIds, Seq("id"), "left_semi")` — O(new), the
    * stored corpus index is never rewritten.
    *
    * Scale contract: every broadcast side is O(new)- or O(candidate)-
    * bounded (`batchIdx`, bucket roots, rejected ids) — the micro-batch
    * admission shape where new ≪ corpus. The corpus index itself streams
    * map-side through one join and never shuffles or broadcasts. For a
    * corpus-sized "increment" (backfill), use [[dedupCorpus]] on the
    * union instead. */
  def admitIncrementFused(newDf: DataFrame, idCol: String, textCol: String,
                          oldIdx: DataFrame,
                          numHashes: Int = 8, rowsPerBand: Int = 4,
                          shingleN: Int = 1, threshold: Double = 0.9)
      : (DataFrame, DataFrame) = {
    val batchIdx = buildAdmitIndex(newDf, idCol, textCol, numHashes,
      rowsPerBand, shingleN).localCheckpoint(true)
    val j = GraftFunctions.sorted_jaccard_long(col("n.st"), col("o.st"))
    val rejOld = broadcast(batchIdx).as("n").join(oldIdx.as("o"),
        col("n.band") === col("o.band") && col("n.key") === col("o.key"))
      .filter(j >= threshold).select(col("n.id").as("id"))
    // min_by carries the root's shingle set out of the same aggregation,
    // so the new×new star check needs no second pass over the batch
    val roots = batchIdx.groupBy(col("band"), col("key"))
      .agg(min(col("id")).as("rid"), min_by(col("st"), col("id")).as("rst"),
        count(lit(1)).as("m"))
      .filter(col("m") > 1).drop("m")
    val jr = GraftFunctions.sorted_jaccard_long(col("n.st"), col("r.rst"))
    val rejNew = batchIdx.as("n").join(broadcast(roots).as("r"),
        col("n.band") === col("r.band") && col("n.key") === col("r.key"))
      .filter(col("n.id") =!= col("r.rid") && jr >= threshold)
      .select(col("n.id"))
    val rejected = rejOld.union(rejNew).distinct()
    val admitted = newDf.join(
      broadcast(rejected.withColumnRenamed("id", idCol)), Seq(idCol), "left_anti")
    (admitted, batchIdx)
  }

  /** Incremental near-dup ADMISSION — the daily-ingest shape: decide which
    * NEW documents enter an already-deduplicated corpus without ever
    * re-pairing the old corpus against itself. The old side participates
    * only through its STORED index: `oldBands` (id, band, key) and
    * `oldSets` (id, st) — the same tables [[lshBands]] / [[shingles]]
    * produce when the corpus is built, persisted once and reused every
    * increment. Candidates are (a) new×old band collisions and (b)
    * new×new bucket-star edges ([[minhashStarEdges]] discipline); a new
    * doc is rejected iff a candidate verifies at `>= threshold` exact
    * jaccard against an old doc or against its own bucket's min-id root.
    * Returns `newDf` minus the rejected rows.
    *
    * Scale shape: per increment the work is O(new) signatures + equi-joins
    * keyed on (band, key) — the old CORPUS is never scanned, only its
    * O(old) index tables, and the verify set tables are semi-join-pruned
    * to candidate endpoints before any join (never broadcast). */
  def admitIncrement(newDf: DataFrame, idCol: String, textCol: String,
                     oldBands: DataFrame, oldSets: DataFrame,
                     numHashes: Int = 8, rowsPerBand: Int = 4,
                     shingleN: Int = 1, threshold: Double = 0.9): DataFrame = {
    val sigNew = minhashSignature(newDf, idCol, textCol, numHashes, shingleN)
    // three consumers (old-collision join, root census, star edges) — and
    // Spark does no CSE across branches, so persist the small band table
    val bandsNew = lshBands(sigNew, numHashes, rowsPerBand).persist()
    val candOld = bandsNew.as("n").join(oldBands.as("o"),
        col("n.band") === col("o.band") && col("n.key") === col("o.key"))
      .select(col("n.id").as("id_new"), col("o.id").as("id_old")).distinct()
    val roots = bandsNew.groupBy(col("band"), col("key"))
      .agg(min(col("id")).as("root"), count(lit(1)).as("m"))
      .filter(col("m") > 1).drop("m")
    val candNew = bandsNew.join(roots, Seq("band", "key"))
      .filter(col("id") =!= col("root"))
      .select(col("root").as("id_a"), col("id").as("id_b")).distinct()
    val newIds = candOld.select(col("id_new").as("id"))
      .union(candNew.select(explode(array(col("id_a"), col("id_b"))).as("id")))
      .distinct()
    val newSets = newDf
      .select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("st"))
      .join(newIds, Seq("id"), "left_semi").persist()
    val oldSetsPruned = oldSets
      .join(candOld.select(col("id_old").as("id")).distinct(), Seq("id"), "left_semi")
    val j = GraftFunctions.sorted_jaccard_long(col("sa.st"), col("sb.st"))
    val rej1 = candOld
      .join(newSets.as("sa"), col("id_new") === col("sa.id"))
      .join(oldSetsPruned.as("sb"), col("id_old") === col("sb.id"))
      .filter(j >= threshold).select(col("id_new"))
    val rej2 = candNew
      .join(newSets.as("sa"), col("id_a") === col("sa.id"))
      .join(newSets.as("sb"), col("id_b") === col("sb.id"))
      .filter(j >= threshold).select(col("id_b").as("id_new"))
    newDf.join(rej1.union(rej2).distinct().withColumnRenamed("id_new", idCol),
      Seq(idCol), "left_anti")
  }

  /** Train/eval decontamination scoring — the standard LLM-pipeline check
    * that training documents do not contain the evaluation set (n-gram
    * overlap, the public WiMBD / GPT-3 appendix-C shape). For every train
    * document: the number of its distinct word `shingleN`-grams that occur
    * anywhere in `evalDf`, plus the contamination ratio `matched/n_grams`.
    * Callers drop rows above a threshold or histogram the ratio.
    *
    * Scale shape: grams are 60-bit hashes (not strings) so the join key is
    * 8 bytes; the eval gram set is O(eval corpus) — tiny next to train —
    * so AQE broadcasts it and the single pass over train grams never
    * shuffles (one corpus scan, one map-side-combined groupBy on doc id).
    * Documents shorter than `shingleN` tokens are excluded (no grams). */
  def decontaminate(train: DataFrame, evalDf: DataFrame,
                    idCol: String, textCol: String,
                    shingleN: Int = 3): DataFrame = {
    def grams(d: DataFrame) =
      d.filter(size(split(col(textCol), " ")) >= shingleN)
        .select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("gs"))
    val evalGrams = grams(evalDf).select(explode(col("gs")).as("g")).distinct()
      .withColumn("hit", lit(1L))
    grams(train)
      .select(col("id"), explode(col("gs")).as("g"))
      .join(evalGrams, Seq("g"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
           coalesce(sum(col("hit")), lit(0L)).as("matched"))
      .select(col("id"), col("n_grams"), col("matched"),
        (col("matched").cast("double") / col("n_grams")).as("contamination"))
  }

  /** [[decontaminate]] with a bloom pre-filter — the 100 TB shape for
    * when the eval-gram set outgrows a cheap broadcast hash join. The
    * eval grams fold DISTRIBUTED into Spark's own runtime-filter sketch
    * (`BloomFilterAggregate`, mergeable, map-side combined); only the
    * KB–MB sketch ever reaches the driver — the size class of a
    * broadcast dim, ~10 bits per gram vs the 100+ bits/entry of a
    * broadcast hash relation. Train grams then probe the sketch inside
    * whole-stage codegen at the scan, and ONLY probable hits enter the
    * exact verify join; per-doc totals come from a separate map-side
    * combinable count that never joins. False positives are swept out by
    * the exact join, false negatives cannot happen — results are
    * bit-identical to [[decontaminate]] (pinned by DedupSpec).
    * `fpBits` sizes the sketch (bits per expected eval gram). */
  def decontaminateBloom(train: DataFrame, evalDf: DataFrame,
                         idCol: String, textCol: String,
                         shingleN: Int = 3, fpBits: Int = 10): DataFrame = {
    def grams(d: DataFrame) =
      d.filter(size(split(col(textCol), " ")) >= shingleN)
        .select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("gs"))
    // three consumers (count, sketch fold, exact verify join) — persist
    // once like d2/d5's signature tables; ContextCleaner reclaims on GC
    val evalGrams = grams(evalDf).select(explode(col("gs")).as("g")).distinct()
      .persist()
    val est = math.max(evalGrams.count(), 1L) // one small count job
    val bloom = evalGrams
      .agg(graft.functions.GraftFunctions.bloom_agg(col("g"), est, est * fpBits))
      .head.getAs[Array[Byte]](0)
    val tg = grams(train).select(col("id"), explode(col("gs")).as("g"))
    val totals = tg.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
    val matched = tg
      .filter(graft.functions.GraftFunctions.bloom_contains(bloom, col("g")))
      .join(evalGrams, Seq("g"))
      .groupBy(col("id")).agg(count(lit(1)).as("matched"))
    totals.join(matched, Seq("id"), "left")
      .select(col("id"), col("n_grams"),
        coalesce(col("matched"), lit(0L)).as("matched"))
      .withColumn("contamination",
        col("matched").cast("double") / col("n_grams"))
  }

  /** cap+1 as a safe Int for limit(): a size-route gate only asks "more
    * than cap rows?", so a limit-bounded count prices it O(cap)
    * regardless of input size. Shared by every size-routed op
    * (connectedComponents, Scc, KCore). */
  private[graft] def capPlusOne(cap: Long): Int =
    (math.min(cap, Int.MaxValue - 2L) + 1L).toInt

  /** True when the analyzed plan is an already-materialized relation (a
    * LogicalRDD from a prior localCheckpoint, a LocalRelation) or a thin
    * attribute/alias/cast projection over one — re-evaluating such a plan
    * is a cached-block scan, so checkpointing it AGAIN would only pay a
    * second edge-sized materialization for nothing. */
  @scala.annotation.tailrec
  private def isMaterialized(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _: LocalRelation => true
      case s: SubqueryAlias => isMaterialized(s.child)
      case pr: Project if pr.projectList.forall(isThinExpr) =>
        isMaterialized(pr.child)
      case _ => false
    }
  }

  private def isThinExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    e match {
      case _: Attribute => true
      case a: Alias => isThinExpr(a.child)
      case c: Cast => isThinExpr(c.child)
      case _ => false
    }
  }

  /** Connected components over a dup-pair edge list — the cluster-forming
    * step that turns pairwise near-dup output (d2/d4/d5 pairs) into
    * keep-one groups. Hash-min label propagation with pointer jumping:
    * each round every node takes the min label in its neighborhood AND
    * labels chase their own label's label, so convergence is
    * O(log diameter) shuffle rounds — the standard large-graph CC shape
    * (each round is two shuffle joins; no driver-side graph state, only a
    * convergence counter). Input: (id_a, id_b) Long edges. Output:
    * (node, component) where component = min node id reachable.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
                          localCap: Long = 262144L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // evaluate the upstream pipeline ONCE (it is typically a whole dedup
    // chain), then SIZE-ROUTE: an edge list that fits one task is
    // union-found in memory — one job, zero label-propagation rounds
    // (the r47/stitch routing discipline, applied at the source all
    // CC consumers share); bigger graphs take the min-label +
    // pointer-jump loop below. Labels are identical either way: the
    // component-minimum node id.
    // Skip the checkpoint when the caller ALREADY materialized the edges
    // (a LogicalRDD from a prior localCheckpoint, or a LocalRelation, or
    // a thin cast/rename projection over one): re-running that projection
    // over cached blocks per use is cheaper than a second edge-sized
    // materialization pass.
    val castEdges = edges.toDF("a", "b")
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    val e = if (isMaterialized(edges.queryExecution.analyzed)) castEdges
            else castEdges.localCheckpoint(true)
    // O(cap) gate: the route choice needs only "more than localCap
    // edges?" — limit(cap+1) prices it cap-bounded regardless of input
    // size (the Equalize/Ann limit-then-check pattern)
    if (e.limit(capPlusOne(localCap)).count() <= localCap) {
      return e.as[(Long, Long)].coalesce(1).mapPartitions { it =>
        val parent = new scala.collection.mutable.HashMap[Long, Long]()
        def find(x0: Long): Long = {
          var x = x0
          while (parent(x) != x) {
            parent(x) = parent(parent(x)); x = parent(x)
          }
          x
        }
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          // attach the larger root under the smaller: the final root of
          // every component is its minimum member
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keysIterator.map(k => (k, find(k))).toArray.iterator
      }.toDF("node", "component")
    }
    // symmetrize via explode, not a self-union: the edge list is typically
    // the output of a whole dedup pipeline, and a union would evaluate
    // that pipeline once per branch (Spark does no CSE across branches)
    val sym = e.select(explode(array(
        struct($"a", $"b"), struct($"b".as("a"), $"a".as("b")))).as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"))
      .distinct().localCheckpoint(true)
    // Each round references the previous labels several times (neighbor
    // join + pointer-jump self-join), so the logical plan would double
    // per iteration without truncation — localCheckpoint cuts the lineage
    // to the materialized result (on a fault-tolerant cluster, set a
    // checkpoint dir and swap in .checkpoint()).
    var labels = sym.select($"a".as("node")).distinct()
      .withColumn("label", $"node").localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label among self + neighbors
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "b2"), $"b" === $"b2")
        .groupBy($"a".as("node")).agg(min($"label").as("nl"))
      // the round's starting label rides along as `old`, so convergence
      // below needs no extra join against the previous labels
      val stepped = labels.join(viaNeighbors, Seq("node"), "left")
        .select($"node", $"label".as("old"),
          least($"label", coalesce($"nl", $"label")).as("label"))
      // pointer jumping: label <- label's label (halves chain depth)
      val jumped = stepped.as("x")
        .join(stepped.as("y"), col("x.label") === col("y.node"), "left")
        .select(col("x.node").as("node"), col("x.old").as("old"),
          least(col("x.label"), coalesce(col("y.label"), col("x.label"))).as("label"))
        .localCheckpoint(true)
      // the eager checkpoint already materialized the round; the fixpoint
      // test is a local scan of those blocks — no join, no shuffle, no
      // second pass over the graph (the round-3 version re-joined labels)
      converged = jumped.filter($"label" =!= $"old").isEmpty
      labels.unpersist()
      labels = jumped
      iter += 1
    }
    sym.unpersist()
    // pointer jumping converges in O(log diameter) rounds, so 25 covers
    // any real graph; a non-fixpoint result is silently WRONG labels —
    // fail loudly instead of returning it
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not reach a fixpoint within $maxIter rounds")
    labels.select($"node", $"label".as("component"))
  }

  /** Frequent-line (boilerplate) removal — the paragraph-level dedup step
    * of CCNet (Wenzek et al. 2020 §3.1, "deduplicating paragraphs") and
    * RefinedWeb (Penedo et al. 2023, line-level corrections): a line that
    * appears in MORE than `maxDocFreq` DISTINCT documents is boilerplate
    * ("subscribe to our newsletter", cookie banners, nav bars) and is
    * removed from every document; document order of the surviving lines
    * is preserved.
    *
    * Lines are keyed by the 60-bit md5 of their lowercased+trimmed form
    * (CCNet's normalization-before-hash), so cosmetic case/indent
    * variants of the same banner collapse into one census key.
    *
    * Scale design: one posexplode scan → a distinct-(doc,line-hash)
    * census (map-side combined; the key space is bounded by distinct
    * lines, not occurrences) → a BROADCAST anti-join, because the
    * frequent-line table is provably small: at threshold k it has at most
    * totalLineOccurrences / k rows (each frequent hash accounts for > k
    * occurrences), e.g. ≤ 10⁶ hashes for 10¹² lines at k = 10⁶ — 8 MB of
    * longs. No shuffle meets the skewed key (a banner in half the corpus
    * hashes to ONE census key — a shuffled anti-join would funnel half
    * the exploded corpus through one reducer; the broadcast keeps the
    * probe map-side). Reassembly sorts each doc's surviving (pos, line)
    * pairs locally — per-doc state, no global sort.
    *
    * Returns one row per input document: (id, n_lines_in, n_lines_kept,
    * kept_text) — documents whose every line was boilerplate survive with
    * the empty rewrite, so corpus row count is stable.
    *
    * The totalLineOccurrences/maxDocFreq bound means a LOW threshold on a
    * huge corpus can still exceed executor broadcast limits (10¹² lines
    * at maxDocFreq = 100 permits 10¹⁰ frequent hashes — round-8 advice).
    * The join strategy is derived FROM THE CENSUS, not a caller flag
    * (round-9 verdict): the frequent set is materialized (eager
    * localCheckpoint — it is the provably-small frame) and counted once;
    * at most `maxBroadcastRows` rows (default 10⁶ ≈ 8 MB of longs) it is
    * broadcast, beyond that the SALTED shuffled anti-join takes over:
    * the frequent side replicates `antiJoinSalt` ways and each line picks
    * a deterministic salt from (id, pos), so even a banner hash covering
    * half the corpus spreads over `antiJoinSalt` reducers instead of
    * funneling through one. Same result, bounded-memory both sides —
    * and the 100 TB caller can no longer pick the broadcast bomb.
    */
  def removeFrequentLines(df: DataFrame, idCol: String, textCol: String,
                          maxDocFreq: Long, maxBroadcastRows: Long = 1000000L,
                          antiJoinSalt: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .select($"id", posexplode(split($"text", "\n")).as(Seq("pos", "line")))
      .withColumn("lh", tokenHash(lower(trim($"line"))))
    val frequent = lines.select($"id", $"lh").distinct()
      .groupBy($"lh").agg(count(lit(1)).as("docfreq"))
      .filter($"docfreq" > maxDocFreq)
      .select($"lh")
      // materialized once (bounded: ≤ totalLineOccurrences/maxDocFreq
      // rows) so the strategy count below doesn't re-run the census and
      // the chosen join consumes the same blocks
      .localCheckpoint(true)
    val survivors =
      if (frequent.count() <= maxBroadcastRows)
        lines.join(broadcast(frequent), Seq("lh"), "left_anti")
      else lines
        .withColumn("s", pmod(xxhash64($"id", $"pos"), lit(antiJoinSalt)).cast("int"))
        .join(frequent.withColumn("s",
            explode(sequence(lit(0), lit(antiJoinSalt - 1)))),
          Seq("lh", "s"), "left_anti")
        .drop("s")
    val kept = survivors
      .groupBy($"id")
      .agg(count(lit(1)).as("n_lines_kept"),
        array_join(
          transform(array_sort(collect_list(struct($"pos", $"line"))),
            s => s.getField("line")), "\n").as("kept_text"))
    df.select(col(idCol).as("id"),
        size(split(col(textCol), "\n")).cast("long").as("n_lines_in"))
      .join(kept, Seq("id"), "left")
      .select($"id", $"n_lines_in",
        coalesce($"n_lines_kept", lit(0L)).as("n_lines_kept"),
        coalesce($"kept_text", lit("")).as("kept_text"))
  }

  /** Cross-corpus contamination MATRIX — the governance census a real
    * pipeline publishes: for every (train group × eval suite) cell, how
    * many train documents share word-`shingleN`-grams with that suite,
    * how many cross the per-doc contamination threshold, and the total
    * matched-gram volume. Generalizes [[decontaminate]] (one eval set,
    * per-doc rows) to the n×m report shape ("which train shards are
    * contaminated against which benchmarks") in ONE pass per side.
    *
    * Scale shape: the train side is scanned twice and never shuffled at
    * corpus size — once for the per-doc gram census (docs-sized output,
    * map-side combined) and once exploded into the hit join, where the
    * eval gram table (O(eval corpus), distinct (suite, gram) 8-byte
    * keys) is the broadcast side under AQE; the only aggregations after
    * the join run on HIT rows (bounded by overlap, not corpus). The
    * final grid is groups×suites rows — the group census cross-joined
    * with the KB-sized suite list, zero-filled where a cell has no
    * overlap, so absent contamination is reported, not omitted.
    *
    * Thresholding is exact integer arithmetic (`matched·100 >
    * pct·n_grams`) — engine-replayable (query `x24`). Returns
    * (groupCol, suiteCol, n_docs, n_hit_docs, n_contaminated,
    * matched_grams). */
  def contaminationMatrix(train: DataFrame, evalDf: DataFrame,
                          idCol: String, groupCol: String, suiteCol: String,
                          textCol: String, shingleN: Int = 3,
                          docThresholdPct: Int = 50): DataFrame = {
    def withGrams(d: DataFrame) = d.filter(size(split(col(textCol), " ")) >= shingleN)
    val nd = withGrams(train)
      .select(col(idCol).as("id"), col(groupCol).as("grp"),
        size(shingles(col(textCol), shingleN)).cast("long").as("n_grams"))
    val groupCensus = nd.groupBy(col("grp")).agg(count(lit(1)).as("n_docs"))
    val eg = withGrams(evalDf)
      .select(col(suiteCol).as("suite"), explode(shingles(col(textCol), shingleN)).as("g"))
      .distinct()
    val suites = eg.select(col("suite")).distinct()
    val hits = withGrams(train)
      .select(col(idCol).as("id"), col(groupCol).as("grp"),
        explode(shingles(col(textCol), shingleN)).as("g"))
      .join(eg, Seq("g"))
      .groupBy(col("id"), col("grp"), col("suite"))
      .agg(count(lit(1)).as("matched"))
      .join(nd.select(col("id"), col("n_grams")), Seq("id"))
    val cells = hits.groupBy(col("grp"), col("suite"))
      .agg(count(lit(1)).as("n_hit_docs"),
        sum(when(col("matched") * 100 > lit(docThresholdPct) * col("n_grams"), 1L)
          .otherwise(0L)).as("n_contaminated"),
        sum(col("matched")).as("matched_grams"))
    groupCensus.crossJoin(broadcast(suites))
      .join(cells, Seq("grp", "suite"), "left")
      .select(col("grp").as(groupCol), col("suite").as(suiteCol),
        col("n_docs"),
        coalesce(col("n_hit_docs"), lit(0L)).as("n_hit_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        coalesce(col("matched_grams"), lit(0L)).as("matched_grams"))
  }

  /** SOFT dedup — downweight duplicates instead of dropping them
    * (the reweighting alternative the D4 line of work (Tirumala et al.
    * 2023, arXiv:2308.12284) compares against hard removal: a cluster of
    * near-identical docs should contribute ~one doc's worth of gradient,
    * but WHICH copy survives shouldn't matter). Given a cluster
    * assignment (`idCol`, `clusterCol`) — exact-hash groups, LSH
    * components from [[connectedComponents]], or SemDeDup cells — every
    * member of a size-m cluster gets integer weight ⌊10^6/m⌋ ppm
    * (singletons keep exactly 1 000 000), so Σ weights ≈ 10^6 ·
    * n_clusters and a sampler consuming the weights sees each cluster
    * once in expectation.
    *
    * Plan shape: one map-side-combined groupBy(cluster) census + one
    * broadcast-or-shuffle equi-join back on the cluster id — no pair
    * space, no corpus self-join; composes with the same bucketed edge
    * generators as hard dedup, so the 100 TB story is whatever the
    * cluster assignment's was. The input plan feeds both the census and
    * the join (no CSE across branches) — persist/localCheckpoint
    * upstream when the assignment is expensive to recompute. Returns
    * the input rows + (cluster_sz, weight_ppm). */
  def softDedupWeights(clusters: DataFrame, idCol: String,
                       clusterCol: String): DataFrame = {
    val reserved = Seq("cluster_sz", "weight_ppm").filter(clusters.columns.contains)
    require(reserved.isEmpty,
      s"reserved output columns present: ${reserved.mkString(", ")}")
    val sizes = clusters.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("cluster_sz"))
    clusters.join(sizes, Seq(clusterCol))
      .withColumn("weight_ppm", expr("1000000 div cluster_sz"))
  }
}
