package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization" —
  * the SentencePiece default algorithm), Spark-first, in the hard-EM
  * (Viterbi) form whose every step is exact integer arithmetic an
  * independent engine replays:
  *
  *  1. ONE corpus pass reduces to the word-frequency table (the
  *     [[Bpe]] discipline — everything after runs on the
  *     vocabulary-bounded table, the corpus is never re-scanned).
  *  2. Seed vocabulary: every substring of every distinct word up to
  *     `maxPieceLen`, scored Σ_w freq(w)·occurrences(sub, w); the top
  *     `topMulti` multi-character pieces by (score DESC, piece ASC)
  *     plus ALL single characters (coverage guarantee: any word is
  *     segmentable).
  *  3. `iters` rounds of Viterbi-EM: costs are integer micro-nats
  *     cost(p) = ⌊−ln((cnt+1)/(T+|V|))·10⁶ + 0.5⌋ (add-one smoothing —
  *     the Laplace-adjusted-branch discipline of [[StupidBackoff]] —
  *     keeps every piece scoreable and the piece set fixed across
  *     rounds); the E-step segments each distinct word by dynamic
  *     programming (best(i) = min over j of best(j) + cost(w[j..i)),
  *     ties broken to the SMALLEST j, i.e. the longest final piece),
  *     counting pieces on best paths weighted by word frequency; the
  *     M-step re-estimates costs from the count census.
  *
  * Scale shape: pass 1 is a map-side-combined groupBy; everything
  * after runs on the collected word table — the [[Bpe.trainLocal]]
  * discipline (the word table is vocabulary-bounded by assumption;
  * guard it upstream the same way) — so training costs ZERO Spark jobs
  * beyond the one reduction, killing the k-sequential-jobs bound an
  * iterative distributed E-step would pay; the model is |V| rows at
  * any corpus size, and [[segmentCounts]] applies it map-side with the
  * model broadcast (the distributed half). Determinism: integer
  * scores, fixed
  * iteration count, explicit (score, j) and (score DESC, piece) ties —
  * DuckDB replays seed → costs → Viterbi paths → counts → re-estimated
  * costs bit-for-bit (query `t19_unigram_lm`).
  */
object Unigram {

  /** Integer micro-nat cost under add-one smoothing. */
  private def microNatCost(cnt: Long, total: Long, vocab: Int): Long =
    math.floor(-math.log((cnt + 1).toDouble / (total + vocab).toDouble) * 1e6 + 0.5).toLong

  /** Viterbi best segmentation of `w` under `cost`; every single char
    * of `w` must be in `cost` (the seed guarantees it). Ties prefer the
    * smallest split point j (the longest final piece). Positions are
    * CODE POINTS (the seed census comes from Spark `substring`, which
    * counts code points — a UTF-16 DP would treat a surrogate pair as
    * two positions and `maxPieceLen` would mean different units on the
    * two sides). */
  private[graft] def viterbi(w: String, cost: collection.Map[String, Long],
                             maxPieceLen: Int): Seq[String] = {
    val off = Bpe.codePointOffsets(w)
    val n = off.length - 1
    val best = Array.fill(n + 1)(Long.MaxValue)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != Long.MaxValue) {
          cost.get(w.substring(off(j), off(i))) match {
            case Some(c) =>
              val s = best(j) + c
              if (s < best(i)) { best(i) = s; back(i) = j }
            case None =>
          }
        }
        j += 1
      }
      i += 1
    }
    require(best(n) != Long.MaxValue, s"word '$w' not segmentable (char missing from vocab)")
    var out = List.empty[String]
    var p = n
    while (p > 0) { val j = back(p); out = w.substring(off(j), off(p)) :: out; p = j }
    out
  }

  /** The word-frequency table: (w, f), vocabulary-bounded. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))

  /** Train the unigram model. Returns (piece, cnt, cost): `cnt` the
    * final-round Viterbi count, `cost` the re-estimated micro-nat cost.
    *
    * Driver memory is bounded by the word-form census: the collected
    * table is O(forms), and the seed substring map is O(positions ×
    * maxPieceLen) — so, like [[Bpe.trainLocal]], the collect is GUARDED
    * by a census that runs first. Inputs past either cap (character
    * n-gram soup, genomic k-mers — not a natural language) fail loudly
    * instead of OOMing the driver. */
  def train(df: DataFrame, textCol: String, topMulti: Int, maxPieceLen: Int,
            iters: Int, maxWordForms: Long = 50000000L,
            maxSymbolPositions: Long = 500000000L): DataFrame = {
    require(topMulti >= 0 && maxPieceLen >= 1 && iters >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val wordsDf = wordFreq(df, textCol).persist()
    val stats = wordsDf.agg(count(lit(1)), coalesce(sum(length(col("w"))), lit(0L)))
      .collect()(0)
    val (nForms, nPositions) = (stats.getLong(0), stats.getLong(1))
    require(nForms <= maxWordForms,
      s"Unigram.train: $nForms distinct word forms > maxWordForms=" +
      s"$maxWordForms — this input is not language-bounded, so the " +
      "driver-side EM loop would not fit. Use Unigram.trainDistributed " +
      "(no driver ceiling, bit-identical output) or raise maxWordForms.")
    require(nPositions <= maxSymbolPositions,
      s"Unigram.train: $nPositions total symbol positions > " +
      s"maxSymbolPositions=$maxSymbolPositions — the seed substring " +
      "census is O(positions x maxPieceLen), so this table would not " +
      "fit a driver. Use Unigram.trainDistributed (no driver ceiling, " +
      "bit-identical output) or raise maxSymbolPositions.")
    val words = wordsDf.as[(String, Long)].collect()
    wordsDf.unpersist()
    // seed census in CODE POINTS — the unit Spark substring/length use
    // (trainDistributed's explode replays this census distributed; a
    // UTF-16 loop would split supplementary-plane chars into surrogates)
    val subScores = collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      val off = Bpe.codePointOffsets(w)
      val n = off.length - 1
      var l = 1
      while (l <= math.min(maxPieceLen, n)) {
        var st = 0
        while (st + l <= n) {
          val p = w.substring(off(st), off(st + l))
          subScores(p) = subScores.getOrElse(p, 0L) + f
          st += 1
        }
        l += 1
      }
    }
    // piece lengths and tie-break sorts in Spark units too: code points
    // and binary (UTF-8) collation, matching trainDistributed's
    // length(p) filters and orderBy(s desc, p) cut
    def cpLen(s: String): Int = s.codePointCount(0, s.length)
    val chars = subScores.keys.filter(cpLen(_) == 1).toSeq.sorted(Bpe.Utf8Ordering)
    val multi = subScores.toSeq.filter(p => cpLen(p._1) > 1)
      .sortWith((x, y) => x._2 > y._2 ||
        (x._2 == y._2 && Bpe.utf8Compare(x._1, y._1) < 0))
      .take(topMulti).map(_._1)
    val pieces = (chars ++ multi).distinct.sorted(Bpe.Utf8Ordering)
    val vsize = pieces.size
    // initial counts = seed substring scores
    var counts: Map[String, Long] = pieces.map(p => p -> subScores(p)).toMap
    var finalCounts: Map[String, Long] = Map.empty
    var it = 0
    while (it < iters) {
      val total = counts.values.sum
      val cost = counts.map { case (p, c) => p -> microNatCost(c, total, vsize) }
      val tallies = collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, f) =>
        viterbi(w, cost, maxPieceLen).foreach { p =>
          tallies(p) = tallies.getOrElse(p, 0L) + f
        }
      }
      finalCounts = pieces.map(p => p -> tallies.getOrElse(p, 0L)).toMap
      counts = finalCounts
      it += 1
    }
    val total = finalCounts.values.sum
    pieces.map(p => (p, finalCounts(p), microNatCost(finalCounts(p), total, vsize)))
      .toDF("piece", "cnt", "cost")
  }

  /** The NO-CEILING trainer — bit-identical output to [[train]], but the
    * word table never collects: this is the distributed E-step [[train]]'s
    * guard error message points at, for inputs past the language-bounded
    * caps (character n-gram soup, genomic k-mers — word-form tables that
    * are corpus-sized, not vocabulary-sized).
    *
    * Execution split per step:
    *  - SEED: the substring census is a distributed explode + map-side-
    *    combined groupBy over the word table (positions × maxPieceLen
    *    rows in flight, never materialized); only the RESULTING
    *    vocabulary collects — |V| = alphabet + topMulti rows by
    *    construction (the model-literal pattern), with the top-multi cut
    *    an orderBy(score desc, piece).limit(topMulti).
    *  - E-STEP (× iters): the |V|-row cost table broadcasts; Viterbi
    *    segmentation runs per word form in a flatMap (map-side, no
    *    shuffle in); the piece census is one groupBy(piece).sum whose
    *    result is again ≤|V| rows. One Spark job per iteration — fine
    *    at Unigram's single-digit `iters`, unlike BPE's 30k merges
    *    (which is why BPE's no-ceiling form does not exist and its
    *    trainLocal guard is a hard stop).
    *  - M-STEP: cost re-estimation on the |V|-row census, driver-side
    *    integer arithmetic.
    *
    * Driver memory is O(|V|) at any corpus size. UnigramSpec pins
    * bit-parity against [[train]]; query `t24_unigram_distributed`
    * gates it against t19's independent SQL replay. */
  def trainDistributed(df: DataFrame, textCol: String, topMulti: Int,
                       maxPieceLen: Int, iters: Int): DataFrame = {
    require(topMulti >= 0 && maxPieceLen >= 1 && iters >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val words = wordFreq(df, textCol).persist()
    // distributed substring census: every (start, len <= maxPieceLen)
    // substring of every distinct word, weighted by word frequency
    val subs = words.select(explode(expr(
        s"flatten(transform(sequence(1, least($maxPieceLen, length(w))), " +
        s"l -> transform(sequence(1, length(w) - l + 1), " +
        s"st -> substring(w, st, l))))")).as("p"), col("f"))
      .groupBy(col("p")).agg(sum(col("f")).as("s"))
      .persist()
    val charRows = subs.filter(length(col("p")) === 1).collect()
    val multiRows = subs.filter(length(col("p")) > 1)
      .orderBy(col("s").desc, col("p")).limit(topMulti).collect()
    subs.unpersist()
    val seed = (charRows ++ multiRows).map(r => r.getString(0) -> r.getLong(1))
    val pieces = seed.map(_._1).distinct.sorted(Bpe.Utf8Ordering)
    val seedMap = seed.toMap
    val vsize = pieces.length
    var counts: Map[String, Long] = pieces.map(p => p -> seedMap(p)).toMap
    var it = 0
    while (it < iters) {
      val total = counts.values.sum
      val cost = counts.map { case (p, c) => p -> microNatCost(c, total, vsize) }
      val bc = spark.sparkContext.broadcast(cost)
      val mpl = maxPieceLen
      // E-step: ONE distributed pass — Viterbi per word form map-side,
      // piece census <= |V| rows back to the driver
      val tallies = words.as[(String, Long)]
        .flatMap { case (w, f) => viterbi(w, bc.value, mpl).map(p => (p, f)) }
        .groupBy(col("_1")).agg(sum(col("_2")).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      bc.destroy()
      counts = pieces.map(p => p -> tallies.getOrElse(p, 0L)).toMap
      it += 1
    }
    words.unpersist()
    val total = counts.values.sum
    pieces.toSeq.map(p => (p, counts(p), microNatCost(counts(p), total, vsize)))
      .toDF("piece", "cnt", "cost")
  }

  /** Segment a corpus with a trained model: per-row token count and the
    * segmented pieces, computed map-side with the |V|-row model
    * broadcast (join-free — the Bpe.segment discipline). */
  def segmentCounts(df: DataFrame, textCol: String, model: DataFrame,
                    maxPieceLen: Int): DataFrame = {
    val spark = df.sparkSession
    val cost = model.select(col("piece"), col("cost")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bc = spark.sparkContext.broadcast(cost)
    val seg = udf { text: String =>
      if (text == null) 0
      else text.split(" ").filter(_.nonEmpty)
        .map(w => viterbi(w, bc.value, maxPieceLen).size).sum
    }
    df.withColumn("n_pieces", seg(col(textCol)))
  }
}
