package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) vocabulary induction — the
  * SentencePiece/GPT-2 tokenizer TRAINING step (Sennrich et al. 2016),
  * in the shape every large-corpus trainer actually uses: the corpus is
  * reduced ONCE to the distinct-word frequency table, and the merge loop
  * runs entirely over that table — pair statistics are weighted by word
  * frequency, so a 100 TB corpus pays one corpus-sized groupBy total,
  * then k rounds over a vocabulary-sized frame (the word-form table is
  * bounded by the language, not the corpus; same discipline as
  * `Ann.kmeans`: per-round driver state is ONE (a,b,count) scalar — the
  * argmax pair — and the loop-carried frame is localCheckpoint-truncated
  * so the plan stays O(1) in rounds).
  *
  * Merge semantics are the standard greedy left-to-right non-overlapping
  * replace ("aaaa" + (a,a) -> "aa","aa"): a fold that merges the
  * accumulator's last symbol with the incoming one iff they equal the
  * round's pair — after a merge the new symbol can itself merge again
  * only on a LATER round, exactly BPE's definition. Ties in pair counts
  * break deterministically by (count desc, left, right) so training is
  * reproducible across engines and parallelism.
  *
  * Returns the learned merge table: (rank, left, right, merged, c) with
  * rank 1..numMerges — the artifact a tokenizer ships.
  *
  * ==Choosing [[train]] vs [[trainLocal]]==
  * [[train]] keeps every round distributed, but each merge is ONE Spark
  * job (census + O(1)-row argmax fetch): a real 32k–100k-merge vocabulary
  * means 32k–100k *sequential* jobs — days of scheduler latency at any
  * cluster size, regardless of how small the per-round frame is. That
  * k-sequential-jobs bound is inherent to the distributed loop, so the
  * at-scale path is [[trainLocal]]: the SAME single corpus-sized
  * reduction, then the word-frequency table (language-bounded — O(total
  * symbol positions) driver memory, ~hundreds of MB for a 10⁷-form
  * table, guarded) collects to the driver and the classical indexed
  * merge loop (incremental heap argmax) finishes with zero further jobs.
  * [[train]] remains the right form when the word table itself can't fit
  * a driver (character-level "words" on genomic data, say) or for small
  * merge counts where one job per round is immaterial. Both produce
  * bit-identical merge tables (BpeSpec pins them against each other and
  * against an independent replay).
  */
object Bpe {

  def train(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    // the ONE corpus-sized pass: token -> frequency. Consecutive/leading/
    // trailing spaces split into empty tokens; drop them — an empty word
    // would otherwise become two phantom "" symbols (sequence(0,-1) =
    // [0,-1]) and a bogus ("","") pair could win a merge round.
    val words = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // symbol sequences start as characters
    var syms = words.select(col("w"), col("cnt"),
        expr("transform(sequence(0, length(w)-1), i -> substring(w, i+1, 1))").as("s"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    while (r <= numMerges) {
      val best = syms.filter(size(col("s")) >= 2)
        .select(col("cnt"), explode(
          expr("transform(sequence(0, size(s)-2), " +
            "i -> struct(element_at(s, i+1) AS a, element_at(s, i+2) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) {
        r = numMerges + 1 // fully merged corpus: nothing left to learn
      } else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, a, b, c))
        // greedy fold: seed with the first symbol, merge-or-append the rest
        val aq = lit(a); val bq = lit(b)
        val prev = syms
        syms = syms.withColumn("s",
            when(size(col("s")) < 2, col("s")).otherwise(
              aggregate(slice(col("s"), lit(2), size(col("s")) - 1),
                array(element_at(col("s"), 1)),
                (acc, x) =>
                  when(element_at(acc, -1) === aq && x === bq,
                    concat(slice(acc, lit(1), size(acc) - 1), array(concat(aq, bq))))
                  .otherwise(concat(acc, array(x))))))
          .localCheckpoint(true) // vocabulary-sized; truncates per-round lineage
        // the new checkpoint no longer references the old blocks — release
        // them now instead of accreting one replicated frame per round
        // (the connectedComponents discipline)
        prev.unpersist()
        r += 1
      }
    }
    mergeTable(spark, merges.result())
  }

  /** The AT-SCALE trainer: same contract and bit-identical output as
    * [[train]], different execution split. One distributed corpus-sized
    * reduction produces the (word, cnt) table; that table — bounded by
    * the language's word-form inventory, not the corpus — collects to the
    * driver, and the classical indexed BPE loop (Sennrich's `learn_bpe`
    * shape: pair→count and pair→containing-words maps, only affected
    * words re-counted per merge) runs locally with ZERO further Spark
    * jobs. 32k merges over a 10⁶-form table finish in seconds where
    * [[train]] would schedule 32k sequential jobs.
    *
    * Tie-break parity: candidates order by (count desc, left, right) with
    * strings compared as unsigned UTF-8 bytes — exactly Spark's binary
    * string ordering, so the argmax matches [[train]] beyond ASCII too.
    *
    * Driver memory is bounded by TOTAL SYMBOL POSITIONS (Σ length over
    * distinct forms — the loop's index and adjacency structures are all
    * O(positions), with primitive-int posting arrays, not per-position
    * boxed sets), so the guard is on `maxSymbolPositions`, not just form
    * count: a 10⁷-form English table is ~10⁸ positions ≈ hundreds of MB
    * here; the default cap (5·10⁸) keeps the worst case a few GB. Inputs
    * past either cap (not a natural language — character n-gram soup,
    * genomic k-mers) fail loudly and point at [[train]] rather than OOM
    * the driver — the `ngramJaccardPairs` guard discipline. */
  def trainLocal(df: DataFrame, textCol: String, numMerges: Int,
                 maxWordForms: Long = 50000000L,
                 maxSymbolPositions: Long = 500000000L): DataFrame = {
    val spark = df.sparkSession
    // the ONE corpus-sized pass (identical to train's)
    val wordsDf = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .persist() // stats + collect must not re-run the corpus-sized pass
    val stats = wordsDf.agg(count(lit(1)), coalesce(sum(length(col("w"))), lit(0L)))
      .collect()(0)
    val (nForms, nPositions) = (stats.getLong(0), stats.getLong(1))
    require(nForms <= maxWordForms,
      s"Bpe.trainLocal: $nForms distinct word forms > maxWordForms=" +
      s"$maxWordForms — this input is not language-bounded, so the " +
      "driver-side merge loop would not fit. Use Bpe.train (fully " +
      "distributed rounds) or raise maxWordForms.")
    require(nPositions <= maxSymbolPositions,
      s"Bpe.trainLocal: $nPositions total symbol positions > " +
      s"maxSymbolPositions=$maxSymbolPositions — the merge loop's " +
      "adjacency index is O(positions), so this table would not fit a " +
      "driver. Use Bpe.train (fully distributed rounds) or raise " +
      "maxSymbolPositions.")
    val collected = wordsDf.collect()
    wordsDf.unpersist()
    val words: Array[(Array[String], Long)] = collected.map { row =>
      (codePoints(row.getString(0)), row.getLong(1))
    }
    mergeTable(spark, localMergeLoop(words, numMerges))
  }

  /** Split into whole Unicode CODE POINTS (one per element). The
    * distributed trainers seed symbols via Spark `substring`/`sequence`,
    * which count code points — the driver-side trainers must match: a
    * UTF-16 code-unit split (`w.map(_.toString)`) would hand a
    * supplementary-plane character (emoji — common in web-crawl text)
    * to the merge loop as TWO lone-surrogate symbols, diverging from
    * `train`'s symbol table and corrupting the [[utf8Compare]] tie-break
    * (getBytes maps lone surrogates to '?'). */
  private[text] def codePoints(w: String): Array[String] = {
    val n = w.codePointCount(0, w.length)
    val out = new Array[String](n)
    var i = 0; var off = 0
    while (i < n) {
      val next = w.offsetByCodePoints(off, 1)
      out(i) = w.substring(off, next)
      off = next; i += 1
    }
    out
  }

  /** UTF-16 offsets of the code-point boundaries of `w`:
    * offsets(0) = 0 … offsets(n) = w.length — the index map for
    * code-point-addressed substring extraction without re-joining. */
  private[text] def codePointOffsets(w: String): Array[Int] = {
    val n = w.codePointCount(0, w.length)
    val out = new Array[Int](n + 1)
    var i = 0; var off = 0
    while (i < n) { off = w.offsetByCodePoints(off, 1); i += 1; out(i) = off }
    out
  }

  /** [[utf8Compare]] as an Ordering — for driver-side sorts that must
    * match a Spark orderBy on strings (binary collation). */
  private[text] val Utf8Ordering: Ordering[String] =
    (x: String, y: String) => utf8Compare(x, y)

  /** Unsigned-UTF-8-byte string comparison — Spark's binary collation,
    * the ordering `train`'s orderBy(col("a"), col("b")) tie-break uses. */
  private[text] def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Growable primitive-int posting list: 4 bytes/entry amortized, no
    * per-element boxing — the structure that keeps the merge loop's
    * memory at O(total symbol positions) with a small constant. Entries
    * may repeat or go stale (a word rewritten by an earlier merge); the
    * consumer re-checks membership, so appends never need dedup beyond
    * the cheap adjacent-duplicate skip. */
  private[text] final class IntBuf {
    private var a = new Array[Int](4)
    private var n = 0
    def +=(v: Int): Unit = {
      if (n > 0 && a(n - 1) == v) return // same word, next occurrence
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
    def foreach(f: Int => Unit): Unit = {
      var i = 0
      while (i < n) { f(a(i)); i += 1 }
    }
  }

  /** The classical indexed merge loop (Sennrich's `learn_bpe` shape).
    * Pair census counts every adjacent position (overlaps included:
    * "aaa" has (a,a) twice) weighted by word frequency; replacement is
    * the greedy left-to-right fold — both definitions identical to
    * [[train]]'s distributed forms. The per-merge argmax is INCREMENTAL:
    * a lazy-deletion max-heap ordered by (count desc, left, right)
    * receives an entry on every pair-count update, and stale entries
    * (count no longer current) are discarded at pop time — every live
    * pair's current count is always present, so the first non-stale pop
    * is the exact argmax. Per merge that is O(affected·log) instead of a
    * full O(|pairs|) sweep, which is what makes 32k+ merges over a large
    * word table tractable. */
  private def localMergeLoop(words: Array[(Array[String], Long)],
                             numMerges: Int): Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] = words.map(_._1)
    val cnts: Array[Long] = words.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), IntBuf]
    // max by count, then MIN left, MIN right in utf8 byte order — the
    // exact (c DESC, a, b) tie-break train's orderBy uses
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val ca = utf8Compare(y._2, x._2)
          if (ca != 0) ca else utf8Compare(y._3, x._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    def addWord(idx: Int, sign: Long): Unit = {
      val s = syms(idx); val c = cnts(idx) * sign
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val nc = pairCount.getOrElse(p, 0L) + c
        if (nc == 0L) pairCount.remove(p)
        else {
          pairCount.update(p, nc)
          heap.enqueue((nc, p._1, p._2)) // lazy: old entries go stale
        }
        if (sign > 0) pairWords.getOrElseUpdate(p, new IntBuf) += idx
        j += 1
      }
    }
    var i = 0
    while (i < syms.length) { addWord(i, 1L); i += 1 }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      // lazy deletion lets stale entries accrete (one per count update);
      // when they dominate, rebuild from the live table — amortized O(1)
      // per update, keeps heap memory O(|pairs|) across a 100k-merge run
      if (heap.size > math.max(1 << 16, 8 * pairCount.size)) {
        heap.clear()
        pairCount.foreach { case (p, c) => heap.enqueue((c, p._1, p._2)) }
      }
      // pop to the first entry whose count is still current
      var best: (String, String) = null
      var bestC = 0L
      while (best == null && heap.nonEmpty) {
        val (c, a, b) = heap.dequeue()
        if (pairCount.get((a, b)).contains(c)) { best = (a, b); bestC = c }
      }
      if (best == null) done = true
      else {
        val (a, b) = best
        out += ((r, a, b, bestC))
        val merged = a + b
        // (a,b)'s count drains to 0 via the addWord(-1) decrements below
        // (every current occurrence lives in an affected word), removing
        // it from pairCount; any interim heap entries it leaves go stale
        // and are skipped at pop time.
        // rewrite only the words that (may) contain the pair; the index
        // holds stale members from earlier rewrites — skip them cheaply
        val affected = pairWords.remove(best).getOrElse(new IntBuf)
        affected.foreach { idx =>
          val s = syms(idx)
          var has = false
          var j = 0
          while (!has && j < s.length - 1) {
            if (s(j) == a && s(j + 1) == b) has = true
            j += 1
          }
          if (has) {
            addWord(idx, -1L)
            // greedy left-to-right fold, same as train's aggregate()
            val nb = mutable.ArrayBuffer.empty[String]
            nb += s(0)
            j = 1
            while (j < s.length) {
              if (nb(nb.length - 1) == a && s(j) == b)
                nb(nb.length - 1) = merged
              else nb += s(j)
              j += 1
            }
            syms(idx) = nb.toArray
            addWord(idx, 1L)
          }
        }
        r += 1
      }
    }
    out.result()
  }

  private def mergeTable(spark: SparkSession,
                         merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val rows = merges.map { case (rk, a, b, c) => Row(rk, a, b, a + b, c) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("c", LongType, nullable = false))))
  }

  /** Apply a learned merge table to a text column: tokenize on spaces,
    * split each token to characters, replay the merges in rank order.
    * The merge list is a driver-side constant folded into ONE expression
    * chain — no join, no shuffle; the scan stays a single map. Empty
    * tokens (consecutive spaces) are dropped up front, mirroring
    * [[train]]'s word filter — they would otherwise char-split into two
    * phantom "" symbols. */
  def segment(df: DataFrame, textCol: String,
              merges: Seq[(String, String)]): DataFrame = {
    // anonymous inner column — never materialized, so it cannot clobber
    // a caller's column of any name
    val toks = filter(split(col(textCol), " "), w => length(w) >= 1)
    val charSplit =
      transform(toks, w => transform(
        sequence(lit(0), length(w) - 1), i => w.substr(i + 1, lit(1))))
    val merged = merges.foldLeft(charSplit) { case (prev, (a, b)) =>
      val aq = lit(a); val bq = lit(b)
      transform(prev, w =>
        when(size(w) < 2, w).otherwise(
          aggregate(slice(w, lit(2), size(w) - 1), array(element_at(w, 1)),
            (acc, x) =>
              when(element_at(acc, -1) === aq && x === bq,
                concat(slice(acc, lit(1), size(acc) - 1), array(concat(aq, bq))))
              .otherwise(concat(acc, array(x))))))
    }
    df.withColumn("pieces", merged)
  }
}
