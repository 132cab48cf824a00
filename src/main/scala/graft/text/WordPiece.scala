package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer training (Schuster & Nakajima 2012; the BERT
  * vocabulary builder) — the third trainer beside BPE ([[Bpe]]) and
  * Unigram ([[Unigram]]). Same greedy-merge skeleton as BPE with ONE
  * changed line, which is the whole algorithm: the merge argmax is the
  * LIKELIHOOD gain score c(ab) / (c(a)·c(b)) — "merge the pair whose
  * joint frequency most exceeds what independence predicts" — instead of
  * raw pair count, so frequent-but-uninformative pairs ("e"+" s") lose
  * to cohesive ones.
  *
  * Determinism discipline (t11/t13): the rational score quantizes to
  * integer picoparts, sq = ⌊c·10^12 / (c(a)·c(b))⌋, computed through
  * DECIMAL(38,0) (both factors corpus-sized at 100 TB — a Long product
  * would wrap), ties broken by (a, b) in binary string order; any SQL
  * engine replays every round bit-for-bit.
  *
  * Plan shape per round (the Bpe.train shape + one census): ONE pair
  * census + ONE symbol census over the word-form table — both map-side-
  * combined groupBys over a vocabulary-bounded frame, never the corpus
  * (the corpus is touched exactly once, in the initial word census) —
  * then a 1-row argmax collect and a map-only greedy fold. Returns the
  * merge table (rank, left, right, merged, c, sq). */
object WordPiece {

  def train(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    val words = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    var syms = words.select(col("w"), col("cnt"),
        expr("transform(sequence(0, length(w)-1), i -> substring(w, i+1, 1))").as("s"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, String, Long, Long)]
    var r = 1
    while (r <= numMerges) {
      val symCnt = syms
        .select(col("cnt"), explode(col("s")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("cnt")).as("cs"))
      val best = syms.filter(size(col("s")) >= 2)
        .select(col("cnt"), explode(
          expr("transform(sequence(0, size(s)-2), " +
            "i -> struct(element_at(s, i+1) AS a, element_at(s, i+2) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .join(symCnt.select(col("sym").as("a"), col("cs").as("ca")), Seq("a"))
        .join(symCnt.select(col("sym").as("b"), col("cs").as("cb")), Seq("b"))
        .withColumn("sq", expr(
          "(CAST(c AS DECIMAL(38,0)) * 1000000000000) div " +
          "(CAST(ca AS DECIMAL(38,0)) * cb)").cast("long"))
        // using-column joins reorder columns (each key moves to the
        // front) — pin the projection before the positional reads below
        .select(col("a"), col("b"), col("c"), col("sq"))
        .orderBy(col("sq").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) {
        r = numMerges + 1 // fully merged: nothing left to learn
      } else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((r, a, b, a + b, best(0).getLong(2), best(0).getLong(3)))
        val aq = lit(a); val bq = lit(b)
        val prev = syms
        // greedy fold — identical to Bpe.train's merge apply
        syms = syms.withColumn("s",
            when(size(col("s")) < 2, col("s")).otherwise(
              aggregate(slice(col("s"), lit(2), size(col("s")) - 1),
                array(element_at(col("s"), 1)),
                (acc, x) =>
                  when(element_at(acc, -1) === aq && x === bq,
                    concat(slice(acc, lit(1), size(acc) - 1), array(concat(aq, bq))))
                  .otherwise(concat(acc, array(x))))))
          .localCheckpoint(true)
        prev.unpersist()
        r += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "left", "right", "merged", "c", "sq")
  }

  /** The AT-SCALE trainer — [[Bpe.trainLocal]]'s execution split with
    * WordPiece's argmax: one distributed corpus-sized reduction to the
    * (word, cnt) table, the same maxWordForms/maxSymbolPositions guards,
    * then the indexed merge loop runs on the driver with ZERO further
    * Spark jobs — killing the k-sequential-jobs bound that makes a 30k-
    * merge vocabulary under [[train]] 30k sequential censuses + argmax
    * collects. Bit-identical output to [[train]] (parity fuzzed in
    * RoundTenFuzzSpec).
    *
    * The likelihood score complicates the incremental argmax vs BPE's:
    * sq(a,b) = ⌊c(a,b)·10¹²/(c(a)·c(b))⌋ depends on the SYMBOL counts,
    * and a merge changes exactly three of those (left, right, merged) —
    * so beside the pairs whose joint count changed, every live pair
    * touching one of those three symbols is rescored (a symbol→pairs
    * index makes that O(touching pairs), not O(|pairs|)). All rescores
    * per merge are batched into one dirty set and enqueued AFTER the
    * rewrites complete, so every heap entry carries a post-merge-
    * consistent score; the lazy-deletion invariant is then exactly
    * BPE's — every live pair's current score is always present, stale
    * entries are discarded at pop time by recomputing the score. */
  /** The ONE corpus-sized pass both trainers start from (and that
    * callers computing further vocabulary-bounded censuses — e.g. the
    * t25 character cutoff — should REUSE instead of re-scanning the
    * corpus): (w, cnt) word frequencies. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame = df
    .select(explode(split(col(textCol), " ")).as("w"))
    .filter(length(col("w")) >= 1)
    .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  def trainLocal(df: DataFrame, textCol: String, numMerges: Int,
                 maxWordForms: Long = 50000000L,
                 maxSymbolPositions: Long = 500000000L): DataFrame =
    trainLocalFromWordFreq(wordFreq(df, textCol), numMerges,
      maxWordForms, maxSymbolPositions)

  /** [[trainLocal]] over a precomputed [[wordFreq]] table — the form a
    * caller with other uses for the census takes (one corpus reduction,
    * shared). Same guards, same output, bit-identical merges. */
  def trainLocalFromWordFreq(wf: DataFrame, numMerges: Int,
                             maxWordForms: Long = 50000000L,
                             maxSymbolPositions: Long = 500000000L): DataFrame = {
    val spark = wf.sparkSession
    // stats + collect must not re-run the corpus-sized pass; respect a
    // caller-managed persist (don't evict what we didn't cache)
    val callerPersisted =
      wf.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val wordsDf = if (callerPersisted) wf else wf.persist()
    val stats = wordsDf.agg(count(lit(1)), coalesce(sum(length(col("w"))), lit(0L)))
      .collect()(0)
    val (nForms, nPositions) = (stats.getLong(0), stats.getLong(1))
    require(nForms <= maxWordForms,
      s"WordPiece.trainLocal: $nForms distinct word forms > maxWordForms=" +
      s"$maxWordForms — this input is not language-bounded, so the " +
      "driver-side merge loop would not fit. Use WordPiece.train (fully " +
      "distributed rounds) or raise maxWordForms.")
    require(nPositions <= maxSymbolPositions,
      s"WordPiece.trainLocal: $nPositions total symbol positions > " +
      s"maxSymbolPositions=$maxSymbolPositions — the merge loop's " +
      "indexes are O(positions), so this table would not fit a driver. " +
      "Use WordPiece.train (fully distributed rounds) or raise " +
      "maxSymbolPositions.")
    val collected = wordsDf.collect()
    if (!callerPersisted) wordsDf.unpersist()
    val words: Array[(Array[String], Long)] = collected.map { row =>
      (Bpe.codePoints(row.getString(0)), row.getLong(1))
    }
    import spark.implicits._
    localMergeLoop(words, numMerges)
      .toDF("rank", "left", "right", "merged", "c", "sq")
  }

  /** BERT-style runtime tokenizer: greedy longest-match-first
    * ("max-munch") segmentation over a FIXED vocabulary — the inference
    * half of WordPiece (Schuster & Nakajima 2012 §3; BERT's
    * WordpieceTokenizer), where training ([[train]]/[[trainLocal]])
    * produces the vocab. At each position the longest vocab piece
    * matching the remainder is consumed; a word with an unmatchable
    * position maps to ONE unknown token (BERT's [UNK]), counted in
    * `n_unk`. Map-side with the model broadcast (the [[Unigram
    * .segmentCounts]] discipline — vocab is |V|-bounded, the scan is
    * join-free). Adds per-row `n_words`, `n_pieces` (UNK words
    * contribute 1), `n_unk`. */
  def segmentGreedy(df: DataFrame, textCol: String, vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty, "WordPiece.segmentGreedy: empty vocabulary")
    val clash = Seq("n_words", "n_pieces", "n_unk").filter(df.columns.contains)
    require(clash.isEmpty, s"output columns already present: ${clash.mkString(", ")}")
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast((vocab.toSet, vocab.map(_.length).max))
    val seg = udf { text: String =>
      val (set, maxLen) = bc.value
      if (text == null) Array(0L, 0L, 0L)
      else {
        var words = 0L; var pieces = 0L; var unk = 0L
        text.split(" ").foreach { w =>
          if (w.nonEmpty) {
            words += 1
            var pos = 0; var n = 0L; var dead = false
            while (!dead && pos < w.length) {
              var l = math.min(maxLen, w.length - pos)
              var step = 0
              while (step == 0 && l >= 1) {
                if (set.contains(w.substring(pos, pos + l))) step = l
                l -= 1
              }
              if (step == 0) dead = true
              else { pos += step; n += 1 }
            }
            if (dead) { pieces += 1; unk += 1 } else pieces += n
          }
        }
        Array(words, pieces, unk)
      }
    }
    df.withColumn("__seg", seg(col(textCol)))
      .withColumn("n_words", element_at(col("__seg"), 1))
      .withColumn("n_pieces", element_at(col("__seg"), 2))
      .withColumn("n_unk", element_at(col("__seg"), 3))
      .drop("__seg")
  }

  private val Picoparts = BigInt(1000000000000L)

  /** ⌊c·10¹² / (ca·cb)⌋ through BigInt — [[train]]'s DECIMAL(38,0) `div`
    * (integral divide, operands corpus-sized so a Long product would
    * wrap; all operands positive, so floor = truncate on both engines). */
  private def sqOf(c: Long, ca: Long, cb: Long): Long =
    ((BigInt(c) * Picoparts) / (BigInt(ca) * BigInt(cb))).toLong

  private def localMergeLoop(words: Array[(Array[String], Long)],
      numMerges: Int): Seq[(Int, String, String, String, Long, Long)] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] = words.map(_._1)
    val cnts: Array[Long] = words.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val symCount = mutable.HashMap.empty[String, Long]
    val pairWords = mutable.HashMap.empty[(String, String), Bpe.IntBuf]
    val symPairs = mutable.HashMap.empty[String, mutable.HashSet[(String, String)]]
    // max by score, then MIN left, MIN right in utf8 byte order — the
    // exact (sq DESC, a, b) tie-break train's orderBy uses
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val ca = Bpe.utf8Compare(y._2, x._2)
          if (ca != 0) ca else Bpe.utf8Compare(y._3, x._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    // Updates word idx's contribution (±) to the symbol census (EVERY
    // position — train's explode(s) counts length-1 words too) and the
    // pair census; touched pairs land in `dirty` for post-merge rescore.
    def addWord(idx: Int, sign: Long,
                dirty: mutable.HashSet[(String, String)]): Unit = {
      val s = syms(idx); val c = cnts(idx) * sign
      var j = 0
      while (j < s.length) {
        val ns = symCount.getOrElse(s(j), 0L) + c
        if (ns == 0L) symCount.remove(s(j)) else symCount.update(s(j), ns)
        if (j < s.length - 1) {
          val p = (s(j), s(j + 1))
          val np = pairCount.getOrElse(p, 0L) + c
          if (np == 0L) {
            pairCount.remove(p)
            symPairs.get(p._1).foreach(_.remove(p))
            symPairs.get(p._2).foreach(_.remove(p))
          } else {
            pairCount.update(p, np)
            if (sign > 0) {
              symPairs.getOrElseUpdate(p._1, mutable.HashSet.empty) += p
              symPairs.getOrElseUpdate(p._2, mutable.HashSet.empty) += p
              pairWords.getOrElseUpdate(p, new Bpe.IntBuf) += idx
            }
          }
          dirty += p
        }
        j += 1
      }
    }
    val seedDirty = mutable.HashSet.empty[(String, String)]
    var i = 0
    while (i < syms.length) { addWord(i, 1L, seedDirty); i += 1 }
    pairCount.foreach { case (p, c) =>
      heap.enqueue((sqOf(c, symCount(p._1), symCount(p._2)), p._1, p._2))
    }
    val out = Seq.newBuilder[(Int, String, String, String, Long, Long)]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      // lazy deletion lets stale entries accrete; when they dominate,
      // rebuild from the live tables — amortized O(1) per update
      if (heap.size > math.max(1 << 16, 8 * pairCount.size)) {
        heap.clear()
        pairCount.foreach { case (p, c) =>
          heap.enqueue((sqOf(c, symCount(p._1), symCount(p._2)), p._1, p._2))
        }
      }
      // pop to the first entry whose score is still current; the dirty-
      // set rescoring guarantees the true max is present
      var best: (String, String) = null
      var bestC = 0L; var bestSq = 0L
      while (best == null && heap.nonEmpty) {
        val (sq, a, b) = heap.dequeue()
        pairCount.get((a, b)) match {
          case Some(c) if sqOf(c, symCount(a), symCount(b)) == sq =>
            best = (a, b); bestC = c; bestSq = sq
          case _ => // stale — a current entry exists elsewhere in the heap
        }
      }
      if (best == null) done = true
      else {
        val (a, b) = best
        val merged = a + b
        out += ((r, a, b, merged, bestC, bestSq))
        val dirty = mutable.HashSet.empty[(String, String)]
        val affected = pairWords.remove(best).getOrElse(new Bpe.IntBuf)
        affected.foreach { idx =>
          val s = syms(idx)
          var has = false
          var j = 0
          while (!has && j < s.length - 1) {
            if (s(j) == a && s(j + 1) == b) has = true
            j += 1
          }
          if (has) {
            addWord(idx, -1L, dirty)
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
            addWord(idx, 1L, dirty)
          }
        }
        // symbol counts changed for exactly {a, b, merged}: every live
        // pair touching one of them gets a new score — rescore those too
        Seq(a, b, merged).foreach { s =>
          symPairs.get(s).foreach(ps => ps.foreach(dirty += _))
        }
        dirty.foreach { p =>
          pairCount.get(p).foreach { c =>
            heap.enqueue((sqOf(c, symCount(p._1), symCount(p._2)), p._1, p._2))
          }
        }
        r += 1
      }
    }
    out.result()
  }
}
