package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT-SUBSTRING cross-corpus contamination census — the exact-match
  * complement of the gram-overlap decontamination family (x6's token
  * Jaccard, x24's contamination matrix): Lee et al., "Deduplicating
  * Training Data Makes Language Models Better" (ExactSubstr) removes
  * train/eval overlap by EXACT substring match, not shingle similarity.
  * Their single-node tool builds a suffix array; the Spark-first form
  * asks the same question as a census over a LENGTH LADDER: for each
  * probe length L, which eval documents share a verbatim L-character
  * substring with ANY train document? The per-document longest-match
  * length is then bracketed by the largest L that hits (a suffix array
  * gives the exact length; the ladder gives the decontamination
  * DECISION — thresholds like "drop on ≥ 50-char overlap" only need the
  * bracket).
  *
  * Shape per L: explode every document into its distinct character
  * L-grams (one map-side pass, `transform(sequence(...))` — codegen, no
  * UDF), then one equi-join train-grams ⋈ eval-grams and a distinct doc
  * census. Shuffle = O(total chars) gram rows per probed length, the
  * same banded-join scale class as the MinHash family (d4); at 100 TB
  * the L-gram key would be a rolling hash (8-byte keys, collision
  * verify on the string in the same join) — the string key here keeps
  * the oracle engine-portable, and the ladder is embarrassingly
  * parallel across L.
  *
  * TWO KEY FORMS, and the hashed one is the library default at scale:
  *
  *  - STRING keys ([[grams]]/[[buildIndex]]/[[screenBatch]]/
  *    [[sharedSubstrCensus]]): every shuffled row carries the L-char
  *    gram itself. Engine-portable (any SQL engine replays it), but at
  *    L = 50 the shuffle moves ~50 bytes/gram.
  *  - HASHED keys ([[gramHashes]]/[[buildHashIndex]]/
  *    [[screenBatchHashed]]/[[sharedSubstrCensusHashed]]): each gram is
  *    a 60-bit md5 prefix ([[graft.functions.GraftFunctions.chargram_hashes_sd]],
  *    one imperative pass per document, within-doc dedup BEFORE the
  *    explode) — 8 bytes/row through every distinct and join, and the
  *    hash replays exactly in DuckDB as
  *    `('0x' || substr(md5(g), 1, 15))::BIGINT`, so hash-level oracles
  *    stay bit-exact even if a collision ever fired (both engines
  *    compute the same hash). For EXACT string semantics,
  *    [[sharedSubstrCensusHashed]] adds a candidate-restricted verify:
  *    corpus-scale movement stays 8-byte hashes, and gram STRINGS move
  *    only for the hit set (the train∩eval overlap — tiny next to the
  *    corpus in any decontamination run), map-side filtered through a
  *    broadcast of the candidate hashes before any string shuffles. A
  *    hash-only screen errs CONSERVATIVE (a collision can only flag a
  *    clean doc, never pass a contaminated one) — the safe direction
  *    for decontamination. */
object ExactSubstr {

  /** Distinct character L-grams of `textCol`, keeping `keep` columns.
    * Documents shorter than L emit nothing. 1-based `substring`, so the
    * grams replay verbatim in any SQL engine. */
  def grams(docs: DataFrame, textCol: String, L: Int,
            keep: Seq[String] = Seq.empty): DataFrame = {
    require(L >= 1, s"ExactSubstr: L=$L")
    docs.filter(length(col(textCol)) >= L)
      .select(keep.map(col) :+ explode(expr(
        s"transform(sequence(1, length($textCol) - $L + 1), " +
        s"i -> substring($textCol, i, $L))")).as("g"): _*)
      .distinct()
  }

  /** The STORED index side of a streaming screen: one row per distinct
    * (gram_len, g) over the train corpus, all ladder rungs in one frame.
    * Built once, checkpointed by the caller, and then NEVER moved again:
    * [[screenBatch]] broadcasts the (small) arriving batch against it,
    * so the per-batch plan scans the index map-side with zero index
    * shuffle — the s9 admission-index shape applied to decontamination.
    * At 100 TB the index is the corpus; re-shuffling it per micro-batch
    * is the scale-killer this split exists to avoid. */
  def buildIndex(train: DataFrame, textCol: String,
                 lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty, "ExactSubstr: empty length ladder")
    lengths.map { l =>
      grams(train, textCol, l).select(lit(l).as("gram_len"), col("g"))
    }.reduce(_ unionByName _)
  }

  /** Screen one arriving batch of documents against a [[buildIndex]]
    * frame: per ladder rung, how many batch docs share a verbatim
    * L-char substring with the indexed corpus (+ id checksum). The
    * batch side BROADCASTS — the contract is batch ≪ index (a
    * decontamination screen admits eval/holdout docs in micro-batches
    * against a corpus-sized index; the reverse would be x48's co-shuffle
    * census). Guarded loudly: a corpus-sized frame passed as `batch`
    * would OOM the broadcast, so doc count is capped. Rungs with zero
    * hits emit no row (the caller's accumulator treats absence as +0). */
  def screenBatch(index: DataFrame, batch: DataFrame, textCol: String,
                  idCol: String, lengths: Seq[Int],
                  maxBatchDocs: Long = 1000000L): DataFrame = {
    require(lengths.nonEmpty, "ExactSubstr: empty length ladder")
    val n = batch.count()
    require(n <= maxBatchDocs,
      s"ExactSubstr.screenBatch: batch has $n docs (> $maxBatchDocs) — " +
      "the batch side broadcasts; screen the small side against the " +
      "index, or use sharedSubstrCensus for the corpus-vs-corpus form.")
    val bg = lengths.map { l =>
      grams(batch, textCol, l, keep = Seq(idCol))
        .select(lit(l).as("gram_len"), col(idCol), col("g"))
    }.reduce(_ unionByName _)
    index.join(broadcast(bg), Seq("gram_len", "g"))
      .select(col("gram_len"), col(idCol)).distinct()
      .groupBy(col("gram_len"))
      .agg(count(lit(1)).as("n_docs_hit"),
           coalesce(sum(col(idCol)), lit(0L)).as("id_chk"))
  }

  /** Distinct 60-bit character-L-gram HASHES of `textCol`, keeping
    * `keep` columns — the 8-bytes-per-row twin of [[grams]]. Within-doc
    * dedup happens inside the kernel (map-side, before the explode);
    * the trailing `.distinct()` then dedups across documents on 8-byte
    * keys. Documents shorter than L emit nothing. */
  def gramHashes(docs: DataFrame, textCol: String, L: Int,
                 keep: Seq[String] = Seq.empty): DataFrame = {
    require(L >= 1, s"ExactSubstr: L=$L")
    docs.select(keep.map(col) :+ explode(
        graft.functions.GraftFunctions
          .chargram_hashes_sd(col(textCol), L)).as("h"): _*)
      .distinct()
  }

  /** String grams paired with their 60-bit hash — the VERIFY side's
    * input, via the [[graft.functions.GraftFunctions.chargram_pairs]]
    * kernel (one imperative pass per document; the declarative
    * explode + per-gram md5 chain paid ~3 interpreted expression-tree
    * walks per gram — the x6/NgramHash lesson). Per-document distinct;
    * a broadcast of candidate hashes filters these rows map-side
    * BEFORE any string moves. */
  private def gramsWithHash(docs: DataFrame, textCol: String, L: Int,
                            keep: Seq[String]): DataFrame =
    docs.select(keep.map(col) :+ explode(
        graft.functions.GraftFunctions.chargram_pairs(col(textCol), L))
        .as("p"): _*)
      .select(keep.map(col) :+ col("p.h").as("h") :+ col("p.g").as("g"): _*)

  /** [[buildIndex]] with 60-bit hash keys: one row per distinct
    * (gram_len, h) over the train corpus — 8-byte rows through the
    * build shuffle, the checkpoint, and every per-batch screen scan.
    * This is the index form to use at scale; the hash replays in any
    * engine with md5, so oracles stay exact. */
  def buildHashIndex(train: DataFrame, textCol: String,
                     lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty, "ExactSubstr: empty length ladder")
    lengths.map { l =>
      gramHashes(train, textCol, l)
        .select(lit(l).as("gram_len"), col("h"))
    }.reduce(_ unionByName _)
  }

  /** [[screenBatch]] against a [[buildHashIndex]] frame: the arriving
    * batch's gram HASHES broadcast into one map-side index scan per
    * micro-batch — zero index shuffle, 8-byte join keys. Hash-level
    * semantics: a 60-bit collision can only over-flag (conservative for
    * decontamination); there are no false negatives. Same batch-size
    * guard as the string form. */
  def screenBatchHashed(index: DataFrame, batch: DataFrame, textCol: String,
                        idCol: String, lengths: Seq[Int],
                        maxBatchDocs: Long = 1000000L): DataFrame = {
    require(lengths.nonEmpty, "ExactSubstr: empty length ladder")
    val n = batch.count()
    require(n <= maxBatchDocs,
      s"ExactSubstr.screenBatchHashed: batch has $n docs (> $maxBatchDocs) " +
      "— the batch side broadcasts; screen the small side against the " +
      "index, or use sharedSubstrCensusHashed for the corpus-vs-corpus form.")
    val bg = lengths.map { l =>
      gramHashes(batch, textCol, l, keep = Seq(idCol))
        .select(lit(l).as("gram_len"), col(idCol), col("h"))
    }.reduce(_ unionByName _)
    index.join(broadcast(bg), Seq("gram_len", "h"))
      .select(col("gram_len"), col(idCol)).distinct()
      .groupBy(col("gram_len"))
      .agg(count(lit(1)).as("n_docs_hit"),
           coalesce(sum(col(idCol)), lit(0L)).as("id_chk"))
  }

  /** [[sharedSubstrCensus]] on hash keys — the 100 TB form. Phase 1
    * joins 8-byte hash rows (corpus-scale movement). With `verify` on
    * (the default), phase 2 re-derives gram strings ONLY for candidate
    * hashes: the hit-hash set broadcasts, both corpora's gram streams
    * are filtered map-side against it before any string shuffles, and
    * the final join matches on (h, g) — the in-join string verify that
    * makes the result bit-identical to [[sharedSubstrCensus]] (so the
    * string-form oracle gates this path unchanged). `verify = false`
    * is the pure-hash census (collisions over-count, never under). */
  def sharedSubstrCensusHashed(train: DataFrame, eval: DataFrame,
                               textCol: String, idCol: String,
                               lengths: Seq[Int],
                               verify: Boolean = true): DataFrame = {
    require(lengths.nonEmpty, "ExactSubstr: empty length ladder")
    lengths.map { l =>
      val th = gramHashes(train, textCol, l)
      val eh = gramHashes(eval, textCol, l, keep = Seq(idCol))
      val cand = eh.join(th, Seq("h"))
      val docsHit =
        if (!verify) cand.select(col(idCol)).distinct()
        else {
          val candH = cand.select(col("h")).distinct()
          val tg = gramsWithHash(train, textCol, l, keep = Seq.empty)
            .join(broadcast(candH), Seq("h")).select(col("h"), col("g"))
            .distinct()
          val eg = gramsWithHash(eval, textCol, l, keep = Seq(idCol))
            .join(broadcast(candH), Seq("h"))
            .select(col(idCol), col("h"), col("g")).distinct()
          eg.join(tg, Seq("h", "g")).select(col(idCol)).distinct()
        }
      docsHit
        .agg(count(lit(1)).as("n_docs_hit"),
             coalesce(sum(col(idCol)), lit(0L)).as("id_chk"))
        .select(lit(l).as("gram_len"), col("n_docs_hit"), col("id_chk"))
    }.reduce(_ unionByName _)
  }

  /** The ladder census: one row per probe length — how many eval docs
    * share an exact L-char substring with the train side, with an id
    * checksum. Hits are monotone downward in L by containment (an
    * L-hit implies every shorter hit), so the largest hitting L
    * brackets each document's longest shared substring. */
  def sharedSubstrCensus(train: DataFrame, eval: DataFrame,
                         textCol: String, idCol: String,
                         lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty, "ExactSubstr: empty length ladder")
    lengths.map { l =>
      val tg = grams(train, textCol, l)
      val eg = grams(eval, textCol, l, keep = Seq(idCol))
      eg.join(tg, Seq("g")).select(col(idCol)).distinct()
        .agg(count(lit(1)).as("n_docs_hit"),
             coalesce(sum(col(idCol)), lit(0L)).as("id_chk"))
        .select(lit(l).as("gram_len"), col("n_docs_hit"), col("id_chk"))
    }.reduce(_ unionByName _)
  }
}
