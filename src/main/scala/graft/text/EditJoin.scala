package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Edit-distance similarity JOIN — all pairs within Levenshtein
  * distance ≤ k, WITHOUT the all-pairs product: the approximate-string
  * capability of a training-data pipeline (near-duplicate titles, URL
  * variants, OCR noise) that the token-level dedup family (d2 MinHash,
  * d4 n-gram Jaccard) cannot express — those measure SET overlap and
  * miss transpositions/indels that edit distance counts.
  *
  * Algorithm: PassJoin (Li, Deng, Feng & Wang, "PASS-JOIN: a
  * partition-based method for similarity joins", VLDB 2011), the
  * published exact signature scheme:
  *
  *  - INDEX role: every string of length ≥ k+1 is partitioned into
  *    k+1 contiguous segments (even partition: first segments ⌊L/m⌋
  *    chars, the last L mod m segments one longer). If ed(s,t) ≤ k, an
  *    optimal alignment has ≤ k edits, so by PIGEONHOLE at least one of
  *    t's k+1 segments is touched by none — its exact copy appears in s
  *    as a contiguous substring, displaced from the segment's own start
  *    by at most the net indel balance before it, which is within ±k.
  *  - PROBE role: the SHORTER side of each pair (ties: both probe,
  *    pairs deduped) emits, for every partner length L ∈ [len, len+k]
  *    and every segment i of the L-partition, its substrings of that
  *    segment's length starting inside the paper's MULTI-MATCH-AWARE
  *    window: shift q − pᵢ ∈ [max(−(i−1), Δ−(m−i)), min(i−1, Δ+(m−i))]
  *    with Δ = len − L and m = k+1 (1-based i). Losslessness argument:
  *    take the FIRST untouched segment i of an optimal ≤ k-edit
  *    alignment — each of the i−1 earlier segments carries ≥ 1 edit, so
  *    the net shift before segment i is within ±(i−1); the m−i later
  *    segments must absorb the remaining length imbalance Δ − shift, so
  *    |shift − Δ| ≤ m−i. The window is ≤ half the naive ±k band and
  *    shrinks further as |Δ| grows (it also subsumes the position-aware
  *    bound: (i−1) + (m−i) = k).
  *  - Candidates = one equi-join of probe substrings against index
  *    segments on (L, segIdx, value); VERIFY = `levenshtein` (Spark's
  *    codegen built-in) ≤ k on the distinct candidate pairs.
  *
  * Scale shape: signatures are O(n·(k+1)²·(2k+1)) rows of ~L/(k+1)
  * chars — linear in the corpus, never quadratic; the join buckets by
  * segment VALUE, so candidate volume tracks segment-collision
  * selectivity exactly like d2's LSH bands track band collisions (a
  * boilerplate-heavy corpus widens buckets; lengthening segments by
  * raising k+1 is the same trade as narrowing LSH bands). Verification
  * touches candidate pairs only. The one quadratic corner is the SHORT
  * block — strings of length ≤ k cannot donate k+1 non-empty segments,
  * so they pair within their own (length ≤ k) set directly; that set is
  * census-sized in any real corpus and a loud guard throws if it is not.
  *
  * No reference analog (stackstac has no string surface); the dedup
  * family context is SURVEY §2's pipeline mandate.
  */
object EditJoin {

  /** Even k+1-way partition boundaries of a length-L string: segment i
    * is [starts(i), starts(i) + lens(i)). Deterministic and shared by
    * both roles — the index partitions its own length, the probe
    * replays the partition of each candidate partner length. */
  private[graft] def segments(len: Int, k: Int): Array[(Int, Int)] = {
    val m = k + 1
    val base = len / m
    val rem = len % m
    val out = new Array[(Int, Int)](m)
    var start = 0
    var i = 0
    while (i < m) {
      val l = if (i < m - rem) base else base + 1
      out(i) = (start, l)
      start += l
      i += 1
    }
    out
  }

  /** Multi-match-aware probe positions for a length-`len` string
    * against the segments of partner length `partnerLen`: emits
    * (segIdx 0-based, start, segLen). The shift window per 1-based
    * segment i is [max(−(i−1), Δ−(m−i)), min(i−1, Δ+(m−i))], Δ = len −
    * partnerLen — lossless per PassJoin Lemma 3 (see object scaladoc),
    * clipped to the string. Exposed for the spec's window-size gate. */
  private[graft] def probeWindows(len: Int, partnerLen: Int,
                                  k: Int): Iterator[(Int, Int, Int)] = {
    val m = k + 1
    val delta = len - partnerLen
    segments(partnerLen, k).iterator.zipWithIndex.flatMap { case ((p, l), i0) =>
      val i = i0 + 1 // 1-based segment index
      val lo = math.max(math.max(-(i - 1), delta - (m - i)) + p, 0)
      val hi = math.min(math.min(i - 1, delta + (m - i)) + p, len - l)
      (lo to hi).iterator.map(q => (i0, q, l))
    }
  }

  /** All unordered pairs (id_a < id_b, dist) with
    * levenshtein(str_a, str_b) ≤ k. Ids must be unique; duplicate
    * STRINGS are fine (they meet at dist 0). */
  def passJoin(df: DataFrame, idCol: String, strCol: String, k: Int): DataFrame = {
    require(k >= 1, s"EditJoin: k=$k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val strs = df.select(col(idCol).cast("long").as("id"),
      col(strCol).cast("string").as("s")).as[(Long, String)]

    // ---- signatures: one flatMap each, no precomputed per-length state
    // (the partition arithmetic is O(k) per emission).
    val index = strs.flatMap { case (id, s) =>
      val len = s.length
      if (len < k + 1) Iterator.empty
      else segments(len, k).iterator.zipWithIndex.map { case ((p, l), i) =>
        (len, i, s.substring(p, p + l), id)
      }
    }.toDF("part_len", "seg_idx", "seg", "idx_id")

    val probe = strs.flatMap { case (id, s) =>
      val len = s.length
      for {
        partnerLen <- (len to len + k).iterator
        if partnerLen >= k + 1
        (i, q, l) <- probeWindows(len, partnerLen, k)
      } yield (partnerLen, i, s.substring(q, q + l), id)
    }.toDF("part_len", "seg_idx", "seg", "probe_id")

    // no distinct here — the union below dedups once for both sources
    // (a distinct on each side would shuffle the candidate set twice)
    val candidates = index.join(probe, Seq("part_len", "seg_idx", "seg"))
      .filter($"idx_id" =!= $"probe_id")
      .select(least($"idx_id", $"probe_id").as("id_a"),
        greatest($"idx_id", $"probe_id").as("id_b"))

    // ---- SHORT block: strings of length <= k pair only among
    // themselves (any longer partner is indexable and reached through
    // the probe above, whose surviving-segment copy always fits the
    // shorter string). Quadratic within the block by construction —
    // guard loudly rather than degrade silently.
    val shorts = strs.filter(_._2.length <= k).toDF("id", "s")
    val nShort = shorts.count()
    if (nShort > 20000) throw new IllegalStateException(
      s"EditJoin: $nShort strings of length <= k=$k form an all-pairs " +
      "short block — this corpus needs a dedicated short-string path " +
      "(the PassJoin signatures cover only strings long enough to " +
      "donate k+1 non-empty segments).")
    val shortPairs = shorts.as("a").join(shorts.as("b"),
        $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"))

    val ids = candidates.unionByName(shortPairs).distinct()
    val withStr = ids
      .join(strs.toDF("id_a", "s_a"), Seq("id_a"))
      .join(strs.toDF("id_b", "s_b"), Seq("id_b"))
    withStr
      .select($"id_a", $"id_b", levenshtein($"s_a", $"s_b").as("dist"))
      .filter($"dist" <= k)
  }
}
