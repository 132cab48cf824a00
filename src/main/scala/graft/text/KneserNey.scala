package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sketch.Kmv

/** Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the modified
  * form surveyed in Chen & Goodman 1998 §2.7) — the accuracy step past
  * [[StupidBackoff]]: the lower-order distribution is the CONTINUATION
  * probability (how many distinct left contexts a word follows — "San
  * Francisco" makes "Francisco" frequent but a poor unigram continuation),
  * and absolute discounting (fixed D) moves mass from seen bigrams to it.
  *
  *   P(w|p) = (max(c(p,w) − D, 0) + D · N1+(p,·) · Pcont(w)) / c(p)
  *   Pcont(w) = (N1+(·,w) + 1) / (N1+(·,·) + B)       (Laplace-adjusted)
  *
  * with N1+(p,·) = distinct continuations of p, N1+(·,w) = distinct left
  * contexts of w, N1+(·,·) = distinct bigrams — the Laplace adjustment
  * keeps Pcont (and so every score) defined for unseen buckets, the same
  * discipline as StupidBackoff's backoff branch. Unseen-prev positions
  * (c(p) = 0) fall back to Pcont(w) alone.
  *
  * Distribution story: everything is bucketed ([[Dsir]] discipline —
  * tokens hash into B buckets), so the ENTIRE model is one (bp, bc, c)
  * bigram census of ≤ B² rows (B = 256 → ≤ 64 Ki rows, ~1 MB) from which
  * prev totals, both continuation censuses, and the global distinct count
  * all DERIVE by bounded aggregations — no second corpus pass. Training
  * is one map-side-combined groupBy; scoring is one scan with three
  * broadcast joins + a 1-row stats crossJoin; no shuffle ever touches
  * the corpus (the StupidBackoff plan shape with a richer model).
  *
  * Determinism (t13/t17 discipline): scores quantize to integer
  * micro-nats via floor(−ln(p)·10^quantDigits + 0.5); p is computed from
  * integer-valued doubles with a fixed operation order, so DuckDB
  * replays every position bit-for-bit. Bucket collisions can inflate
  * c(p,w) relative to c(p) (p > 1, negative nats) — harmless in integers
  * and faithfully replayed.
  *
  * Returns one row per input doc: (idCol, score, n_pos, n_backoff);
  * docs with < 2 tokens score (0, 0, 0). */
object KneserNey {

  /** Bucketed bigram census over the reference corpus: (bp, bc, c),
    * ≤ numBuckets² rows at any corpus size. The one corpus pass; every
    * other model table derives from this census. */
  def bigramCensus(ref: DataFrame, textCol: String, numBuckets: Int): DataFrame = {
    val b = lit(numBuckets.toLong)
    ref.select(split(col(textCol), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS p, tk[i] AS c))")).as("pc"))
      .select(pmod(Kmv.hash60(col("pc.p")), b).as("bp"),
              pmod(Kmv.hash60(col("pc.c")), b).as("bc"))
      .groupBy(col("bp"), col("bc")).agg(count(lit(1)).as("c"))
  }

  /** Score docs against a trained census. `discount` is the absolute
    * discount D (0 < D < 1; Chen & Goodman's fixed-D baseline). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            census: DataFrame, numBuckets: Int, discount: Double = 0.75,
            quantDigits: Int = 6): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val q = math.pow(10.0, quantDigits)
    val b = lit(numBuckets.toLong)
    // four consumers derive from the census (bigram join, prev, cont,
    // stats) and Spark does no CSE across branches — materialize the
    // ≤ B²-row model ONCE so the reference corpus is scanned once, not
    // four times (the semDedup persisted-branch discipline; eager
    // localCheckpoint so the KB-scale blocks free with the frame)
    val cen = census.localCheckpoint(true)
    // bounded derivations of the census: prev totals + continuation
    // fan-outs (each census row is one distinct (bp, bc) pair, so
    // count(*) IS the N1+ statistic)
    val prev = cen.groupBy(col("bp"))
      .agg(sum(col("c")).as("cp"), count(lit(1)).as("n1p"))
    val cont = cen.groupBy(col("bc")).agg(count(lit(1)).as("n1c"))
    val stats = cen.agg(count(lit(1)).as("nt"))
    val pairs = docs
      .select(col(idCol), split(col(textCol), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS p, tk[i] AS c))")).as("pc"))
      .select(col(idCol),
        pmod(Kmv.hash60(col("pc.p")), b).as("bp"),
        pmod(Kmv.hash60(col("pc.c")), b).as("bc"))
    // fixed operation order, mirrored verbatim by the DuckDB replay:
    // pcont = (n1c + 1) / (nt + B)
    // seen:  p = (greatest(cb − D, 0) + (D · n1p) · pcont) / cp
    // else:  p = pcont
    val pcont = (coalesce(col("n1c"), lit(0L)) + 1).cast("double") /
                (col("nt") + numBuckets).cast("double")
    val seen = coalesce(col("cp"), lit(0L)) > 0
    val pSeen = (greatest(coalesce(col("cb"), lit(0L)).cast("double") - discount, lit(0.0)) +
                 (lit(discount) * col("n1p").cast("double")) * pcont) /
                col("cp").cast("double")
    val nats = (p: org.apache.spark.sql.Column) =>
      floor(-log(p) * q + 0.5).cast("long")
    val perDoc = pairs
      .join(broadcast(cen.select(col("bp"), col("bc"), col("c").as("cb"))),
        Seq("bp", "bc"), "left")
      .join(broadcast(prev), Seq("bp"), "left")
      .join(broadcast(cont), Seq("bc"), "left")
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        when(seen, nats(pSeen)).otherwise(nats(pcont)).as("d"),
        when(seen, lit(0L)).otherwise(lit(1L)).as("bo"))
      .groupBy(col(idCol))
      .agg(sum(col("d")).as("score"), count(lit(1)).as("n_pos"),
           sum(col("bo")).as("n_backoff"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("score"), lit(0L)).as("score"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_backoff"), lit(0L)).as("n_backoff"))
  }
}
