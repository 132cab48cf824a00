package graft.ann

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998,
  * λ = 1/2) — the retrieval-results diversifier: greedily pick k items
  * from an ANN/BM25 shortlist so each pick balances relevance against
  * redundancy with what is already picked,
  *
  *   pick_r = argmax_{c ∉ S} ( rel(c) − max_{s ∈ S} sim(c, s) ),
  *
  * max over the empty S being 0 (so pick 1 is the plain relevance
  * argmax). With λ = 1/2 the usual λ·rel − (1−λ)·maxSim is this
  * difference × 1/2 — same argmax, no extra arithmetic.
  *
  * Determinism discipline: rel comes in from the caller's ranking arm
  * (v1's rounded-cosine convention) and sim is computed HERE the same
  * way — integer quantized dot, cast, sqrt, divide, one round(·, 6) at
  * the end, the identical IEEE op sequence the codegen kernel + Spark
  * `round` perform — so both are the exact doubles the oracle's
  * replay produces; the greedy loop then only ever subtracts and
  * compares them (identical IEEE ops in any engine), ties broken
  * (score desc, id asc).
  *
  * Scale shape: the SHORTLIST is the contract — it arrives already
  * bounded by the retrieval arm (ANN probe-bounded postings, BM25's
  * TakeOrderedAndProject), so the m vectors are model-sized and collect
  * ONCE (the model-literal pattern: centroids/codebooks/pivots all
  * collect at this size); the m²/2 sims are then a primitive-array loop
  * on the driver — no Spark job, no m²-row collect, the pair space
  * never exists as rows anywhere. Guarded loudly, not assumed.
  * Returns (rk, id, rel, mmr). */
object Mmr {

  /** round(x, 6) with Spark's Round semantics for DoubleType —
    * BigDecimal(valueOf-form) HALF_UP — so driver-side sims are the
    * exact doubles the previous Spark-expression form produced and any
    * SQL engine replaying `round(..., 6)` states. */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def diversify(shortlist: DataFrame, k: Int, maxShortlist: Int = 1000): DataFrame = {
    require(k >= 1, s"Mmr.diversify: k=$k")
    val spark = shortlist.sparkSession
    // limit(max+1) bounds the collect BEFORE the guard can fire — one
    // job, driver memory capped even on a corpus-sized mistake
    val collected = shortlist.select(col("id"), col("rel"), col("qv"))
      .limit(maxShortlist + 1).collect()
    require(collected.length <= maxShortlist,
      s"Mmr.diversify: shortlist has > maxShortlist=$maxShortlist rows — " +
      "the m*m similarity loop is driver-sized by contract; diversify a " +
      "RANKED SHORTLIST (ANN/BM25 top-k), not a corpus, or raise maxShortlist.")
    val ids = collected.map(_.getLong(0))
    require(ids.distinct.length == ids.length,
      s"Mmr.diversify: shortlist ids are not distinct " +
      s"(${ids.length} rows, ${ids.distinct.length} distinct) — a ranked " +
      "shortlist carries one row per candidate; dedupe upstream (duplicate " +
      "ids would make max-sim-to-picked ill-defined).")
    // sorted by id: the same deterministic scan order the collected-rel
    // table always used for the greedy argmax tie-break
    val byId = collected.sortBy(_.getLong(0))
    val m = byId.length
    val rel = byId.map(r => (r.getLong(0), r.getDouble(1)))
    val vecs: Array[Array[Long]] = byId.map(_.getSeq[Long](2).toArray)
    // pairwise sims with the v1 rounding convention — integer dot (the
    // codegen kernel's exact arithmetic), cast, sqrt, divide, round(·,6):
    // identical IEEE ops to the former Spark-expression form, computed
    // here in a primitive loop over the already-collected model rows
    def dotL(a: Array[Long], b: Array[Long]): Long = {
      val n = math.min(a.length, b.length)
      var s = 0L; var i = 0
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val norm = vecs.map(v => math.sqrt(dotL(v, v).toDouble))
    val sims = Array.ofDim[Double](m, m)
    var ii = 0
    while (ii < m) {
      var jj = ii + 1
      while (jj < m) {
        val s = round6(dotL(vecs(ii), vecs(jj)).toDouble / (norm(ii) * norm(jj)))
        sims(ii)(jj) = s; sims(jj)(ii) = s
        jj += 1
      }
      ii += 1
    }
    val selected = collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    // per-candidate running max-sim-to-picked: updated once per pick, so
    // the whole greedy loop is O(m·k) — no per-candidate set scans. The
    // running max starts at -inf (sims can be NEGATIVE — a 0.0 floor
    // would silently clamp them); the max-over-the-EMPTY-set = 0.0 rule
    // applies only in round 1, special-cased below.
    val picked = new Array[Boolean](m)
    val maxSims = Array.fill(m)(Double.NegativeInfinity)
    var nPicked = 0
    var r = 1
    while (r <= math.min(k, rel.length) && nPicked < rel.length) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < m) {
        if (!picked(i)) {
          val (id, rl) = rel(i)
          val score = rl - (if (nPicked == 0) 0.0 else maxSims(i))
          if (score > bestScore || (score == bestScore && (bestIdx < 0 || id < rel(bestIdx)._1))) {
            bestIdx = i; bestScore = score
          }
        }
        i += 1
      }
      selected += ((r, rel(bestIdx)._1, rel(bestIdx)._2, bestScore))
      picked(bestIdx) = true
      nPicked += 1
      var j = 0
      while (j < m) {
        if (!picked(j) && sims(j)(bestIdx) > maxSims(j)) maxSims(j) = sims(j)(bestIdx)
        j += 1
      }
      r += 1
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        selected.toSeq.map { case (rk, id, rl, sc) => Row(rk, id, rl, sc) }, 1),
      StructType(Seq(
        StructField("rk", IntegerType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("rel", DoubleType, nullable = false),
        StructField("mmr", DoubleType, nullable = false))))
  }
}
