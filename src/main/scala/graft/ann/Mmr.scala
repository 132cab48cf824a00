package graft.ann

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions

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
  * way — integer quantized dot through the codegen'd kernel, one
  * round(·, 6) at the end — so both are the exact doubles the oracle's
  * replay produces; the greedy loop then only ever subtracts and
  * compares them (identical IEEE ops in any engine), ties broken
  * (score desc, id asc).
  *
  * Scale shape: the SHORTLIST is the contract — it arrives already
  * bounded by the retrieval arm (ANN probe-bounded postings, BM25's
  * TakeOrderedAndProject), so the m×m sim table is model-sized and the
  * greedy loop is driver-side arithmetic on collected rows (the
  * model-literal pattern: centroids/codebooks/pivots all collect at
  * this size). The m² pair space never touches the corpus — guarded
  * loudly, not assumed. Returns (rk, id, rel, mmr). */
object Mmr {

  def diversify(shortlist: DataFrame, k: Int, maxShortlist: Int = 1000): DataFrame = {
    require(k >= 1, s"Mmr.diversify: k=$k")
    val spark = shortlist.sparkSession
    val rows = shortlist.select(col("id"), col("rel"), col("qv")).persist()
    val m = rows.count()
    require(m <= maxShortlist,
      s"Mmr.diversify: shortlist has $m rows > maxShortlist=$maxShortlist — " +
      "the m*m similarity table is driver-sized by contract; diversify a " +
      "RANKED SHORTLIST (ANN/BM25 top-k), not a corpus, or raise maxShortlist.")
    // pairwise sims in Spark with the v1 rounding convention, so the
    // doubles match any engine replaying the same quantized vectors
    val cos = round(
      GraftFunctions.dot_long(col("a.qv"), col("b.qv")).cast("double") /
        (sqrt(GraftFunctions.dot_long(col("a.qv"), col("a.qv")).cast("double")) *
         sqrt(GraftFunctions.dot_long(col("b.qv"), col("b.qv")).cast("double"))), 6)
    val sims = rows.as("a").join(rows.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"), cos.as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rel = rows.select(col("id"), col("rel")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
    rows.unpersist()
    val selected = collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    val picked = collection.mutable.LinkedHashSet.empty[Long]
    var r = 1
    while (r <= math.min(k, rel.length) && picked.size < rel.length) {
      var bestId = -1L
      var bestScore = Double.NegativeInfinity
      var bestRel = 0.0
      rel.foreach { case (id, rl) =>
        if (!picked.contains(id)) {
          val maxSim =
            if (picked.isEmpty) 0.0
            else picked.iterator.map(s => sims((id, s))).max
          val score = rl - maxSim
          if (score > bestScore || (score == bestScore && id < bestId)) {
            bestId = id; bestScore = score; bestRel = rl
          }
        }
      }
      selected += ((r, bestId, bestRel, bestScore))
      picked += bestId
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
