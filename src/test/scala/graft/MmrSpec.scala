package graft

import org.apache.spark.sql.functions._
import graft.ann.Mmr

/** MMR diversification against hand-computed greedy picks. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // quantized vectors: id 1 and 2 identical direction (sim 1.0), id 3
  // orthogonal; rel chosen so plain ranking would pick 1 then 2
  private def shortlist = Seq(
    (1L, 0.9, Seq(10000L, 0L)),
    (2L, 0.8, Seq(20000L, 0L)),
    (3L, 0.5, Seq(0L, 10000L))
  ).toDF("id", "rel", "qv")

  test("diversify: a redundant twin of pick 1 loses to an orthogonal doc") {
    val out = Mmr.diversify(shortlist, k = 3).orderBy($"rk").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3))).toSeq
    // pick 1: id 1 (rel 0.9). pick 2: id 2 scores 0.8-1.0 = -0.2,
    // id 3 scores 0.5-0.0 = 0.5 -> id 3. pick 3: id 2. The expected
    // score is the exact IEEE double 0.8-1.0 (not the decimal -0.2) —
    // the same bits any engine computes, which is the whole point.
    assert(out === Seq((1, 1L, 0.9), (2, 3L, 0.5), (3, 2L, 0.8 - 1.0)))
  }

  test("diversify: k past the shortlist stops at m picks; rel column preserved") {
    val out = Mmr.diversify(shortlist, k = 10).collect()
    assert(out.length === 3)
    assert(out.map(_.getDouble(2)).toSet === Set(0.9, 0.8, 0.5))
  }

  test("diversify refuses a corpus-sized shortlist, loudly") {
    val big = spark.range(50).select($"id", lit(0.5).as("rel"),
      array(lit(1L), lit(0L)).as("qv"))
    val e = intercept[IllegalArgumentException] {
      Mmr.diversify(big, k = 3, maxShortlist = 10)
    }
    assert(e.getMessage.contains("maxShortlist"))
  }
}
