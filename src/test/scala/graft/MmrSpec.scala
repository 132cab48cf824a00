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

  test("negative sims are rewarded, not clamped to the empty-set zero") {
    // id 2 points OPPOSITE to pick 1 (sim = -1.0): its MMR score is
    // 0.1 - (-1.0) = 1.1, beating the orthogonal id 3's 0.5. An
    // implementation that floors max-sim at 0 (the empty-set rule
    // leaking into later rounds) would pick id 3 — the exact regression
    // the v21 oracle caught once
    val sl = Seq(
      (1L, 0.9, Seq(10000L, 0L)),
      (2L, 0.1, Seq(-10000L, 0L)),
      (3L, 0.5, Seq(0L, 10000L))
    ).toDF("id", "rel", "qv")
    val out = Mmr.diversify(sl, k = 2).orderBy($"rk").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(out == Seq((1, 1L, 0.9), (2, 2L, 0.1 - (-1.0))))
  }

  test("diversify refuses a corpus-sized shortlist, loudly") {
    val big = spark.range(50).select($"id", lit(0.5).as("rel"),
      array(lit(1L), lit(0L)).as("qv"))
    val e = intercept[IllegalArgumentException] {
      Mmr.diversify(big, k = 3, maxShortlist = 10)
    }
    assert(e.getMessage.contains("maxShortlist"))
  }

  test("diversify refuses duplicate shortlist ids, loudly") {
    val dup = Seq(
      (1L, 0.9, Seq(10000L, 0L)),
      (1L, 0.8, Seq(20000L, 0L)),
      (3L, 0.5, Seq(0L, 10000L))
    ).toDF("id", "rel", "qv")
    val e = intercept[IllegalArgumentException] {
      Mmr.diversify(dup, k = 3)
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("driver-loop sims match the Spark round(dot/·,6) expression exactly") {
    // 12 quantized vectors with awkward angles: the driver loop's
    // (cast, sqrt, divide, round6) must be bit-identical to the Spark
    // expression form the sims used to run through
    val rows = (1 to 12).map { i =>
      (i.toLong, 1.0 / i, Seq((i * 137 % 91).toLong, (i * i % 53).toLong, (i * 31 % 17 + 1).toLong))
    }
    val df = rows.toDF("id", "rel", "qv")
    import graft.functions.GraftFunctions
    val cos = round(
      GraftFunctions.dot_long(col("a.qv"), col("b.qv")).cast("double") /
        (sqrt(GraftFunctions.dot_long(col("a.qv"), col("a.qv")).cast("double")) *
         sqrt(GraftFunctions.dot_long(col("b.qv"), col("b.qv")).cast("double"))), 6)
    val sparkSims = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"), cos.as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // replay the greedy loop on the Spark-computed sims
    val rel = rows.map { case (id, rl, _) => (id, rl) }.sortBy(_._1)
    def sim(a: Long, b: Long): Double =
      sparkSims.getOrElse((math.min(a, b), math.max(a, b)), 1.0)
    val picked = collection.mutable.ArrayBuffer.empty[Long]
    val expect = collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    (1 to 5).foreach { r =>
      var bestId = -1L; var bestScore = Double.NegativeInfinity
      rel.foreach { case (id, rl) =>
        if (!picked.contains(id)) {
          val ms = if (picked.isEmpty) 0.0 else picked.map(p => sim(id, p)).max
          val sc = rl - ms
          if (sc > bestScore || (sc == bestScore && id < bestId)) {
            bestId = id; bestScore = sc
          }
        }
      }
      picked += bestId
      expect += ((r, bestId, bestScore))
    }
    val out = Mmr.diversify(df, k = 5).orderBy($"rk").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(out === expect.toSeq)
  }
}
