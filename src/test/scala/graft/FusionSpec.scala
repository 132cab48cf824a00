package graft

import graft.ops.Fusion

/** Reciprocal-rank fusion against closed-form integer scores. */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def P = 1000000000000L

  test("rrf: consensus beats a single #1; exact integer contributions; ties by id") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rk")
    val b = Seq((2L, 1), (3L, 2), (4L, 3)).toDF("id", "rk")
    val out = Fusion.rrf(Seq(a, b), topK = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // id 2: 1/(60+2) + 1/(60+1); id 3: 1/(60+3) + 1/(60+2); id 1: 1/61; id 4: 1/63
    val want = Seq(
      (1, 2L, P / 62 + P / 61, 2L),
      (2, 3L, P / 63 + P / 62, 2L),
      (3, 1L, P / 61, 1L),
      (4, 4L, P / 63, 1L))
    assert(out === want)
  }

  test("rrf: equal scores tie-break ascending by id; topK truncates") {
    val a = Seq((9L, 1), (5L, 2)).toDF("id", "rk")
    val b = Seq((3L, 1), (7L, 2)).toDF("id", "rk")
    val out = Fusion.rrf(Seq(a, b), topK = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    // ranks 1 and 1 tie (3 vs 9 -> 3 first), then 2 and 2 (5 before 7, cut at topK)
    assert(out === Seq((1, 3L), (2, 9L), (3, 5L)))
  }

  test("rrf: single list is rank-preserving; bad args refused") {
    val a = Seq((4L, 1), (8L, 2)).toDF("id", "rk")
    val out = Fusion.rrf(Seq(a), topK = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(out === Seq((1, 4L), (2, 8L)))
    intercept[IllegalArgumentException] { Fusion.rrf(Nil, topK = 1) }
    intercept[IllegalArgumentException] { Fusion.rrf(Seq(a), topK = 0) }
  }
}
