package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.ops.AsOfJoin
import graft.sketch.Kmv

/** Randomized equivalence checks: AsOfJoin against the quadratic
  * reference formulation, Kmv against exact distinct counts. Few
  * iterations, each over a full DataFrame — Spark jobs are the cost. */
class PipelineOpsFuzzSpec extends SparkSpec with GenChecks {

  test("asof == argmax of the quadratic range join on random data") {
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(5, 40)
      nr <- Gen.choose(0, 40)
      lrows <- Gen.listOfN(nl, for {
        k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 50L)
      } yield (k, t))
      rrows <- Gen.listOfN(nr, for {
        k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 50L); v <- Gen.choose(0L, 999L)
      } yield (k, t, v))
    } yield (lrows, rrows)

    forAllN(gen, n = 12) { case (lrows, rrows) =>
      val left = lrows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      val right = rrows.toDF("k", "t", "v")

      val got = AsOfJoin.backward(left, right, key = Seq("k"), time = "t",
          payload = Seq("v"), tiebreak = Seq("v"))
        .select($"lid", $"asof_v").as[(Long, Option[Long])].collect().toMap

      // quadratic reference: per left row, max-(t, v) right row with rt <= lt
      val byKey = rrows.groupBy(_._1)
      val want = lrows.zipWithIndex.map { case ((k, t), i) =>
        val cands = byKey.getOrElse(k, Nil).filter(_._2 <= t)
        i.toLong -> (if (cands.isEmpty) None
                     else Some(cands.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(got === want)
    }
  }

  test("kmv tracks exact counts over random cardinalities and k") {
    import spark.implicits._
    val gen = for {
      distinct <- Gen.choose(1, 3000)
      k <- Gen.oneOf(16, 64, 256)
      dup <- Gen.choose(1, 3)
    } yield (distinct, k, dup)

    forAllN(gen, n = 8) { case (distinct, k, dup) =>
      val df = spark.range(0, distinct.toLong * dup)
        .select((col("id") % distinct).as("v"))
      val est = df.agg(Kmv.distinctEstimate(Kmv.hash60(col("v")), k).as("e"))
        .as[Long].head()
      if (distinct < k) assert(est === distinct.toLong, s"below k must be exact (k=$k)")
      else {
        // KMV relative error ~ 1/sqrt(k); allow 5 sigma
        val tol = 5.0 / math.sqrt(k.toDouble)
        assert(math.abs(est - distinct).toDouble / distinct < tol,
          s"est $est vs $distinct at k=$k")
      }
    }
  }
}
