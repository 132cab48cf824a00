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

  test("asof forward == argmin of the quadratic range join on random data") {
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

      val got = AsOfJoin.forward(left, right, key = Seq("k"), time = "t",
          payload = Seq("v"), tiebreak = Seq("v"))
        .select($"lid", $"asof_v").as[(Long, Option[Long])].collect().toMap

      // quadratic reference: per left row, min-(t, v) right row with rt >= lt
      val byKey = rrows.groupBy(_._1)
      val want = lrows.zipWithIndex.map { case ((k, t), i) =>
        val cands = byKey.getOrElse(k, Nil).filter(_._2 >= t)
        i.toLong -> (if (cands.isEmpty) None
                     else Some(cands.minBy(r => (r._2, r._3))._3))
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

  test("removeDuplicatedSpans == brute-force string replay on random corpora") {
    import spark.implicits._
    val n = 4
    // small vocab + seeded boilerplate runs force heavy gram collisions:
    // cross-doc dups, within-doc repeats, full-doc wipes, and docs
    // shorter than n all occur across the rounds
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val gen = for {
      nDocs <- Gen.choose(4, 18)
      boiler <- Gen.listOfN(10, Gen.choose(0, vocab.size - 1))
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 22)
        toks <- Gen.listOfN(len, Gen.choose(0, vocab.size - 1))
        insertBoiler <- Gen.choose(0, 2) // 2-in-3 docs carry the boilerplate
        at <- Gen.choose(0, len)
      } yield {
        val base = toks.map(vocab)
        if (insertBoiler > 0) base.take(at) ++ boiler.map(vocab) ++ base.drop(at)
        else base
      })
    } yield docs.map(_.mkString(" "))

    forAllN(gen, n = 15) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.dedup.Dedup.removeDuplicatedSpans(df, "doc_id", "text", n)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      // independent replay on gram STRINGS (no hashes): corpus-wide
      // occurrence census, covered = any duplicated n-gram's span
      val tokss = texts.map(_.split(" ").toVector)
      val counts = scala.collection.mutable.Map.empty[Seq[String], Int]
      for (tk <- tokss; i <- 0 to tk.length - n)
        counts.updateWith(tk.slice(i, i + n))(c => Some(c.getOrElse(0) + 1))
      tokss.zipWithIndex.foreach { case (tk, id) =>
        val covered = Array.fill(tk.length)(false)
        for (i <- 0 to tk.length - n; if counts(tk.slice(i, i + n)) > 1;
             j <- i until i + n) covered(j) = true
        val kept = tk.indices.filterNot(covered).map(tk)
        val want = (tk.length.toLong, covered.count(identity).toLong, kept.mkString(" "))
        assert(got(id.toLong) == want, s"doc $id: got ${got(id.toLong)}, want $want")
      }
    }
  }
}
