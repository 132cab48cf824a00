package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Randomized equivalence checks for the round-10 operators, each
  * against a quadratic / scala-reference formulation: containment
  * prefix-filter losslessness, bucketed range join, bounded-state
  * top-k, changeset merge. Few iterations — Spark jobs are the cost. */
class RoundTenFuzzSpec extends SparkSpec with GenChecks {

  test("containmentPairs == exact all-pairs containment on random word docs") {
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val doc = Gen.choose(2, 9).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val gen = for {
      nd <- Gen.choose(4, 14)
      docs <- Gen.listOfN(nd, doc)
      tp <- Gen.oneOf(600, 750, 900, 1000)
    } yield (docs, tp)
    forAllN(gen, n = 8) { case (docs, tp) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val fast = graft.dedup.Dedup.containmentPairs(df, "doc_id", "text", n = 1, tPermille = tp)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      // quadratic reference on token SETS (n=1 shingles)
      val sets = docs.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split(" ").filter(_.nonEmpty).toSet
      }.filter(_._2.nonEmpty)
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
        inter = (sa & sb).size
        if inter * 1000L / sa.size >= tp
      } yield (ia, ib)).toSet
      assert(fast === want, s"docs=$docs tp=$tp")
    }
  }

  test("RangeJoin.byBuckets == quadratic theta join on random timestamps") {
    import spark.implicits._
    val ts = Gen.choose(0L, 100000L) // seconds
    val gen = for {
      nl <- Gen.choose(1, 25); nr <- Gen.choose(0, 25)
      ls <- Gen.listOfN(nl, ts); rs <- Gen.listOfN(nr, ts)
      lo <- Gen.choose(-5000L, 1000L)
      span <- Gen.choose(0L, 6000L)
      bucket <- Gen.oneOf(97L, 500L, 1024L, 7919L)
    } yield (ls, rs, lo, lo + span, bucket)
    forAllN(gen, n = 10) { case (ls, rs, lo, hi, bucket) =>
      if ((hi - lo) / bucket + 2 <= 64) {
        val left = ls.zipWithIndex.map { case (t, i) =>
          (i.toLong, new java.sql.Timestamp(t * 1000L)) }.toDF("lid", "lts")
        val right = rs.zipWithIndex.map { case (t, i) =>
          (i.toLong, new java.sql.Timestamp(t * 1000L)) }.toDF("rid", "rts")
        val got = graft.ops.RangeJoin.byBuckets(left, right, $"lts", $"rts", lo, hi, bucket)
          .select($"lid", $"rid").as[(Long, Long)].collect().toSet
        val want = (for {
          (lt, li) <- ls.zipWithIndex; (rt, ri) <- rs.zipWithIndex
          if rt >= lt + lo && rt <= lt + hi
        } yield (li.toLong, ri.toLong)).toSet
        assert(got === want, s"lo=$lo hi=$hi bucket=$bucket")
      }
    }
  }

  test("TopK.perGroup == sorted-take reference on random groups") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0L, 4L); v <- Gen.choose(-50L, 50L)
      } yield (g, v))
      k <- Gen.choose(1, 6)
    } yield (rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }, k)
    forAllN(gen, n = 10) { case (rows, k) =>
      val df = rows.toDF("g", "v", "id")
      val got = graft.ops.TopK.perGroup(df, Seq("g"), $"v", $"id", k)
        .select($"g", $"rk", $"id", $"key")
        .as[(Long, Int, Long, Long)].collect().toSet
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.map(r => (r._2, r._3)).sorted.take(k).zipWithIndex
          .map { case ((v, id), i) => (g, i + 1, id, v) }
      }.toSet
      assert(got === want)
    }
  }

  test("Merge.applyChangeset == map-reference semantics on random changesets") {
    import spark.implicits._
    val gen = for {
      snapIds <- Gen.someOf(0L to 15L)
      chIds <- Gen.someOf(0L to 15L)
      ops <- Gen.listOfN(chIds.size, Gen.oneOf("upsert", "delete"))
    } yield (snapIds.toList.sorted, chIds.toList.sorted.zip(ops))
    forAllN(gen, n = 10) { case (snapIds, changes) =>
      val snap = snapIds.map(i => (i, s"v$i")).toDF("id", "payload")
      val ch = changes.map { case (i, op) => (op, i, s"new$i") }.toDF("op", "id", "payload")
      val got = graft.ops.Merge.applyChangeset(snap, ch, "id", "op")
        .as[(Long, String)].collect().toMap
      val want = changes.foldLeft(snapIds.map(i => i -> s"v$i").toMap) {
        case (m, (i, "upsert")) => m + (i -> s"new$i")
        case (m, (i, "delete")) => m - i
        case (m, _) => m
      }
      assert(got === want)
    }
  }
}
