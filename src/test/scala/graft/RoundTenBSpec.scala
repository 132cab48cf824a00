package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Specs for the second round-10 batch: AMS F2 sketch, gap fill,
  * grid-blocked spatial radius join. Each operator gets a
  * hand-computable unit case plus a randomized equivalence check
  * against a quadratic / scala-reference formulation. */
class RoundTenBSpec extends SparkSpec with GenChecks {

  // ---------------------------------------------------------------- Ams

  test("Ams: d=1 counter z equals the scala sign sum; estimate = z²") {
    import spark.implicits._
    val vals = Seq("a", "b", "a", "c", "a", "b")
    val df = vals.toDF("v")
    val sk = graft.sketch.Ams.f2Sketch(df, $"v", d = 1)
    val z = sk.select($"z").as[Long].collect().head
    // scala reference: sign from the same md5-derived hash family
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def sign(j: Int, v: String): Long = 1L - 2L * ((hash60(v) >> j) & 1L)
    val want = vals.map(sign(0, _)).sum
    assert(z === want)
    val est = graft.sketch.Ams.f2Estimate(sk, d = 1).select($"est").as[Long].collect().head
    assert(est === want * want)
  }

  test("Ams: d=3 counters match per-bit scala signs") {
    import spark.implicits._
    val vals = (1 to 100).map(i => s"w${i % 23}")
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val got = graft.sketch.Ams.f2Sketch(vals.toDF("v"), $"v", d = 3)
      .orderBy($"j").as[(Int, Long)].collect().toSeq
    val want = (0 until 3).map(j =>
      (j, vals.map(v => 1L - 2L * ((hash60(v) >> j) & 1L)).sum))
    assert(got === want)
  }

  test("Ams: estimate is within 4/sqrt(d) relative error of exact F2 on a zipf-ish stream") {
    import spark.implicits._
    // zipf-ish: value i appears ~ 200/i times
    val vals = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"v$i"))
    val df = vals.toDF("v")
    val exact = vals.groupBy(identity).map { case (_, g) => g.size.toLong * g.size }.sum
    val d = 9
    val est = graft.sketch.Ams.f2Estimate(
      graft.sketch.Ams.f2Sketch(df, $"v", d), d).select($"est").as[Long].collect().head
    // AMS variance bound: relative std ≤ sqrt(2); median-of-9 tightens it.
    // This is a sanity envelope, not a tight bound.
    val rel = math.abs(est.toDouble - exact) / exact
    assert(rel <= 4.0 / math.sqrt(d.toDouble), s"est=$est exact=$exact rel=$rel")
  }

  test("Ams: sketch is partitioning-invariant (1 vs 13 partitions)") {
    import spark.implicits._
    val vals = (1 to 500).map(i => s"t${i % 37}")
    val a = graft.sketch.Ams.f2Sketch(vals.toDF("v").repartition(1), $"v", d = 5)
      .orderBy($"j").as[(Int, Long)].collect().toSeq
    val b = graft.sketch.Ams.f2Sketch(vals.toDF("v").repartition(13), $"v", d = 5)
      .orderBy($"j").as[(Int, Long)].collect().toSeq
    assert(a === b)
  }

  // ------------------------------------------------------------ GapFill

  test("GapFill.forwardFill: hand case — holes carried, leading stays null") {
    import spark.implicits._
    val obs = Seq(("a", 10L, 5L), ("a", 13L, 7L), ("b", 12L, 1L)).toDF("k", "b", "v")
    val got = graft.ops.GapFill.forwardFill(obs, "k", "b", "v")
      .orderBy($"k", $"b")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getInt(3)))
      .toSeq
    // global grid [10, 13] for both keys
    assert(got === Seq(
      ("a", 10L, 5L, 0), ("a", 11L, 5L, 1), ("a", 12L, 5L, 1), ("a", 13L, 7L, 0),
      ("b", 10L, -1L, 2), ("b", 11L, -1L, 2), ("b", 12L, 1L, 0), ("b", 13L, 1L, 1)))
  }

  test("GapFill.forwardFill == scala reference on random sparse series") {
    import spark.implicits._
    val gen = for {
      nk <- Gen.choose(1, 4)
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0, nk - 1)
        b <- Gen.choose(0L, 20L)
        v <- Gen.choose(-50L, 50L)
      } yield (s"k$k", b, v))
    } yield rows.distinctBy(r => (r._1, r._2)) // one row per (key, bucket)
    forAllN(gen, n = 8) { rows =>
      val obs = rows.toDF("k", "b", "v")
      val got = graft.ops.GapFill.forwardFill(obs, "k", "b", "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          Option(if (r.isNullAt(2)) null else r.getLong(2)), r.getInt(3)))
        .toSet
      val lo = rows.map(_._2).min
      val hi = rows.map(_._2).max
      val byKey = rows.groupBy(_._1)
      val want = (for {
        k <- byKey.keys.toSeq
        m = byKey(k).map(r => r._2 -> r._3).toMap
        b <- lo to hi
      } yield {
        val carried = (lo to b).reverse.collectFirst { case i if m.contains(i) => m(i) }
        val filled = if (m.contains(b)) 0 else if (carried.isDefined) 1 else 2
        (k, b, carried.map(_.asInstanceOf[Any]), filled)
      }).toSet
      assert(got === want, s"rows=$rows")
    }
  }

  // -------------------------------------------------------- SpatialJoin

  test("SpatialJoin.radiusJoin == quadratic all-pairs on random integer points") {
    import spark.implicits._
    val gen = for {
      na <- Gen.choose(1, 30); nb <- Gen.choose(1, 30)
      as <- Gen.listOfN(na, Gen.zip(Gen.choose(-100L, 100L), Gen.choose(-100L, 100L)))
      bs <- Gen.listOfN(nb, Gen.zip(Gen.choose(-100L, 100L), Gen.choose(-100L, 100L)))
      r2 <- Gen.oneOf(0L, 25L, 400L, 2500L)
      margin <- Gen.choose(0L, 20L)
    } yield (as, bs, r2, math.ceil(math.sqrt(r2.toDouble)).toLong.max(1L) + margin)
    forAllN(gen, n = 8) { case (as, bs, r2, cs) =>
      val a = as.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }.toDF("aid", "x", "y")
      val b = bs.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }.toDF("bid", "x", "y")
      val got = graft.ops.SpatialJoin.radiusJoin(a, b, cs, r2)
        .select($"aid", $"b_bid", $"d2").as[(Long, Long, Long)].collect().toSet
      val want = (for {
        ((ax, ay), ai) <- as.zipWithIndex
        ((bx, by), bi) <- bs.zipWithIndex
        d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
        if d2 <= r2
      } yield (ai.toLong, bi.toLong, d2)).toSet
      assert(got === want, s"r2=$r2 cs=$cs")
    }
  }

  // --------------------------------------------------------- Compaction

  test("Compaction.binBySize == scala prefix-sum reference; bins fill to target") {
    import spark.implicits._
    val gen = for {
      ng <- Gen.choose(1, 3)
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, ng - 1)
        b <- Gen.choose(1L, 500L)
      } yield (s"g$g", b))
      target <- Gen.oneOf(256L, 1000L, 4096L)
    } yield (rows.zipWithIndex.map { case ((g, b), i) => (g, i.toLong, b) }, target)
    forAllN(gen, n = 8) { case (rows, target) =>
      val df = rows.toDF("src", "fid", "bytes")
      val got = graft.ops.Compaction.binBySize(df, $"src", $"fid", $"bytes", target)
        .select($"src", $"fid", $"bin").as[(String, Long, Long)].collect().toSet
      val want = rows.groupBy(_._1).flatMap { case (_, grp) =>
        var cum = 0L
        grp.sortBy(_._2).map { case (g, fid, b) =>
          val bin = cum / target; cum += b; (g, fid, bin)
        }
      }.toSet
      assert(got === want, s"target=$target rows=$rows")
      // fill law: every bin but the last in each group spans >= target bytes
      // (the next file started a new bin only because the running sum crossed)
      val byBin = rows.groupBy(_._1).flatMap { case (g, grp) =>
        var cum = 0L
        val binned = grp.sortBy(_._2).map { case (_, _, b) =>
          val bin = cum / target; cum += b; (bin, b)
        }
        val last = binned.map(_._1).max
        binned.groupBy(_._1).collect {
          case (bin, fs) if bin < last => (g, bin, fs.map(_._2).sum)
        }
      }
      byBin.foreach { case (g, bin, tot) =>
        assert(tot >= target - 499L, s"group $g bin $bin underfilled: $tot")
      }
    }
  }

  test("Compaction.binBySize is deterministic across partitionings") {
    import spark.implicits._
    val rows = (1 to 200).map(i => (s"s${i % 4}", i.toLong, (i * 37L) % 300 + 1))
    def run(parts: Int) =
      graft.ops.Compaction.binBySize(rows.toDF("src", "fid", "bytes").repartition(parts),
          $"src", $"fid", $"bytes", 1024L)
        .select($"src", $"fid", $"bin").as[(String, Long, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(1) === run(13))
  }

  test("SpatialJoin.radiusJoin refuses a cell smaller than the radius") {
    import spark.implicits._
    val p = Seq((1L, 0L, 0L)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      graft.ops.SpatialJoin.radiusJoin(p, p, cellSize = 3L, r2 = 100L)
    }
    assert(e.getMessage.contains("3×3"))
  }

  test("SpatialJoin.radiusJoin plans a hash join on cells, not a nested loop") {
    import spark.implicits._
    val pts = (1 to 200).map(i => (i.toLong, (i * 7L) % 97, (i * 13L) % 89))
    val a = pts.toDF("aid", "x", "y")
    val b = pts.toDF("bid", "x", "y")
    val plan = graft.ops.SpatialJoin.radiusJoin(a, b, 16L, 256L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected an equi-join on cells, got:\n$plan")
  }
}
