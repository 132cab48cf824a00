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

  // ---- round-10C late additions: KN scoring, interleave, patch/VAD kernels

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def h60(s: String): BigInt = BigInt(md5hex(s).take(15), 16)

  test("KneserNey.score == driver replay on random corpora (both branches)") {
    import spark.implicits._
    val B = 32
    val word = Gen.oneOf("a", "b", "c", "d", "e", "zz", "qq")
    val doc = Gen.choose(0, 7).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val gen = for {
      nr <- Gen.choose(1, 6); ref <- Gen.listOfN(nr, doc)
      nt <- Gen.choose(1, 5); tgt <- Gen.listOfN(nt, doc)
    } yield (ref, tgt)
    forAllN(gen, n = 5) { case (ref, tgt) =>
      val refDf = ref.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val docs = tgt.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val cen = graft.text.KneserNey.bigramCensus(refDf, "text", B)
      val got = graft.text.KneserNey.score(docs, "doc_id", "text", cen, B)
        .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
      // driver replay
      val big = scala.collection.mutable.Map.empty[(Long, Long), Long]
      def bk(w: String) = (h60(w) % B).toLong
      ref.foreach(_.split(" ", -1).sliding(2).filter(_.length == 2).foreach { p =>
        val k = (bk(p(0)), bk(p(1))); big(k) = big.getOrElse(k, 0L) + 1
      })
      val cp = big.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
      val n1p = big.groupBy(_._1._1).map { case (k, m) => k -> m.size.toLong }
      val n1c = big.groupBy(_._1._2).map { case (k, m) => k -> m.size.toLong }
      val nt = big.size.toLong
      val want = tgt.zipWithIndex.map { case (t, i) =>
        var sc = 0L; var np = 0L; var bo = 0L
        t.split(" ", -1).sliding(2).filter(_.length == 2).foreach { p =>
          val pcont = (n1c.getOrElse(bk(p(1)), 0L) + 1).toDouble / (nt + B).toDouble
          val prob =
            if (cp.getOrElse(bk(p(0)), 0L) > 0)
              (math.max(big.getOrElse((bk(p(0)), bk(p(1))), 0L).toDouble - 0.75, 0.0) +
                (0.75 * n1p(bk(p(0))).toDouble) * pcont) / cp(bk(p(0))).toDouble
            else { bo += 1; pcont }
          sc += math.floor(-math.log(prob) * 1e6 + 0.5).toLong; np += 1
        }
        (i.toLong, sc, np, bo)
      }
      assert(got === want, s"ref=$ref tgt=$tgt")
    }
  }

  test("interleaveOrder == fair-queueing replay on random group mixes") {
    import spark.implicits._
    val gen = for {
      sizes <- Gen.listOfN(4, Gen.choose(0, 9))
    } yield sizes
    forAllN(gen, n = 5) { sizes =>
      val rows = sizes.zipWithIndex.flatMap { case (m, g) =>
        (0 until m).map(j => ((g * 100 + j).toLong, s"g$g"))
      }
      if (rows.nonEmpty) {
        val df = rows.toDF("doc_id", "lang")
        val got = graft.ops.Sample.interleaveOrder(df, "lang", $"doc_id")
          .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
        val keyed = rows.groupBy(_._2).toSeq.flatMap { case (lang, rs) =>
          rs.map(_._1).sortBy(id => (h60(id.toString), id)).zipWithIndex.map {
            case (id, r0) =>
              val r = r0 + 1
              ((BigInt(2 * r - 1) * BigInt("1000000000000000000")) / (2 * rs.size),
                lang, r, id)
          }
        }.sortBy(t => (t._1, t._2, t._3))
        val want = keyed.zipWithIndex.map { case ((_, _, _, id), i) => id -> (i + 1).toLong }.toMap
        assert(got === want, s"sizes=$sizes")
      }
    }
  }

  test("AsOfJoin.interpolate == bracket-and-lerp reference on random series") {
    import spark.implicits._
    val gen = for {
      nr <- Gen.choose(0, 10)
      rts <- Gen.listOfN(nr, Gen.choose(0L, 50L))
      rvs <- Gen.listOfN(nr, Gen.choose(0L, 1000L))
      nl <- Gen.choose(1, 8)
      lts <- Gen.listOfN(nl, Gen.choose(-5L, 60L))
    } yield (rts.zip(rvs), lts)
    forAllN(gen, n = 8) { case (rightRows, leftTs) =>
      val right = rightRows.zipWithIndex
        .map { case ((t, v), i) => (i.toLong, "k", t, v) }
        .toDF("event_id", "key", "tm", "vq")
      val left = leftTs.zipWithIndex.map { case (t, i) => (i.toLong, "k", t) }
        .toDF("id", "key", "tm")
      val got = graft.ops.AsOfJoin.interpolate(left, right, Seq("key"), "tm", "vq",
          tiebreak = Seq("event_id"))
        .select($"id", $"lerp_q").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      leftTs.zipWithIndex.foreach { case (t, i) =>
        // backward bracket: latest tm <= t, ties -> max event_id;
        // forward: earliest tm > t (strict), ties -> min event_id
        val indexed = rightRows.zipWithIndex.map { case ((rt, rv), ei) => (rt, rv, ei) }
        val b = indexed.filter(_._1 <= t)
          .sortBy(r => (-r._1, -r._3)).headOption
        val f = indexed.filter(_._1 > t)
          .sortBy(r => (r._1, r._3)).headOption
        val want = (b, f) match {
          case (Some((tb, vb, _)), Some((tf, vf, _))) =>
            Some(((BigInt(vb) * 1000000 * (tf - t) + BigInt(vf) * 1000000 * (t - tb)) /
              (tf - tb)).toLong)
          case (Some((_, vb, _)), None) => Some(vb * 1000000L)
          case (None, Some((_, vf, _))) => Some(vf * 1000000L)
          case _ => None
        }
        assert(got(i.toLong) === want, s"t=$t right=$rightRows")
      }
    }
  }

  test("patchStats == naive reference on random rasters") {
    val gen = for {
      w <- Gen.choose(1, 20); h <- Gen.choose(1, 20); p <- Gen.choose(1, 4)
      px <- Gen.listOfN(w * h, Gen.choose(0, 255))
    } yield (w, h, p, px.toArray)
    forAllN(gen, n = 60) { case (w, h, p, px) =>
      val got = graft.multimodal.Patches.patchStats(px, w, h, p)
      val nPr = h / p; val nPc = w / p
      val sums = for (pr <- 0 until nPr; pc <- 0 until nPc) yield
        (for (i <- 0 until p; j <- 0 until p) yield px((pr * p + i) * w + pc * p + j).toLong).sum
      val want =
        if (sums.isEmpty) (nPr, nPc, 0L, 0L, -1, 0L)
        else (nPr, nPc, sums.sum, sums.max, sums.indexOf(sums.max),
              sums.count(_ == 0L).toLong)
      assert(got === want, s"w=$w h=$h p=$p")
    }
  }

  test("WordPiece.train == driver greedy-merge reference on random corpora") {
    import spark.implicits._
    // includes supplementary-plane words: the reference below splits by
    // CODE POINT (Spark substring semantics) — a UTF-16 reference would
    // hand the merge loop lone surrogates and diverge
    val word = Gen.oneOf("ab", "abc", "cd", "aab", "bc", "a", "d",
      "😀b", "a😀", "😀😀")
    val gen = for {
      n <- Gen.choose(3, 20)
      ws <- Gen.listOfN(n, word)
    } yield ws
    forAllN(gen, n = 5) { ws =>
      val df = Seq((1L, ws.mkString(" "))).toDF("doc_id", "text")
      val got = graft.text.WordPiece.train(df, "text", numMerges = 3)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(4), r.getLong(5))).toSeq
      val gotLocal = graft.text.WordPiece.trainLocal(df, "text", numMerges = 3)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(4), r.getLong(5))).toSeq
      assert(gotLocal === got, s"trainLocal diverged, ws=$ws")
      // driver replay: word census -> per-round symbol+pair census ->
      // score argmax -> greedy merge; seed symbols are CODE POINTS
      def cps(w: String): Vector[String] = {
        val b = Vector.newBuilder[String]
        var off = 0
        while (off < w.length) {
          val next = w.offsetByCodePoints(off, 1)
          b += w.substring(off, next); off = next
        }
        b.result()
      }
      var words = ws.groupBy(identity).map { case (w, g) =>
        (cps(w), g.size.toLong)
      }.toVector
      val want = Seq.newBuilder[(Int, String, String, Long, Long)]
      for (r <- 1 to 3) {
        val sym = scala.collection.mutable.Map.empty[String, Long]
        val pair = scala.collection.mutable.Map.empty[(String, String), Long]
        words.foreach { case (s, cnt) =>
          s.foreach(x => sym(x) = sym.getOrElse(x, 0L) + cnt)
          s.sliding(2).filter(_.length == 2).foreach { p =>
            val k = (p(0), p(1)); pair(k) = pair.getOrElse(k, 0L) + cnt
          }
        }
        if (pair.nonEmpty) {
          val scored = pair.toSeq.map { case ((a, b), c) =>
            val sq = (BigInt(c) * BigInt("1000000000000") /
              (BigInt(sym(a)) * sym(b))).toLong
            (a, b, c, sq)
          }
          val (a, b, c, sq) = scored.minBy { case (a, b, _, sq) => (-sq, a, b) }
          want += ((r, a, b, c, sq))
          words = words.map { case (s, cnt) =>
            val out = Vector.newBuilder[String]
            var acc = Vector.empty[String]
            s.foreach { x =>
              if (acc.nonEmpty && acc.last == a && x == b)
                acc = acc.dropRight(1) :+ (a + b)
              else acc = acc :+ x
            }
            (acc, cnt)
          }
        }
      }
      assert(got === want.result(), s"ws=$ws")
    }
  }

  test("vadStats == islands reference on random frames") {
    val gen = for {
      nb <- Gen.choose(0, 300)
      b <- Gen.listOfN(nb, Gen.choose(0, 255))
      fl <- Gen.oneOf(4, 8, 16)
      thr <- Gen.oneOf(0L, 5000L, 50000L)
    } yield (b.map(_.toByte).toArray, fl, thr)
    forAllN(gen, n = 60) { case (b, fl, thr) =>
      val got = graft.multimodal.Audio.vadStats(b, fl, thr)
      val frames = b.length / fl
      val active = (0 until frames).map { f =>
        (0 until fl).map { i => val v = (b(f * fl + i) & 0xff) - 64; v.toLong * v }.sum > thr
      }
      val runs = active.foldLeft(List.empty[Long]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true) => 1L :: acc
        case (acc, false) => 0L :: acc
      }.filter(_ > 0)
      val want = (frames, active.count(identity).toLong, runs.size.toLong,
        if (runs.isEmpty) 0L else runs.max)
      assert(got === want, s"len=${b.length} fl=$fl thr=$thr")
    }
  }
}
