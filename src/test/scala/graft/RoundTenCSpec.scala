package graft

import org.apache.spark.sql.functions._
import graft.text.KneserNey
import graft.ops.Sample
import graft.dedup.Dedup
import graft.multimodal.Audio

/** Round-10 late additions: Kneser-Ney LM, proportional interleave,
  * soft dedup weights, VAD segmentation — each against an independent
  * driver-side replay or a closed-form property. */
class RoundTenCSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def bucket(s: String, b: Int = B): Long =
    (BigInt(md5hex(s).take(15), 16) % b).toLong

  // ------------------------------------------------------- Kneser-Ney

  /** Independent driver-side replay of the engine formula. */
  private def knExpected(refTexts: Seq[String], text: String,
                         d: Double = 0.75): (Long, Long, Long) = {
    val big = scala.collection.mutable.Map.empty[(Long, Long), Long]
    refTexts.foreach { t =>
      t.split(" ", -1).sliding(2).filter(_.length == 2).foreach { p =>
        val k = (bucket(p(0)), bucket(p(1))); big(k) = big.getOrElse(k, 0L) + 1
      }
    }
    val cp = big.groupBy(_._1._1).map { case (bp, m) => bp -> m.values.sum }
    val n1p = big.groupBy(_._1._1).map { case (bp, m) => bp -> m.size.toLong }
    val n1c = big.groupBy(_._1._2).map { case (bc, m) => bc -> m.size.toLong }
    val nt = big.size.toLong
    var score = 0L; var nPos = 0L; var nBo = 0L
    text.split(" ", -1).sliding(2).filter(_.length == 2).foreach { p =>
      val bp = bucket(p(0)); val bc = bucket(p(1))
      val pcont = (n1c.getOrElse(bc, 0L) + 1).toDouble / (nt + B).toDouble
      val prob =
        if (cp.getOrElse(bp, 0L) > 0) {
          (math.max(big.getOrElse((bp, bc), 0L).toDouble - d, 0.0) +
            (d * n1p(bp).toDouble) * pcont) / cp(bp).toDouble
        } else { nBo += 1; pcont }
      score += math.floor(-math.log(prob) * 1e6 + 0.5).toLong
      nPos += 1
    }
    (score, nPos, nBo)
  }

  test("KneserNey: both branches match the independent replay") {
    val ref = Seq("the cat sat on the mat", "the dog sat on the rug",
                  "a cat and a dog", "the cat ate the fish")
    val target = Seq("the cat sat on the rug",      // mostly seen
                     "zzz qqq unseen prev tokens")  // backoff-heavy
    val refDf = ref.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val docs = target.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val cen = KneserNey.bigramCensus(refDf, "text", B)
    val got = KneserNey.score(docs, "doc_id", "text", cen, B)
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect()
    target.zipWithIndex.foreach { case (t, i) =>
      val (s, n, bo) = knExpected(ref, t)
      assert(got(i) === ((i.toLong, s, n, bo)), s"doc $i")
    }
    // the second doc must actually exercise the backoff branch
    assert(got(1)._4 > 0)
  }

  test("KneserNey: < 2 tokens scores (0, 0, 0); result is parallelism-invariant") {
    val refDf = Seq((1L, "x y x z")).toDF("doc_id", "text")
    val docs = Seq((1L, "solo"), (2L, "x y")).toDF("doc_id", "text")
    val cen = KneserNey.bigramCensus(refDf, "text", B)
    val r1 = KneserNey.score(docs, "doc_id", "text", cen, B)
      .orderBy($"doc_id").collect()
    assert(r1(0).getLong(1) === 0L && r1(0).getLong(2) === 0L)
    val r4 = KneserNey.score(docs.repartition(4), "doc_id", "text", cen, B)
      .orderBy($"doc_id").collect()
    assert(r1.toSeq === r4.toSeq)
  }

  // ------------------------------------------------- interleaveOrder

  test("interleaveOrder: pos is a permutation and groups spread evenly") {
    val rows = (1L to 40L).map(i => (i, if (i % 4 == 0) "small" else "big"))
    val df = rows.toDF("doc_id", "lang")
    val out = Sample.interleaveOrder(df, "lang", $"doc_id")
    val pos = out.select($"pos").as[Long].collect().sorted
    assert(pos.toSeq === (1L to 40L))
    // evenness: a group with m of N rows never waits longer than
    // ceil(N/m) + (#groups) positions between occurrences
    val byLang = out.select($"lang", $"pos").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val n = 40
    byLang.foreach { case (lang, ps) =>
      val m = ps.size
      val maxGap = (ps.head +: ps.sliding(2).collect { case Seq(a, b) => b - a }.toSeq).max
      assert(maxGap <= n / m + 2, s"$lang gap $maxGap")
    }
    // deterministic: same input, same order
    val again = Sample.interleaveOrder(df, "lang", $"doc_id")
      .select($"doc_id", $"pos").as[(Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq === out.select($"doc_id", $"pos").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq)
    // no single-partition window anywhere in the plan (the global-rank
    // trap this operator exists to avoid)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"global rank must not serialize through one task:\n$plan")
  }

  test("interleaveOrder: matches the driver-side fair-queueing replay") {
    val rows = (1L to 12L).map(i => (i, if (i <= 8) "a" else "b"))
    val df = rows.toDF("doc_id", "lang")
    val got = Sample.interleaveOrder(df, "lang", $"doc_id")
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    // replay: rank per group by (md5-hash, id), key = (2r-1)*1e18 / (2m)
    val byLang = rows.groupBy(_._2)
    val keyed = byLang.toSeq.flatMap { case (lang, rs) =>
      val ranked = rs.map(_._1).sortBy(id => (bucket60(id), id)).zipWithIndex
      ranked.map { case (id, r0) =>
        val r = r0 + 1
        val key = (BigInt(2 * r - 1) * BigInt("1000000000000000000")) / (2 * rs.size)
        (key, lang, r, id)
      }
    }.sortBy(t => (t._1, t._2, t._3))
    keyed.zipWithIndex.foreach { case ((_, _, _, id), i) =>
      assert(got(id) === (i + 1).toLong, s"doc $id")
    }
  }

  private def bucket60(id: Long): BigInt = BigInt(md5hex(id.toString).take(15), 16)

  test("interleaveOrderPhased: phases stay contiguous and each phase interleaves") {
    // phase 1: a(4) b(2); phase 2: a(2) b(4)
    val rows = Seq(
      (1L, "a", 1), (2L, "a", 1), (3L, "a", 1), (4L, "a", 1), (5L, "b", 1), (6L, "b", 1),
      (7L, "a", 2), (8L, "a", 2), (9L, "b", 2), (10L, "b", 2), (11L, "b", 2), (12L, "b", 2))
    val df = rows.toDF("doc_id", "lang", "phase")
    val out = Sample.interleaveOrderPhased(df, "phase", "lang", $"doc_id")
      .select($"doc_id", $"lang", $"phase", $"pos")
      .as[(Long, String, Int, Long)].collect().sortBy(_._4)
    assert(out.map(_._4).toSeq === (1L to 12L))
    // every phase-1 position precedes every phase-2 position
    val p1 = out.filter(_._3 == 1).map(_._4); val p2 = out.filter(_._3 == 2).map(_._4)
    assert(p1.max < p2.min)
    // within each phase the order matches the unphased interleave of
    // that phase's rows (pos shifted by the phase offset)
    for (ph <- Seq(1, 2)) {
      val slice = rows.filter(_._3 == ph).map { case (id, g, _) => (id, g) }
      val want = Sample.interleaveOrder(slice.toDF("doc_id", "lang"), "lang", $"doc_id")
        .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
      val offset = out.filter(_._3 == ph).map(_._4).min - 1
      out.filter(_._3 == ph).foreach { case (id, _, _, pos) =>
        assert(pos - offset === want(id), s"phase $ph doc $id")
      }
    }
  }

  test("interleaveOrder: reserved column names are rejected") {
    val df = Seq((1L, "a", 5)).toDF("doc_id", "lang", "pos")
    intercept[IllegalArgumentException] {
      Sample.interleaveOrder(df, "lang", $"doc_id")
    }
  }

  // ------------------------------------------------ WordPiece.train

  test("WordPiece: likelihood argmax beats raw count; scores replay exactly") {
    // (a,b) is the most FREQUENT pair (10) but 'a'/'b' are diluted by
    // singles (ca=cb=15); (c,d) is rarer (3) but perfectly cohesive
    // (cc=cd=3) -> WordPiece must pick (c,d) first where BPE picks (a,b)
    val docs = (Seq.fill(10)("ab") ++ Seq.fill(3)("cd") ++
      Seq.fill(5)("a") ++ Seq.fill(5)("b")).mkString(" ")
    val df = Seq((1L, docs)).toDF("doc_id", "text")
    val wp = graft.text.WordPiece.train(df, "text", numMerges = 1).collect()
    assert(wp.length === 1)
    assert((wp(0).getString(1), wp(0).getString(2)) === (("c", "d")))
    assert(wp(0).getLong(4) === 3L)
    // sq = floor(3e12 / (3*3))
    assert(wp(0).getLong(5) === 3000000000000L / 9)
    val bpe = graft.text.Bpe.train(df, "text", numMerges = 1)
      .select($"left", $"right").collect()
    assert((bpe(0).getString(0), bpe(0).getString(1)) === (("a", "b")))
    // parallelism invariance of a 2-round train
    val r1 = graft.text.WordPiece.train(df, "text", 2).collect().map(_.toSeq)
    val r4 = graft.text.WordPiece.train(df.repartition(4), "text", 2)
      .collect().map(_.toSeq)
    assert(r1.toSeq === r4.toSeq)
  }

  // ------------------------------------------------ AsOfJoin.interpolate

  test("interpolate: brackets lerp exactly, boundaries extrapolate flat, exact hits win") {
    import graft.ops.AsOfJoin
    // right series for key k: t=10 v=100, t=20 v=200, t=40 v=100
    val right = Seq((1L, "k", 10L, 100L), (2L, "k", 20L, 200L), (3L, "k", 40L, 100L))
      .toDF("event_id", "key", "tm", "vq")
    val left = Seq(
      (10L, "k", 15L),  // midway 10..20 -> 150
      (11L, "k", 20L),  // exact hit -> 200
      (12L, "k", 35L),  // 3/4 of 20..40 -> 125
      (13L, "k", 5L),   // before first -> flat 100
      (14L, "k", 99L),  // after last -> flat 100
      (15L, "z", 50L))  // no right rows -> null
      .toDF("id", "key", "tm")
    val got = AsOfJoin.interpolate(left, right, Seq("key"), "tm", "vq",
        tiebreak = Seq("event_id"))
      .select($"id", $"lerp_q").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(10L) === Some(150000000L))
    assert(got(11L) === Some(200000000L))
    assert(got(12L) === Some(125000000L))
    assert(got(13L) === Some(100000000L))
    assert(got(14L) === Some(100000000L))
    assert(got(15L) === None)
    // equal-time right rows: backward takes max event_id, forward min
    val dup = Seq((5L, "k", 30L, 10L), (6L, "k", 30L, 50L)).toDF("event_id", "key", "tm", "vq")
    val probes = Seq((20L, "k", 30L), (21L, "k", 25L)).toDF("id", "key", "tm")
    val g2 = AsOfJoin.interpolate(probes, dup, Seq("key"), "tm", "vq",
        tiebreak = Seq("event_id"))
      .select($"id", $"lerp_q").as[(Long, Long)].collect().toMap
    assert(g2(20L) === 50000000L) // exact hit -> backward bracket, max event_id
    assert(g2(21L) === 10000000L) // forward-only -> flat, min event_id
  }

  // ------------------------------------------------ softDedupWeights

  test("softDedupWeights: ppm weights are floor(1e6/m); singletons keep 1e6") {
    val clusters = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 30L), (6L, 30L))
      .toDF("id", "cluster")
    val got = Dedup.softDedupWeights(clusters, "id", "cluster")
      .select($"id", $"cluster_sz", $"weight_ppm").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 3L, 333333L), (2L, 3L, 333333L), (3L, 3L, 333333L),
      (4L, 1L, 1000000L), (5L, 2L, 500000L), (6L, 2L, 500000L)))
  }

  test("softDedupWeights: reserved output columns are rejected") {
    val bad = Seq((1L, 1L, 9L)).toDF("id", "cluster", "weight_ppm")
    intercept[IllegalArgumentException] {
      Dedup.softDedupWeights(bad, "id", "cluster")
    }
  }

  // ------------------------------------------------------ Audio.vadStats

  // ---------------------------------------------------- Patches.patchStats

  test("patchStats: grid shape, sums, row-major argmax with min-index ties, zeros") {
    // 5x4 raster, p=2 -> full grid 2x2 (last col+row dropped)
    // values laid row-major; patch (0,0) = {1,2,6,7}=16, (0,1) = {3,4,8,9}=24,
    // (1,0) = {11,12,16,17}=56, (1,1) = {13,14,18,19}=64
    val px = (1 to 20).toArray // w=5 -> rows: 1..5 / 6..10 / 11..15 / 16..20
    val (nPr, nPc, total, mx, am, nz) = multimodal.Patches.patchStats(px, w = 5, h = 4, p = 2)
    assert((nPr, nPc) === ((2, 2)))
    assert(total === 16L + 24L + 56L + 64L)
    assert(mx === 64L && am === 3)
    assert(nz === 0L)
    // tie on max -> smallest row-major index wins
    val flat = Array.fill(16)(7)
    val (_, _, _, m2, a2, _) = multimodal.Patches.patchStats(flat, 4, 4, 2)
    assert(m2 === 28L && a2 === 0)
    // all-zero patches counted; raster smaller than one patch -> empty grid
    val zeros = Array.fill(16)(0)
    assert(multimodal.Patches.patchStats(zeros, 4, 4, 2) === ((2, 2, 0L, 0L, 0, 4L)))
    assert(multimodal.Patches.patchStats(Array(1, 2), 2, 1, 8) === ((0, 0, 0L, 0L, -1, 0L)))
  }

  test("patchStats: guards reject bad patch size and short buffers") {
    intercept[IllegalArgumentException] {
      multimodal.Patches.patchStats(Array(1), 1, 1, 0)
    }
    intercept[IllegalArgumentException] {
      multimodal.Patches.patchStats(Array(1, 2, 3), 2, 2, 1)
    }
  }

  test("vadStats: islands merge, gaps split, threshold is strict") {
    // frame energy: all bytes 64 -> sample 0 -> e = 0; all bytes 127 ->
    // sample 63 -> e = 63*63*4 = 15876 per 4-byte frame
    def frame(sample: Int, len: Int): Array[Byte] =
      Array.fill(len)((sample + 64).toByte)
    val loud = frame(63, 4); val quiet = frame(0, 4)
    val pcm = loud ++ loud ++ quiet ++ loud ++ quiet ++ quiet ++ loud ++ loud ++ loud
    val (nf, na, ns, mr) = Audio.vadStats(pcm, frameLen = 4, thr = 15875L)
    assert((nf, na, ns, mr) === ((9, 6L, 3L, 3L)))
    // threshold equal to the energy is NOT active (strict >)
    assert(Audio.vadStats(loud, 4, thr = 15876L) === ((1, 0L, 0L, 0L)))
    // trailing partial frame is ignored
    assert(Audio.vadStats(loud ++ frame(63, 3), 4, 15875L) === ((1, 1L, 1L, 1L)))
    // empty blob
    assert(Audio.vadStats(Array.empty[Byte], 4, 0L) === ((0, 0L, 0L, 0L)))
  }
}
