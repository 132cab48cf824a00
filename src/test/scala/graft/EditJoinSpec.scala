package graft

import graft.text.EditJoin

/** PassJoin edit-distance join (text.EditJoin) vs a brute-force
  * Levenshtein oracle: the signature scheme must be LOSSLESS (every
  * pair within k found) and the verify exact (no pair beyond k kept). */
class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    var j = 1
    while (j <= b.length) {
      var prev = dp(0)
      dp(0) = j
      var i = 1
      while (i <= a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
        prev = cur
        i += 1
      }
      j += 1
    }
    dp(a.length)
  }

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows
      (ib, sb) <- rows
      if ia < ib
      d = lev(sa, sb)
      if d <= k
    } yield (ia, ib, d)).toSet

  private def run(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    EditJoin.passJoin(rows.toDF("id", "s"), "id", "s", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("segments: k+1 non-empty contiguous pieces covering the string") {
    for (len <- 3 to 40; k <- 1 to 3 if len >= k + 1) {
      val segs = EditJoin.segments(len, k)
      assert(segs.length == k + 1)
      assert(segs.forall(_._2 >= 1), s"empty segment at len=$len k=$k")
      assert(segs.head._1 == 0)
      segs.sliding(2).foreach { case Array((p1, l1), (p2, _)) =>
        assert(p1 + l1 == p2, s"gap at len=$len k=$k")
      }
      assert(segs.last._1 + segs.last._2 == len)
    }
  }

  test("planted edits: sub / indel / shifted-window variants all found") {
    val base = "the quick brown fox jumps"
    val rows = Seq(
      1L -> base,
      2L -> base.updated(4, 'Q').toString,             // 1 substitution
      3L -> (base.substring(1) + "!"),                 // del front + append: 2
      4L -> ("x" + base.substring(0, base.length - 1)), // ins front + del end: 2
      5L -> "entirely different payload!!!",
      6L -> base)                                      // exact dup: 0
    val got = run(rows, k = 2)
    assert(got == brute(rows, 2))
    assert(got.contains((1L, 2L, 1)))
    assert(got.contains((1L, 3L, 2)))
    assert(got.contains((1L, 4L, 2)))
    assert(got.contains((1L, 6L, 0)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("fuzz: exact vs brute force over a binary alphabet, k = 1..3") {
    // binary alphabet + short lengths maximize near-collisions, the
    // hard case for lossless blocking; seeded for replay.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 120).map { i =>
      val len = rnd.nextInt(11) // 0..10, exercises the short block too
      i.toLong -> Seq.fill(len)(if (rnd.nextBoolean()) 'a' else 'b').mkString
    }
    for (k <- 1 to 3) {
      val got = run(rows, k)
      val want = brute(rows, k)
      assert(got == want,
        s"k=$k: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("multi-match-aware windows: per-segment shift bound and strict " +
       "cut vs the naive ±k band") {
    for (k <- 1 to 4; len <- (k + 1) to 40; partnerLen <- len to (len + k)) {
      val m = k + 1
      val delta = len - partnerLen
      val wins = EditJoin.probeWindows(len, partnerLen, k).toSeq
      val segs = EditJoin.segments(partnerLen, k)
      // per-segment: every emitted start obeys the Lemma-3 shift bounds
      val bySeg = wins.groupBy(_._1)
      for ((i0, ws) <- bySeg) {
        val i = i0 + 1
        val p = segs(i0)._1
        for ((_, q, l) <- ws) {
          val shift = q - p
          assert(shift >= math.max(-(i - 1), delta - (m - i)) &&
                 shift <= math.min(i - 1, delta + (m - i)),
            s"k=$k len=$len L=$partnerLen seg $i shift $shift")
          assert(q >= 0 && q + l <= len)
        }
        // window size never exceeds the Lemma-3 cap, itself < the naive
        // 2k+1 whenever k >= 1 and m >= 2
        assert(ws.size <= math.min(2 * i - 1, 2 * (m - i) + 1 + 2 * delta.abs),
          s"k=$k len=$len L=$partnerLen seg $i size ${ws.size}")
        assert(ws.size <= k + 1 - delta.abs,
          s"k=$k len=$len L=$partnerLen seg $i size ${ws.size} > k+1-|Δ|")
      }
      // whole-string probe volume: strictly below the naive window's
      // (each segment's naive band is min(2k+1, len-l+1) positions)
      val naive = segs.map { case (p, l) =>
        val lo = math.max(0, p - k); val hi = math.min(len - l, p + k)
        math.max(0, hi - lo + 1)
      }.sum
      assert(wins.size <= naive,
        s"k=$k len=$len L=$partnerLen: ${wins.size} > naive $naive")
    }
  }

  test("short block guards loudly instead of degrading to all-pairs") {
    val rows = (0L until 30000L).map(i => i -> (if (i % 2 == 0) "a" else "b"))
    val ex = intercept[IllegalStateException] {
      EditJoin.passJoin(rows.toDF("id", "s"), "id", "s", 2).count()
    }
    assert(ex.getMessage.contains("short block"))
  }
}
