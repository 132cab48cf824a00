package graft

import graft.ops.Series

/** Hand + replay oracles for the time-series verbs (ops.Series):
  * exact-integer ACF pair sums, CUSUM peak localization, and the
  * closed-form OLS fit. */
class SeriesSpec extends SparkSpec {
  import spark.implicits._

  test("acf: pair sums match a hand replay at every lag, per key") {
    val a = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val b = Seq(2L, 7L, 1L, 8L)
    val rows = a.zipWithIndex.map { case (v, i) => ("a", i, v) } ++
      b.zipWithIndex.map { case (v, i) => ("b", i, v) }
    val got = Series.acf(rows.toDF("k", "seq", "v"), "k", Seq("seq"), "v", Seq(1, 2, 3))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    def want(s: Seq[Long], lag: Int) = {
      val pairs = s.dropRight(lag).zip(s.drop(lag))
      (pairs.size.toLong, pairs.map(p => p._1 * p._2).sum,
        pairs.map(_._1).sum, pairs.map(_._2).sum)
    }
    for ((k, s) <- Seq("a" -> a, "b" -> b); lag <- 1 to 3)
      assert(got((k, lag)) == want(s, lag), s"key=$k lag=$lag")
  }

  test("acf: a lag past the series length yields no row for that key") {
    val df = Seq(("k", 0, 5L), ("k", 1, 6L)).toDF("k", "seq", "v")
    val got = Series.acf(df, "k", Seq("seq"), "v", Seq(1, 5))
      .select("lag").as[Int].collect().toSet
    assert(got == Set(1))
  }

  test("cusum: the peak |C| localizes a planted mean shift") {
    // 10 values of 10 then 10 of 50: target = 30, C descends to -200
    // exactly at the last pre-shift row (seq 10), then climbs back.
    val rows = (1 to 10).map(i => ("k", i, 10L)) ++
      (11 to 20).map(i => ("k", i, 50L))
    val got = Series.cusumChangepoint(rows.toDF("k", "seq", "v"),
      "k", Seq("seq"), "v").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Long]("target") == 30L)
    assert(r.getAs[Long]("max_abs_c") == 200L)
    assert(r.getAs[Int]("cp_seq") == 10)
  }

  test("cusum: ties resolve to the earliest peak") {
    // constant series: every C_i = 0 — the earliest row must win.
    val rows = (1 to 5).map(i => ("k", i, 7L))
    val r = Series.cusumChangepoint(rows.toDF("k", "seq", "v"),
      "k", Seq("seq"), "v").collect().head
    assert(r.getAs[Long]("max_abs_c") == 0L)
    assert(r.getAs[Int]("cp_seq") == 1)
  }

  test("seasonalDetrend: full-window sums and scaled detrended values replay by hand") {
    val vs = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L)
    val rows = vs.zipWithIndex.map { case (v, i) => ("k", i, v) }
    val got = Series.seasonalDetrend(rows.toDF("k", "seq", "v"),
        "k", Seq("seq"), "v", halfWindow = 1)
      .orderBy("seq")
      .select("seq", "win_n", "trend_sum", "detr")
      .collect()
    // edges: 2-row windows, detr NULL; interior: 3-row sum, detr = 3v − sum
    assert(got(0).getLong(1) == 2L && got(0).isNullAt(3))
    assert(got(6).getLong(1) == 2L && got(6).isNullAt(3))
    for (i <- 1 to 5) {
      val sum = vs(i - 1) + vs(i) + vs(i + 1)
      assert(got(i).getLong(2) == sum, s"i=$i")
      assert(got(i).getLong(3) == 3 * vs(i) - sum, s"i=$i")
    }
    // a pure linear trend detrends to exactly zero in the interior
    assert((1 to 5).forall(i => got(i).getLong(3) == 0L))
  }

  test("seasonalDetrend: a planted period-2 cycle yields alternating indices") {
    // constant + alternating ±5: interior detr = 3v − (v⁻+v+v⁺);
    // for v = 100 ± 5 alternating, detr = ±20 alternating exactly.
    val vs = (0 until 10).map(i => if (i % 2 == 0) 105L else 95L)
    val rows = vs.zipWithIndex.map { case (v, i) => ("k", i, v) }
    val got = Series.seasonalDetrend(rows.toDF("k", "seq", "v"),
        "k", Seq("seq"), "v", halfWindow = 1)
      .filter("detr is not null").orderBy("seq")
      .select("seq", "detr").collect()
    got.foreach { r =>
      val want = if (r.getInt(0) % 2 == 0) 20L else -20L
      assert(r.getLong(1) == want, s"seq=${r.getInt(0)}")
    }
  }

  test("ols: a perfect line is recovered exactly; sums replay by hand") {
    val pts = (0 to 9).map(x => ("k", x.toLong, 3L * x + 7L))
    val r = Series.groupedOls(pts.toDF("k", "x", "y"), "k", "x", "y")
      .collect().head
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("sum_x") == 45L)
    assert(r.getAs[Long]("sum_y") == pts.map(_._3).sum)
    assert(r.getAs[Long]("sum_xy") == pts.map(p => p._2 * p._3).sum)
    assert(r.getAs[Long]("sum_xx") == pts.map(p => p._2 * p._2).sum)
    assert(r.getAs[Double]("slope") == 3.0)
    assert(r.getAs[Double]("intercept") == 7.0)
  }

  test("ols: noisy fit matches the closed form computed the same way") {
    val ys = Seq(12L, 9L, 20L, 18L, 31L, 28L, 40L, 35L)
    val pts = ys.zipWithIndex.map { case (y, x) => ("k", x.toLong, y) }
    val r = Series.groupedOls(pts.toDF("k", "x", "y"), "k", "x", "y")
      .collect().head
    val n = ys.size.toDouble
    val sx = pts.map(_._2).sum.toDouble
    val sy = ys.sum.toDouble
    val sxy = pts.map(p => p._2 * p._3).sum.toDouble
    val sxx = pts.map(p => p._2 * p._2).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getAs[Double]("slope") == slope)
    assert(r.getAs[Double]("intercept") == (sy - slope * sx) / n)
  }
}
