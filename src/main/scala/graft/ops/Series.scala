package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key TIME-SERIES analysis verbs — the monitoring/forecasting
  * reads over an ordered measure column that the windowed family
  * (w1–w9) stops short of: autocorrelation structure, mean-shift
  * changepoint localization, and per-group trend fits.
  *
  * All three keep the engine-parity discipline of the w-family: values
  * are pre-quantized integers, every aggregate is an exact integer sum
  * (order-free, so Spark partial aggregation and any oracle agree
  * bit-for-bit), and fractional read-outs (correlation, slope) are
  * either left to the caller as sum pieces or derived as deterministic
  * IEEE expressions over those identical integers.
  *
  * Scale shape: everything here is one window pass over data
  * partitioned by the series key plus a census-sized groupBy — no
  * self-join, no collect, no per-key driver loop. Skewed keys inherit
  * Spark's window-exec spill behavior (a single series is processed by
  * one task — the inherent serial frontier of ordered recurrences; keys
  * are the parallel unit, the 100 TB layout is many keys).
  */
object Series {

  /** AUTOCORRELATION pieces at the given lags, per key: for each lag L,
    * the paired sums over (x_i, x_{i+L}) in the (orderCols)-ordered
    * series — n_pairs, sum_xy, sum_x, sum_y (BIGINT-exact; the caller's
    * r(L) = (n·Σxy − ΣxΣy) / √((n·Σxx−Σx²)(n·Σyy−Σy²)) is a pointwise
    * epilogue over these). One Window pass computes every lag's lead
    * column; the lags then unpivot through a generator, so the data is
    * shuffled ONCE on the key regardless of how many lags are read. */
  def acf(df: DataFrame, keyCol: String, orderCols: Seq[String],
          valCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"Series.acf: lags=$lags")
    val base = df.select(
      col(keyCol) +: orderCols.map(col) :+ col(valCol).cast("long").as("x"): _*)
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    // window exprs first (one Window exec computes every lead), THEN the
    // generator — Spark rejects window functions inside explode()
    val withLeads = base.select(
      col(keyCol) +: col("x") +:
        lags.map(l => lead(col("x"), l).over(w).as(s"y_$l")): _*)
    val leads = lags.map(l =>
      struct(lit(l).as("lag"), col(s"y_$l").as("y")))
    withLeads.select(col(keyCol), col("x"), explode(array(leads: _*)).as("p"))
      .filter(col("p.y").isNotNull)
      .groupBy(col(keyCol), col("p.lag").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x") * col("p.y")).as("sum_xy"),
        sum(col("x")).as("sum_x"),
        sum(col("p.y")).as("sum_y"))
  }

  /** CUSUM mean-shift changepoint (Page 1954's statistic in its offline
    * localization form): per key, with integer target m = Σx div n, the
    * cumulative deviation C_i = Σ_{j≤i} (x_j − m) peaks in magnitude at
    * the most likely single mean-shift point. Returns one row per key:
    * (key, n, target, max_abs_c, and the orderCols values at the peak —
    * earliest peak wins ties). C_i is computed as run_i − i·m (running
    * sum minus row-number times target), so the whole statistic stays
    * in exact integers without materializing x − m. Two window passes
    * (full-frame for n/target, running for C) over ONE shuffle on the
    * key, then a census-sized argmax. */
  def cusumChangepoint(df: DataFrame, keyCol: String, orderCols: Seq[String],
                       valCol: String): DataFrame = {
    val wAll = Window.partitionBy(col(keyCol))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withC = df
      .select(col(keyCol) +: orderCols.map(col) :+ col(valCol).cast("long").as("x"): _*)
      .withColumn("n", count(lit(1)).over(wAll))
      // the full-frame sum via the Column API (no identifier splicing —
      // keyCol may need backtick quoting), then the exact integer
      // floor-div through SQL `div` over the two plain LONG columns
      .withColumn("sum_x_all", sum(col("x")).over(wAll))
      .withColumn("target", expr("sum_x_all div n"))
      .withColumn("seq", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)))
      .withColumn("c", sum(col("x")).over(wRun) - col("seq") * col("target"))
    val peak = withC.groupBy(col(keyCol))
      .agg(max(struct(abs(col("c")).as("a"), (-col("seq")).as("negseq"),
        struct(orderCols.map(col): _*).as("at"),
        col("n").as("n"), col("target").as("target"))).as("m"))
    peak.select(col(keyCol) +: (col("m.n").as("n") ::
      col("m.target").as("target") :: col("m.a").as("max_abs_c") ::
      orderCols.map(o => col(s"m.at.$o").as(s"cp_$o")).toList): _*)
  }

  /** SEASONAL DETRENDING — the moving-average decomposition step of
    * classical seasonal analysis (the additive STL-lite: series = trend
    * + seasonal + remainder), in the exact-integer contract: for window
    * half-width h over the (orderCols)-ordered per-key series, emits
    * per row the (2h+1)-row centered window SUM (`trend_sum`), the row
    * count actually in the window (`win_n` — under 2h+1 at the series
    * edges), and the ×(2h+1)-SCALED detrended value
    * detr = (2h+1)·x − trend_sum (exact integers; /(2h+1) is the
    * pointwise epilogue, the tpi8 discipline). Rows without a full
    * window keep their sums but a NULL detr — the caller filters or
    * keeps edges explicitly. Seasonal indices are then a census over
    * detr grouped by the caller's phase column (hour-of-day, etc.).
    *
    * Windows are ROW-based over OBSERVED rows: on a gappy series the
    * decomposition is over observation order, not calendar positions —
    * gap-fill upstream ([[GapFill]]) when calendar alignment matters.
    * One key shuffle; everything else is window-local. */
  def seasonalDetrend(df: DataFrame, keyCol: String, orderCols: Seq[String],
                      valCol: String, halfWindow: Int): DataFrame = {
    require(halfWindow >= 1, s"Series.seasonalDetrend: halfWindow=$halfWindow")
    val span = 2 * halfWindow + 1
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(-halfWindow, halfWindow)
    df.withColumn("win_n", count(lit(1)).over(w))
      .withColumn("trend_sum", sum(col(valCol).cast("long")).over(w))
      .withColumn("detr",
        when(col("win_n") === span,
          lit(span.toLong) * col(valCol).cast("long") - col("trend_sum")))
  }

  /** Per-key ORDINARY LEAST SQUARES of y on x over integer columns:
    * the five exact sums (n, Σx, Σy, Σxy, Σx²) plus the derived
    * slope/intercept as deterministic IEEE doubles — cast-to-double
    * AFTER the integer sums, so both the sums and the fit replay
    * bit-for-bit in any engine given the same rows. One map-side-
    * combined aggregation; no window, no join. */
  def groupedOls(df: DataFrame, keyCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val sums = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"), sum(x).as("sum_x"), sum(y).as("sum_y"),
      sum(x * y).as("sum_xy"), sum(x * x).as("sum_xx"))
    def d(c: Column): Column = c.cast("double")
    val denom = d(col("n")) * d(col("sum_xx")) - d(col("sum_x")) * d(col("sum_x"))
    val slope = (d(col("n")) * d(col("sum_xy")) - d(col("sum_x")) * d(col("sum_y"))) / denom
    sums
      .withColumn("slope", slope)
      .withColumn("intercept",
        (d(col("sum_y")) - col("slope") * d(col("sum_x"))) / d(col("n")))
  }
}
