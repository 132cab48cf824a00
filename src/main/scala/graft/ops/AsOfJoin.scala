package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the payload of the
  * latest right row with `right.time <= left.time` within the same key —
  * the classic "most recent quote before the trade" / "last click before
  * the purchase" operator (the temporal analog of the reference's
  * nearest-in-time band matching, stack.py's closest-item semantics).
  *
  * Spark has no native as-of join, and the naive formulation
  * (`l JOIN r ON key AND r.t <= l.t` + argmax) explodes into a range
  * cross-join that is quadratic per key. This implementation instead
  * unions both sides tagged with a side marker, sorts once within each
  * key partition by (time, side, tiebreak), and carries the last seen
  * right payload forward with a running `last(ignoreNulls)` window —
  * ONE shuffle on the key, linear work per partition, identical to the
  * sort-merge as-of strategy native engines use. At 100 TB the only
  * hazard is a hot key (all rows of one key visit one task); salt-split
  * such keys upstream or pre-aggregate the right side.
  */
object AsOfJoin {

  /** @param key       equi-join key column names (present on both sides)
    * @param time      event-time column name (present on both sides)
    * @param payload   right-side columns to attach to each left row
    * @param tiebreak  right-side columns ordering equal-time right rows;
    *                  the LAST row in ascending tiebreak order wins
    *                  (e.g. max event_id), making ties deterministic
    * @param prefix    prepended to payload column names in the output so
    *                  they never collide with left columns
    *
    * A right row at exactly `left.time` matches (inclusive bound): right
    * rows sort before left rows at equal time via the side marker.
    * Left rows with no prior right row get null payloads (left-outer).
    */
  def backward(left: DataFrame,
               right: DataFrame,
               key: Seq[String],
               time: String,
               payload: Seq[String],
               tiebreak: Seq[String] = Nil,
               prefix: String = "asof_"): DataFrame = {
    val (tagged, w) = taggedUnion(left, right, key, time, payload, tiebreak)
    tagged
      .withColumn("__match",
        last("__rp", ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__side") === 1)
      .select(col("__lrow.*") +: payload.map(p => col(s"__match.$p").as(prefix + p)): _*)
  }

  /** FORWARD as-of join — [[backward]]'s mirror (pandas `merge_asof`
    * direction="forward"): for every left row, the EARLIEST right row
    * with `right.time >= left.time` within the key — "the next
    * maintenance window after the alert", "the first quote after the
    * order". Inclusive at equal time: right rows sort AFTER left rows
    * here (the flipped side marker), so a running `first(ignoreNulls)`
    * over [current, ∞) captures them at distance 0; equal-time right
    * rows tiebreak to the FIRST in ascending `tiebreak` order (min —
    * the mirror of backward's max). Same single-shuffle plan. */
  def forward(left: DataFrame,
              right: DataFrame,
              key: Seq[String],
              time: String,
              payload: Seq[String],
              tiebreak: Seq[String] = Nil,
              prefix: String = "asof_"): DataFrame = {
    val (tagged, w) = taggedUnion(left, right, key, time, payload, tiebreak,
      leftFirstAtEqualTime = true)
    tagged
      .withColumn("__match",
        first("__rp", ignoreNulls = true)
          .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("__side") === 1)
      .select(col("__lrow.*") +: payload.map(p => col(s"__match.$p").as(prefix + p)): _*)
  }

  /** Nearest as-of join: for every left row, the right row minimizing
    * `|right.time - left.time|` within the key — the temporal
    * nearest-neighbor match (the reference's closest-scene-in-time
    * semantics, generalized). Same single-shuffle tagged-union plan: the
    * backward candidate is a running `last()`, the forward candidate a
    * running `first()` over the SAME sort, and a projection picks the
    * closer (ties: the earlier/backward row wins; equal-time right rows
    * tiebreak to max `tiebreak` backward / min `tiebreak` forward).
    */
  def nearest(left: DataFrame,
              right: DataFrame,
              key: Seq[String],
              time: String,
              payload: Seq[String],
              tiebreak: Seq[String] = Nil,
              prefix: String = "asof_"): DataFrame = {
    val (tagged, w) = taggedUnion(left, right, key, time, payload, tiebreak)
    val back = last("__rp", ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwd = first("__rp", ignoreNulls = true)
      .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    // equal-time right rows sort before the left row, so they are always
    // captured by the BACKWARD candidate with distance 0 (which then wins
    // every tie) — the forward candidate only sees strictly-later rows.
    val chosen = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .when(col("__time") - col("__b.__rt") <= col("__f.__rt") - col("__time"), col("__b"))
      .otherwise(col("__f"))
    tagged
      .withColumn("__b", back)
      .withColumn("__f", fwd)
      .filter(col("__side") === 1)
      .withColumn("__match", chosen)
      .select(col("__lrow.*") +: payload.map(p => col(s"__match.$p").as(prefix + p)): _*)
  }

  /** Linear-INTERPOLATION as-of join — the feature-pipeline variant of
    * [[backward]]/[[nearest]] (pandas `merge_asof` + interpolation, the
    * time-series feature join): for every left row, the right-side value
    * is linearly interpolated between the bracketing right rows,
    *
    *   v(t) = (vb·(tf − t) + vf·(t − tb)) / (tf − tb)
    *
    * computed in integer micro-units through DECIMAL(38,0) — the
    * symmetric form keeps the numerator non-negative for non-negative
    * quantized values, so truncating and flooring division agree and any
    * engine replays it exactly (the temperatureBudgets discipline). One
    * boundary row (only a prev, or only a next) extrapolates flat; no
    * right rows at all yields null. A right row at exactly the left time
    * is the backward bracket (tb = t), making v(t) = vb exactly; the
    * forward bracket is strictly later, so tf > tb always and the
    * denominator never vanishes.
    *
    * `time` must be an integral column (e.g. unix micros); `valueQ` a
    * non-negative integral quantized value on the right side. Same
    * single-shuffle tagged-union plan as backward/nearest: the backward
    * bracket is a running `last()`, the forward a running `first()`,
    * over ONE sort per key. Returns the left rows + `outCol` =
    * v(t)·10^6 in micro-units (null when no bracket exists). */
  def interpolate(left: DataFrame,
                  right: DataFrame,
                  key: Seq[String],
                  time: String,
                  valueQ: String,
                  tiebreak: Seq[String] = Nil,
                  outCol: String = "lerp_q"): DataFrame = {
    require(!left.columns.contains(outCol),
      s"output column '$outCol' already exists on the left side — pass a different outCol")
    // The cross-engine determinism argument (truncating `div` == floor
    // `//`) holds only for a non-negative numerator, i.e. non-negative
    // valueQ — ENFORCE it per row instead of documenting it: assert_true
    // rides the same projection (codegen'd comparison, no extra job or
    // shuffle), so a negative quantized value fails loudly at the first
    // task that sees one. Nulls pass through (they lerp to null).
    val nonNeg = when(
      assert_true(coalesce(col(valueQ) >= 0, lit(true)),
        concat(lit(s"AsOfJoin.interpolate: negative $valueQ="),
          col(valueQ).cast("string"),
          lit(" — truncating vs flooring division diverge for negative " +
              "values; offset the quantized value to be non-negative"))).isNull,
      col(valueQ))
    val guarded = right.withColumn(valueQ, nonNeg)
    val (tagged, w) = taggedUnion(left, guarded, key, time, Seq(valueQ), tiebreak)
    val back = last("__rp", ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwd = first("__rp", ignoreNulls = true)
      .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val lerp = expr(
      s"(CAST(__b.$valueQ AS DECIMAL(38,0)) * 1000000 * (__f.__rt - __time) + " +
      s"CAST(__f.$valueQ AS DECIMAL(38,0)) * 1000000 * (__time - __b.__rt)) " +
      s"div (__f.__rt - __b.__rt)")
    val out = when(col("__b").isNotNull && col("__f").isNotNull, lerp.cast("long"))
      .when(col("__b").isNotNull, col(s"__b.$valueQ").cast("long") * 1000000L)
      .when(col("__f").isNotNull, col(s"__f.$valueQ").cast("long") * 1000000L)
    tagged
      .withColumn("__b", back)
      .withColumn("__f", fwd)
      .filter(col("__side") === 1)
      .select(col("__lrow.*"), out.as(outCol))
  }

  /** Tag, union and sort both sides; shared by backward/nearest. The
    * right payload struct carries the right time as `__rt` so distance
    * math needs no second join. */
  private def taggedUnion(left: DataFrame,
                          right: DataFrame,
                          key: Seq[String],
                          time: String,
                          payload: Seq[String],
                          tiebreak: Seq[String],
                          leftFirstAtEqualTime: Boolean = false) = {
    val payloadCols = payload.map(col) :+ col(time).as("__rt")
    val payloadType = right.select(struct(payloadCols: _*).as("p")).schema("p").dataType
    val leftRowType = left.select(struct(left.columns.toSeq.map(col): _*).as("r")).schema("r").dataType
    val tbTypes = tiebreak.map(c => right.schema(c).dataType)

    val rTagged = right.select(
      key.map(col) ++
        Seq(col(time).as("__time"), lit(0).as("__side"),
            struct(payloadCols: _*).as("__rp"),
            lit(null).cast(leftRowType).as("__lrow")) ++
        tiebreak.map(c => col(c).as(s"__tb_$c")): _*)
    val lTagged = left.select(
      key.map(col) ++
        Seq(col(time).as("__time"), lit(1).as("__side"),
            lit(null).cast(payloadType).as("__rp"),
            struct(left.columns.toSeq.map(col): _*).as("__lrow")) ++
        tiebreak.zip(tbTypes).map { case (c, t) => lit(null).cast(t).as(s"__tb_$c") }: _*)

    // backward/nearest want right rows BEFORE left at equal time (the
    // running last() then matches inclusively); forward wants them AFTER
    // (the running first() matches inclusively from the other side)
    val sideOrder = if (leftFirstAtEqualTime) col("__side").desc else col("__side").asc
    val order = col("__time").asc +: sideOrder +: tiebreak.map(c => col(s"__tb_$c").asc)
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    (rTagged.unionByName(lTagged), w)
  }
}
