package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Histogram-census quantiles — per-group percentiles WITHOUT a sort.
  *
  * The 100 TB objection to `percentile`/`sortBy`-style quantiles is
  * that they either shuffle the data (full sort) or hold per-group
  * value buffers (exact percentile agg). A fixed-width bucket census
  * sidesteps both: `groupBy(group, value div w).count()` is map-side
  * combined, so the shuffle carries at most (#groups × #buckets)
  * rows no matter the corpus size, and every downstream step (running
  * sum, rank selection) runs on that bounded table. The answer is the
  * bucket upper bound — exact to within `bucketWidth`, which the
  * caller picks to match the precision the decision needs (length
  * gates, score terciles, shard-size planning never need better than
  * a few units).
  *
  * Everything is 64-bit integer arithmetic: bucket ids via
  * non-negative `pmod` floor-division, ranks via `(p·total + 999)
  * div 1000` integer ceilings — aggregation-order-proof and
  * bit-replayable by any engine.
  *
  * Reference relationship: stackstac has no quantile operator; this
  * generalizes the same census-not-sort shape used by the engine's
  * `t13` perplexity terciles and `x19` UniMax water-filling.
  */
object Census {

  /** Floor division that agrees with mathematical floor for negative
    * values too (Spark's `div` truncates toward zero): subtracting the
    * non-negative `pmod` first makes the numerator an exact multiple,
    * so truncating `div` IS floor — pure 64-bit integer arithmetic. */
  private def floorDiv(colName: String, w: Long): Column =
    expr(s"($colName - pmod($colName, ${w}L)) div ${w}L")

  /** Per-group permille quantiles of `valueCol` (integral) from a
    * width-`bucketWidth` histogram census.
    *
    * Returns one row per (group, permille): `q_upper` is the smallest
    * bucket upper bound B such that at least ⌈permille·total/1000⌉ of
    * the group's values are ≤ B. permille = 500 is the median, 990 the
    * p99. Output columns: groupCols… , `permille` (int), `q_upper`
    * (long).
    */
  def histQuantiles(df: DataFrame, valueCol: Column, groupCols: Seq[String],
                    bucketWidth: Long, permille: Seq[Int]): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1 (got $bucketWidth)")
    require(permille.nonEmpty && permille.forall(p => p >= 1 && p <= 1000),
      s"permille values must be in [1, 1000] (got $permille)")
    val g = groupCols.map(col)
    val census = df
      .withColumn("__cv", valueCol.cast("long"))
      .groupBy((g :+ floorDiv("__cv", bucketWidth).as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
    // The census is the ONLY data-sized aggregation; both windows below
    // run over the bounded (#groups × #buckets)-row table.
    val byGroup = Window.partitionBy(g: _*)
    val cum = census
      .withColumn("cum", sum(col("cnt")).over(byGroup.orderBy(col("bucket"))))
      .withColumn("total", sum(col("cnt")).over(byGroup))
    cum
      .withColumn("permille", explode(array(permille.map(p => lit(p)): _*)))
      .withColumn("rank",
        greatest(lit(1L), expr("(cast(permille as bigint) * total + 999) div 1000")))
      .filter(col("cum") >= col("rank"))
      .groupBy((g :+ col("permille")): _*)
      .agg(min(col("bucket")).as("b"))
      .select((g :+ col("permille") :+
        ((col("b") + lit(1L)) * lit(bucketWidth) - lit(1L)).as("q_upper")): _*)
  }
}
