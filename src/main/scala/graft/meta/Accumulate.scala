package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.stac.StacItem

/** Metadata accumulation — item properties become queryable coordinate
  * columns (reference `accumulate_metadata.py:42-131`): a field constant
  * across items collapses to one scalar; a varying field becomes a
  * time-indexed column with nulls for misses; band-level fields keep only
  * all-same values (`accumulate_metadata_only_allsame`).
  *
  * Expressed as grouped aggregations (SURVEY A5/A6): constant detection is
  * `count(distinct v) == 1`.
  */
object Accumulate {

  /** Long-form property table: (item_idx, key, value). The join target for
    * metadata predicates (P6) — filtering it prunes tile IO upstream. */
  def propertyTable(spark: SparkSession, items: Seq[StacItem]): DataFrame = {
    import spark.implicits._
    items.zipWithIndex.flatMap { case (it, idx) =>
      it.properties.map { case (k, v) => (idx, k, v) }
    }.toDF("item_idx", "key", "value")
  }

  /** Split fields into (constants, varying) like the reference's scalar
    * vs per-time coordinate decision (`accumulate_metadata.py:81-89`). */
  def accumulate(spark: SparkSession, items: Seq[StacItem]): (Map[String, String], DataFrame) = {
    import spark.implicits._
    val props = propertyTable(spark, items)
    val nItems = items.size
    val classed = props.groupBy($"key")
      .agg(countDistinct($"value").as("ndv"), count($"value").as("cnt"),
           max($"value").as("only"))
    val constants = classed
      .filter($"ndv" === 1 && $"cnt" === nItems)
      .select($"key", $"only").as[(String, String)].collect().toMap
    val varyingKeys = classed.filter(!($"ndv" === 1 && $"cnt" === nItems))
      .select($"key").as[String].collect().toSet
    val varying = props.filter($"key".isInCollection(
      if (varyingKeys.isEmpty) Seq("") else varyingKeys.toSeq))
    (constants, varying)
  }

  /** Per-band fields that are identical across all items (band coords,
    * `accumulate_metadata.py:101-131`): here generalized over any
    * (band, field, value) table. */
  def allSamePerBand(bandFields: DataFrame): DataFrame = {
    // expects columns: band, key, value
    bandFields.groupBy(col("band"), col("key"))
      .agg(countDistinct(col("value")).as("ndv"), max(col("value")).as("v"))
      .filter(col("ndv") === 1)
      .select(col("band"), col("key"), col("v").as("value"))
  }
}
