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

  /** A metadata field after typed accumulation — the reference's
    * `dict_to_coords` output shapes (`accumulate_metadata.py:134-230`):
    * a 0-D scalar, a 0-D set (setified constant multi-element list), or a
    * per-item 1-D coordinate along the time dimension. Fields the
    * reference drops (ragged-incompatible list-of-lists) are absent. */
  sealed trait Coord
  final case class Coord0D(v: MetaValue)           extends Coord
  final case class CoordSet(vs: Vector[MetaValue]) extends Coord
  final case class Coord1D(vs: Vector[MetaValue])  extends Coord

  /** Typed/nested accumulation with the reference's squeeze / setify /
    * drop semantics (`accumulate_metadata.py:42-96` + `134-230`):
    *
    *  - a field present in EVERY item with one equal value stays 0-D;
    *    arbitrarily-nested 1-element lists unwrap (`[[x]] -> x`); a
    *    remaining multi-element list of scalars becomes a 0-D SET
    *    (first-appearance order, duplicates removed); a list containing
    *    lists/objects is unhashable -> dropped;
    *  - any other field becomes a per-item 1-D coordinate (missing ->
    *    null), EXCEPT when every per-item value is a list of one common
    *    length: numpy would make that a >=2-D array, which the reference
    *    drops — after first unwrapping a uniform singleton dimension
    *    (`[[a],[b]] -> [a,b]`, np.squeeze). Ragged lists and mixed
    *    scalar/list stay 1-D (object dtype in the reference).
    */
  def typedCoords(propsByItem: Seq[Map[String, MetaValue]],
                  skipFields: Set[String] = Set.empty): Map[String, Coord] = {
    val n = propsByItem.size
    val keys = propsByItem.flatMap(_.keys).distinct.filterNot(skipFields)
    keys.flatMap { k =>
      val vals = propsByItem.map(_.get(k))
      val defined = vals.flatten
      if (defined.size == n && defined.distinct.size == 1) {
        // constant: squeeze nested singletons, then setify or drop
        var v = defined.head
        while (v match { case MArr(xs) if xs.size == 1 => true; case _ => false })
          v = v.asInstanceOf[MArr].xs.head
        v match {
          case MArr(xs) =>
            if (xs.exists(x => x.isInstanceOf[MArr] || x.isInstanceOf[MObj]))
              None // unhashable elements: reference's set() fails -> dropped
            else Some(k -> CoordSet(xs.distinct))
          case other => Some(k -> Coord0D(other))
        }
      } else {
        // varying: 1-D per-item coordinate unless it is a uniform 2-D block
        var vs = vals.map(_.getOrElse(MNull)).toVector
        // np.squeeze: a uniform singleton-list dimension unwraps
        while (vs.nonEmpty && vs.forall {
                 case MArr(xs) => xs.size == 1; case _ => false })
          vs = vs.map(_.asInstanceOf[MArr].xs.head)
        val uniform2d = vs.nonEmpty && vs.forall(_.isInstanceOf[MArr]) &&
          vs.map(_.asInstanceOf[MArr].xs.size).distinct.size == 1
        if (uniform2d) None // >=2-D after squeeze: reference drops it
        else Some(k -> Coord1D(vs))
      }
    }.toMap
  }

  /** [[typedCoords]] over [[StacItem]]s: property strings are parsed as
    * JSON ([[MetaValue.parse]]; legacy bare scalars fall back to
    * strings/numbers). `datetime`/`proj:*` are already structured planner
    * input, mirroring the reference's skip_fields at `stack.py:76`. */
  def typedCoordsFromItems(items: Seq[StacItem],
                           skipFields: Set[String] = Set.empty): Map[String, Coord] =
    typedCoords(items.map(_.properties.map { case (k, v) => k -> MetaValue.parse(v) }),
                skipFields)

  /** Queryable long-form view of [[typedCoords]]:
    * (key, kind const|set|time, item_idx null for 0-D, value_json). */
  def coordsTable(spark: SparkSession, items: Seq[StacItem],
                  skipFields: Set[String] = Set.empty): DataFrame = {
    import spark.implicits._
    typedCoordsFromItems(items, skipFields).toSeq.flatMap {
      case (k, Coord0D(v))   => Seq((k, "const", Option.empty[Int], v.render))
      case (k, CoordSet(vs)) => Seq((k, "set", Option.empty[Int], MArr(vs).render))
      case (k, Coord1D(vs))  => vs.zipWithIndex.map { case (v, i) =>
                                  (k, "time", Some(i), v.render) }
    }.toDF("key", "kind", "item_idx", "value_json")
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
