package graft.stac

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.core.{AffineTransform, Bounds}

/** STAC JSON ingestion — the S1 normalization path
  * (`stackstac/stac_types.py:136-200`): any item-ish JSON becomes the one
  * canonical [[StacItem]] shape. Spark's JSON schema inference plays the
  * role of the reference's duck-typing over pystac/satstac/dicts.
  *
  * Item metadata is planner input (broadcast-small relative to pixels), so
  * after the distributed `spark.read.json` parse the normalized rows are
  * collected for [[Prepare]] — the same driver-side planning boundary the
  * reference draws (SURVEY §3.1 steps 1-5).
  */
object StacJson {

  /** Read newline-delimited STAC item JSON into the canonical item list. */
  def read(spark: SparkSession, path: String): Seq[StacItem] =
    fromDataFrame(spark.read.json(path))

  /** Normalize an already-parsed item DataFrame (schema as inferred by
    * `spark.read.json`). Missing fields are tolerated everywhere, like the
    * reference's `.get` chains (`prepare.py:134-150`). */
  def fromDataFrame(df: DataFrame): Seq[StacItem] = {
    val fields = df.schema.fieldNames.toSet
    df.collect().toIndexedSeq.map { row => rowToItem(row, fields) }
  }

  private def opt[T](row: Row, name: String): Option[T] =
    if (row.schema != null && row.schema.fieldNames.contains(name) && !row.isNullAt(row.fieldIndex(name)))
      Some(row.getAs[T](name))
    else None

  private def optSeqD(row: Row, name: String): Option[Seq[Double]] =
    opt[scala.collection.Seq[Any]](row, name).map(_.toSeq.map {
      case d: Double => d; case l: Long => l.toDouble; case i: Int => i.toDouble
      case b: java.math.BigDecimal => b.doubleValue
      case x => x.toString.toDouble
    })

  private def optInt(row: Row, name: String): Option[Int] =
    opt[Any](row, name).map {
      case i: Int => i; case l: Long => l.toInt; case s: String => s.toInt
      case d: Double => d.toInt
    }

  private def bboxOf(xs: Seq[Double]): Bounds = Bounds(xs(0), xs(1), xs(2), xs(3))
  private def shapeOf(xs: Seq[Double]): (Int, Int) = (xs(0).toInt, xs(1).toInt)

  private def rowToItem(row: Row, fields: Set[String]): StacItem = {
    val props: Option[Row] =
      if (fields.contains("properties")) Option(row.getAs[Row]("properties")) else None

    def propOptInt(name: String) = props.flatMap(optInt(_, name))
    def propOptSeq(name: String) = props.flatMap(optSeqD(_, name))
    def propOptStr(name: String) = props.flatMap(opt[String](_, name))

    val assets: Map[String, StacAsset] =
      if (fields.contains("assets") && !row.isNullAt(row.fieldIndex("assets"))) {
        val a = row.getAs[Any]("assets")
        a match {
          case m: scala.collection.Map[_, _] =>
            m.map { case (k, v) => k.toString -> rowToAsset(v.asInstanceOf[Row]) }.toMap
          case r: Row => // struct-typed assets: one field per asset id
            r.schema.fieldNames.filterNot(f => r.isNullAt(r.fieldIndex(f)))
              .map(f => f -> rowToAsset(r.getAs[Row](f))).toMap
          case _ => Map.empty[String, StacAsset]
        }
      } else Map.empty

    // flatten JSON properties into the open metadata map: scalars keep the
    // legacy bare form ("12.5", "OLI"); nested arrays/objects render as
    // canonical JSON so typed accumulation (Accumulate.typedCoords) can
    // re-parse their structure (MetaValue.parse falls back to a bare
    // string for the scalar form).
    val propMap: Map[String, String] = props.map { p =>
      p.schema.fields.collect {
        case f if !p.isNullAt(p.fieldIndex(f.name)) &&
          !f.name.startsWith("proj:") && f.name != "datetime" =>
          f.name -> (p.getAs[Any](f.name) match {
            case v @ (_: Row | _: scala.collection.Map[_, _] | _: scala.collection.Seq[_]) =>
              toMeta(v).render
            case v => String.valueOf(v)
          })
      }.toMap
    }.getOrElse(Map.empty)

    StacItem(
      id = opt[String](row, "id").getOrElse(""),
      datetime = propOptStr("datetime"),
      bboxLatLon = optSeqD(row, "bbox").filter(_.length >= 4).map(bboxOf),
      epsg = propOptInt("proj:epsg"),
      shape = propOptSeq("proj:shape").filter(_.length >= 2).map(shapeOf),
      transform = propOptSeq("proj:transform").filter(s => s.length == 6 || s.length == 9)
        .map(AffineTransform.fromStac),
      assets = assets,
      properties = propMap)
  }

  /** Spark JSON value -> typed metadata value (structs keep field order). */
  private def toMeta(v: Any): graft.meta.MetaValue = {
    import graft.meta._
    v match {
      case null => MNull
      case r: Row => MObj(r.schema.fields.toVector.collect {
        case f if !r.isNullAt(r.fieldIndex(f.name)) =>
          f.name -> toMeta(r.getAs[Any](f.name))
      })
      case m: scala.collection.Map[_, _] =>
        MObj(m.toVector.map { case (k, x) => k.toString -> toMeta(x) })
      case s: scala.collection.Seq[_] => MArr(s.toVector.map(toMeta))
      case s: String => MStr(s)
      case b: Boolean => MBool(b)
      case n: java.math.BigDecimal => MNum(n.doubleValue)
      case n: Number => MNum(n.doubleValue)
      case other => MStr(other.toString)
    }
  }

  private def rowToAsset(row: Row): StacAsset = {
    // raster:bands carries scale/offset; multi-band assets rejected like
    // reference prepare.py:153-159.
    val (scale, offset) = opt[scala.collection.Seq[Row]](row, "raster:bands") match {
      case Some(bands) if bands.length == 1 =>
        val b = bands.head
        (opt[Any](b, "scale").map(_.toString.toDouble).getOrElse(1.0),
         opt[Any](b, "offset").map(_.toString.toDouble).getOrElse(0.0))
      case Some(bands) if bands.length > 1 =>
        throw new IllegalArgumentException(
          s"Multi-band assets are not supported (raster:bands has ${bands.length} entries)")
      case _ => (1.0, 0.0)
    }
    StacAsset(
      href = opt[String](row, "href").getOrElse(null),
      mimetype = opt[String](row, "type"),
      epsg = optInt(row, "proj:epsg"),
      bbox = optSeqD(row, "proj:bbox").filter(_.length >= 4).map(bboxOf),
      shape = optSeqD(row, "proj:shape").filter(_.length >= 2).map(shapeOf),
      transform = optSeqD(row, "proj:transform").filter(s => s.length == 6 || s.length == 9)
        .map(AffineTransform.fromStac),
      scale = scale, offset = offset)
  }
}
