package graft.stac

import graft.core.{AffineTransform, Bounds}

/** Canonical STAC asset — one single-band raster file. Mirrors the
  * reference `AssetDict` (`stackstac/stac_types.py:81-98`): `proj:*`
  * fields optional at asset level (overriding item level,
  * `prepare.py:146-149`), scale/offset from `raster:bands`
  * (`prepare.py:150-164`).
  */
final case class StacAsset(
    href: String,
    mimetype: Option[String] = None,
    epsg: Option[Int] = None,
    bbox: Option[Bounds] = None,              // proj:bbox, in asset CRS
    shape: Option[(Int, Int)] = None,          // proj:shape (height, width)
    transform: Option[AffineTransform] = None, // proj:transform
    scale: Double = 1.0,
    offset: Double = 0.0)

/** Canonical STAC item — one scene at one datetime. Mirrors `ItemDict`
  * (`stac_types.py:116-126`): `bbox` is lat/lon, `properties` is an open
  * map (accumulated to metadata columns, `accumulate_metadata.py:42-98`),
  * item-level `proj:*` are asset fallbacks.
  */
final case class StacItem(
    id: String,
    datetime: Option[String],                 // ISO8601; missing sorts as ""
    bboxLatLon: Option[Bounds] = None,
    epsg: Option[Int] = None,
    shape: Option[(Int, Int)] = None,
    transform: Option[AffineTransform] = None,
    assets: Map[String, StacAsset] = Map.empty,
    properties: Map[String, String] = Map.empty)

object Stac {
  /** ISO8601 → epoch micros, UTC (reference `prepare.py:406-417`). */
  def parseDatetimeMicros(iso: String): Long = {
    val t = java.time.OffsetDateTime.parse(
      // tolerate bare "Z"-less timestamps by assuming UTC
      if (iso.endsWith("Z") || iso.contains("+") || iso.lastIndexOf('-') > 9) iso
      else iso + "Z")
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
  }

  /** Sort items by raw datetime string, missing last as "" (reference
    * `stack.py:283-288`). */
  def sortByDate(items: Seq[StacItem], descending: Boolean = false): Seq[StacItem] = {
    // stable in BOTH directions, like Python sorted(reverse=True)
    // (stack.py:283-288): equal-datetime items keep input order — a
    // list.reverse would flip ties and change mosaic winners.
    val ord = if (descending) Ordering[String].reverse else Ordering[String]
    items.sortBy(_.datetime.getOrElse(""))(ord)
  }

  /** Structured mimetype match (reference `Mimetype.from_str` /
    * `is_valid_for`, `prepare.py:35-56`): "type/subtype;p1=v1" pattern
    * matches a concrete mimetype when type matches, subtype matches or is
    * absent in the pattern, and every pattern parameter appears.
    */
  def mimetypeMatches(pattern: String, concrete: String): Boolean = {
    def parse(s: String): (String, String, Set[String]) = {
      val parts = s.split(";").map(_.trim)
      val Array(t, st @ _*) = parts(0).split("/", 2): @unchecked
      (t, if (st.nonEmpty) st.head else "", parts.drop(1).filter(_.nonEmpty).toSet)
    }
    val (pt, pst, pp) = parse(pattern)
    val (ct, cst, cp) = parse(concrete)
    pt == ct && (pst.isEmpty || pst == cst) && pp.subsetOf(cp)
  }
}
