package graft.core

/** Pure-Scala CRS transforms for the EPSG codes raster stacking needs in
  * practice: EPSG:4326 (WGS84 lat/lon), EPSG:3857 (Web Mercator), and the
  * WGS84 UTM zones 326xx/327xx. Plays the role pyproj plays in the
  * reference (`stackstac/geom_utils.py:15,42-53`), with transformer logic
  * replaced by the published spherical-Mercator and Krüger transverse-
  * Mercator series (see Wikipedia "Transverse Mercator: flattening series";
  * same formulas PROJ's `tmerc` implements).
  *
  * All functions are pure and thread-safe, so executors can call them from
  * codegen'd expressions or `mapPartitions` without the thread-local dance
  * the reference needs for GDAL (`rio_reader.py:124-265`).
  */
object Proj {
  private val R      = 6378137.0              // WGS84 semi-major axis
  private val F      = 1.0 / 298.257223563    // WGS84 flattening
  private val K0     = 0.9996                 // UTM scale factor
  private val E0     = 500000.0               // UTM false easting
  private val DEG    = math.Pi / 180.0

  // Krüger series coefficients in n = f / (2 - f), to third order (sub-mm).
  private val n  = F / (2.0 - F)
  private val n2 = n * n; private val n3 = n2 * n
  private val A  = R / (1.0 + n) * (1.0 + n2 / 4.0 + n2 * n2 / 64.0)
  private val alpha = Array(
    n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0,
    13.0 * n2 / 48.0 - 3.0 * n3 / 5.0,
    61.0 * n3 / 240.0)
  private val beta = Array(
    n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0,
    n2 / 48.0 + n3 / 15.0,
    17.0 * n3 / 480.0)
  private val delta = Array(
    2.0 * n - 2.0 * n2 / 3.0 - 2.0 * n3,
    7.0 * n2 / 3.0 - 8.0 * n3 / 5.0,
    56.0 * n3 / 15.0)

  def isUtm(epsg: Int): Boolean =
    (epsg >= 32601 && epsg <= 32660) || (epsg >= 32701 && epsg <= 32760)

  def supported(epsg: Int): Boolean = epsg == 4326 || epsg == 3857 || isUtm(epsg)

  private def utmZoneLon0(epsg: Int): Double = {
    val zone = epsg % 100
    (zone * 6.0 - 183.0) * DEG
  }
  private def utmFalseNorthing(epsg: Int): Double =
    if (epsg >= 32701) 10000000.0 else 0.0

  /** lon/lat (deg) -> UTM easting/northing. */
  private def utmForward(lonDeg: Double, latDeg: Double, epsg: Int): (Double, Double) = {
    val lon0 = utmZoneLon0(epsg)
    val lat = latDeg * DEG; val lon = lonDeg * DEG - lon0
    val sinLat = math.sin(lat)
    val c = 2.0 * math.sqrt(n) / (1.0 + n)
    val t = math.sinh(atanh(sinLat) - c * atanh(c * sinLat))
    val xiP  = math.atan2(t, math.cos(lon))
    val etaP = atanh(math.sin(lon) / math.sqrt(1.0 + t * t))
    var xi = xiP; var eta = etaP
    var j = 1
    while (j <= 3) {
      xi  += alpha(j - 1) * math.sin(2.0 * j * xiP) * math.cosh(2.0 * j * etaP)
      eta += alpha(j - 1) * math.cos(2.0 * j * xiP) * math.sinh(2.0 * j * etaP)
      j += 1
    }
    (E0 + K0 * A * eta, utmFalseNorthing(epsg) + K0 * A * xi)
  }

  /** UTM easting/northing -> lon/lat (deg). */
  private def utmInverse(e: Double, nn: Double, epsg: Int): (Double, Double) = {
    val lon0 = utmZoneLon0(epsg)
    val xi  = (nn - utmFalseNorthing(epsg)) / (K0 * A)
    val eta = (e - E0) / (K0 * A)
    var xiP = xi; var etaP = eta
    var j = 1
    while (j <= 3) {
      xiP  -= beta(j - 1) * math.sin(2.0 * j * xi) * math.cosh(2.0 * j * eta)
      etaP -= beta(j - 1) * math.cos(2.0 * j * xi) * math.sinh(2.0 * j * eta)
      j += 1
    }
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
    var lat = chi
    j = 1
    while (j <= 3) { lat += delta(j - 1) * math.sin(2.0 * j * chi); j += 1 }
    val lon = lon0 + math.atan2(math.sinh(etaP), math.cos(xiP))
    (lon / DEG, lat / DEG)
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))

  /** lon/lat (deg) -> Web Mercator (spherical, as EPSG:3857 defines). */
  private def mercForward(lon: Double, lat: Double): (Double, Double) =
    (R * lon * DEG, R * math.log(math.tan(math.Pi / 4.0 + lat * DEG / 2.0)))

  private def mercInverse(x: Double, y: Double): (Double, Double) =
    (x / R / DEG, (2.0 * math.atan(math.exp(y / R)) - math.Pi / 2.0) / DEG)

  /** Transform one (x, y) between EPSG codes. x/y follow always_xy order
    * (lon, lat for 4326), matching pyproj `always_xy=True` in the
    * reference (`geom_utils.py:31`). */
  def transform(fromEpsg: Int, toEpsg: Int, x: Double, y: Double): (Double, Double) = {
    if (fromEpsg == toEpsg) return (x, y)
    val (lon, lat) = fromEpsg match {
      case 4326 => (x, y)
      case 3857 => mercInverse(x, y)
      case e if isUtm(e) => utmInverse(x, y, e)
      case e => throw new IllegalArgumentException(s"Unsupported source EPSG:$e")
    }
    toEpsg match {
      case 4326 => (lon, lat)
      case 3857 => mercForward(lon, lat)
      case e if isUtm(e) => utmForward(lon, lat, e)
      case e => throw new IllegalArgumentException(s"Unsupported target EPSG:$e")
    }
  }

  /** 4-corner envelope reprojection of a bbox — reference
    * `stackstac/geom_utils.py:42-53`. */
  def reprojectBounds(b: Bounds, fromEpsg: Int, toEpsg: Int): Bounds = {
    if (fromEpsg == toEpsg) return b
    val corners = Seq((b.minx, b.maxy), (b.minx, b.miny), (b.maxx, b.miny), (b.maxx, b.maxy))
      .map { case (x, y) => transform(fromEpsg, toEpsg, x, y) }
    val xs = corners.map(_._1); val ys = corners.map(_._2)
    Bounds(xs.min, ys.min, xs.max, ys.max)
  }

  /** 4-corner envelope of an affine-gridded raster reprojected to another
    * CRS — reference `stackstac/geom_utils.py:18-37`. */
  def boundsFromAffine(af: AffineTransform, ysize: Int, xsize: Int,
                       fromEpsg: Int, toEpsg: Int): Bounds =
    reprojectBounds(af.rasterBounds(ysize, xsize), fromEpsg, toEpsg)
}
