package graft.core

/** Axis-aligned bounding box in some CRS.
  *
  * Semantics mirror the reference envelope algebra:
  * union fold (reference `stackstac/geom_utils.py:56-63`), strict-overlap
  * test (`geom_utils.py:66-68`), and GDAL `-tap`-style snapping
  * (`geom_utils.py:71-80`).
  */
final case class Bounds(minx: Double, miny: Double, maxx: Double, maxy: Double) {
  def width: Double  = maxx - minx
  def height: Double = maxy - miny

  def union(o: Bounds): Bounds =
    Bounds(math.min(minx, o.minx), math.min(miny, o.miny),
           math.max(maxx, o.maxx), math.max(maxy, o.maxy))

  /** Strict interior overlap: zero-area touching edges do NOT overlap. */
  def overlaps(o: Bounds): Boolean =
    math.max(minx, o.minx) < math.min(maxx, o.maxx) &&
    math.max(miny, o.miny) < math.min(maxy, o.maxy)

  def intersection(o: Bounds): Option[Bounds] = {
    val b = Bounds(math.max(minx, o.minx), math.max(miny, o.miny),
                   math.min(maxx, o.maxx), math.min(maxy, o.maxy))
    if (b.minx < b.maxx && b.miny < b.maxy) Some(b) else None
  }

  /** Floor/ceil each edge to a multiple of the resolution (GDAL `-tap`). */
  def snapped(xres: Double, yres: Double): Bounds =
    Bounds(
      math.floor(minx / xres) * xres,
      math.floor(miny / yres) * yres,
      math.ceil(maxx / xres) * xres,
      math.ceil(maxy / yres) * yres
    )
}

object Bounds {
  def union(bs: Iterable[Bounds]): Bounds = bs.reduce(_ union _)
}
