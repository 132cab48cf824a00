package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.core.RasterSpec
import graft.scan.Tile

/** A convex polygon zone in the output CRS, vertices in CCW order.
  * Convexity makes point-in-polygon a pure half-plane conjunction
  * (every edge cross product ≥ 0) — branch-free, exact on the
  * integer-ish fixtures, and the building block general polygons
  * decompose into (a concave zone = union of convex pieces sharing a
  * zoneId; the per-pixel test then ORs across pieces, which the
  * per-piece loop below already provides since a pixel inside two
  * pieces of the same zone would double-count — so decompositions must
  * be non-overlapping, the standard triangulation contract).
  *
  * SHARED-EDGE CAVEAT for decomposed zones: [[contains]] is
  * boundary-INCLUSIVE (cross ≥ 0), so "non-overlapping" convex pieces
  * that share an internal edge both claim a pixel whose center lies
  * exactly ON that edge — n_px/sum_q inflate for that zone. Interiors
  * being disjoint is NOT enough when pixel centers can land on the cut
  * line (integer-vertex cuts through integer-ish centers do exactly
  * this). Either place cuts off the center lattice, or adopt a
  * half-open convention per cut (drop the shared edge's `= 0` case
  * from one piece by nudging that piece's vertices ε inward along the
  * cut). Single-piece zones are unaffected — the inclusive boundary is
  * then just the usual "centers on the outline count" rule. */
final case class Zone(zoneId: Int, xs: Array[Double], ys: Array[Double]) {
  require(xs.length == ys.length && xs.length >= 3,
    s"zone $zoneId needs >= 3 vertices, got ${xs.length}")

  def bbox: (Double, Double, Double, Double) =
    (xs.min, ys.min, xs.max, ys.max)

  /** CCW convex containment: cross((v2-v1),(p-v1)) >= 0 for all edges. */
  def contains(px: Double, py: Double): Boolean = {
    var i = 0
    val n = xs.length
    while (i < n) {
      val j = (i + 1) % n
      val cross = (xs(j) - xs(i)) * (py - ys(i)) - (ys(j) - ys(i)) * (px - xs(i))
      if (cross < 0) return false
      i += 1
    }
    true
  }
}

/** Zonal statistics: per-zone aggregates of the pixels whose CENTERS
  * fall inside each zone — the raster⋈vector workhorse (mean NDVI per
  * field, per-district rainfall) the reference's users run downstream
  * via `rasterstats`.
  *
  * Scale shape: zones are census-sized (admin units, AOIs — thousands,
  * not billions), so they BROADCAST; each tile computes per-zone
  * partial (count, sum) in one tight loop over its own pixels (a
  * per-zone bbox-vs-tile precheck skips non-overlapping zones before
  * any per-pixel work), and the only shuffle is the tiny
  * (zones-hit × tiles) partial-row aggregation. Never a pixel-level
  * spatial join, never a collect of pixel data.
  */
object Zonal {

  /** Per-zone (n_px, sum_q, pos_chk) over a tile layer. Values are
    * quantized `q = round(v * quantScale)` before summing so the
    * aggregate is exact integer arithmetic at any parallelism
    * (`quantScale = 1` for integer-valued rasters). `pos_chk` is the
    * position-weighted checksum (Σ q·(row·gridW+col)) that pins WHICH
    * pixels were selected, not just how many.
    *
    * Input contract: one valid value per pixel (apply after the
    * temporal composite); overlapping same-pixel tiles would
    * double-count, as in any partial-agg pipeline.
    */
  def stats(tiles: Dataset[Tile], spec: RasterSpec, chunkY: Int, chunkX: Int,
            zones: Seq[Zone], quantScale: Long = 1L): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val bcZones = spark.sparkContext.broadcast(zones.toArray)
    val minx = spec.bounds.minx
    val maxy = spec.bounds.maxy
    val xres = spec.xres
    val yres = spec.yres
    val (_, gridW) = spec.shape

    tiles.flatMap { t =>
      val zs = bcZones.value
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
      // tile rect in world coords (pixel-center extremes)
      val r0 = t.yChunk * chunkY + t.rowOff
      val c0 = t.xChunk * chunkX + t.colOff
      val tMinX = minx + (c0 + 0.5) * xres
      val tMaxX = minx + (c0 + t.width - 0.5) * xres
      val tMaxY = maxy - (r0 + 0.5) * yres
      val tMinY = maxy - (r0 + t.height - 0.5) * yres
      var zi = 0
      while (zi < zs.length) {
        val z = zs(zi)
        val (zMinX, zMinY, zMaxX, zMaxY) = z.bbox
        if (!(zMaxX < tMinX || zMinX > tMaxX || zMaxY < tMinY || zMinY > tMaxY)) {
          var n = 0L; var sum = 0L; var chk = 0L
          var r = 0
          while (r < t.height) {
            val py = maxy - (r0 + r + 0.5) * yres
            var c = 0
            while (c < t.width) {
              val v = t.pixels(r * t.width + c)
              if (!v.isNaN) {
                val px = minx + (c0 + c + 0.5) * xres
                if (z.contains(px, py)) {
                  val q = math.round(v * quantScale)
                  n += 1; sum += q
                  chk += q * ((r0 + r).toLong * gridW + (c0 + c))
                }
              }
              c += 1
            }
            r += 1
          }
          if (n > 0) out += ((z.zoneId, n, sum, chk))
        }
        zi += 1
      }
      out
    }.toDF("zone_id", "n", "sum_q", "chk")
      .groupBy($"zone_id")
      .agg(sum($"n").as("n_px"), sum($"sum_q").as("sum_q"),
           sum($"chk").as("pos_chk"))
  }
}
