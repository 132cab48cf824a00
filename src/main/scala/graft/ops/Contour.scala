package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Contour POLYLINE STITCHING — the epilogue that turns
  * [[Focal.contourSegments]]'s per-cell segments into whole iso-lines
  * with stable ids (what a GIS user downloads): segments sharing an
  * endpoint belong to one polyline, so polylines are the connected
  * components of the segment graph, computed with the same distributed
  * min-label + pointer-jump machinery the dedup family uses
  * ([[graft.dedup.Dedup.connectedComponents]]) — O(edges)/round shuffle,
  * ~log(diameter) rounds, no geometry ever assembled on the driver.
  *
  * Vertex identity: the quantized coordinate pair packed into one long
  * (round(y·q) << 32 | round(x·q)). Exact, because contourSegments emits
  * BIT-IDENTICAL doubles for the shared vertex of adjacent cells (same
  * edge ⇒ same inputs ⇒ same IEEE ops), so quantization is a stable key,
  * not a tolerance match. Marching squares gives every vertex degree ≤ 2
  * (an edge crossing is shared by exactly its two flanking cells), so
  * components are simple paths or cycles — `closed` below distinguishes
  * them. All levels stitch in ONE pass: a vertex determines its grid
  * edge and its interpolation parameter, and on a fixed edge t is
  * strictly monotone in the level, so vertices of different levels can
  * never collide — components cannot merge across levels by
  * construction (still grouped by (level, poly) downstream, defensively).
  *
  * Returns the input segments + `poly` (the component's min vertex key —
  * stable across runs and parallelism because it is data-determined). */
object Contour {

  private def key(y: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column,
                  q: Double): org.apache.spark.sql.Column =
    (round(y * q).cast("long") * lit(1L << 32) + round(x * q).cast("long"))

  def stitch(segs: Dataset[Focal.ContourSeg], quantum: Double = 1024.0): DataFrame = {
    val df = segs.toDF()
      .withColumn("k1", key(col("y1"), col("x1"), quantum))
      .withColumn("k2", key(col("y2"), col("x2"), quantum))
      .localCheckpoint(true) // the halo exchange runs once, not per CC round
    val comps = graft.dedup.Dedup.connectedComponents(
      df.select(col("k1").as("a"), col("k2").as("b")))
    df.join(comps.select(col("node").as("k1"), col("component").as("poly")), Seq("k1"))
  }

  /** Per-(level, polyline) census: segment count and whether the line is
    * CLOSED (a cycle: every vertex degree 2 ⇔ n_vertices == n_segments;
    * an open path has one more vertex than segments). The shape a
    * contour-map legend wants, and the replayable read-out of the
    * stitch. */
  def census(stitched: DataFrame): DataFrame = {
    val nSeg = stitched.groupBy(col("level"), col("poly"))
      .agg(count(lit(1)).as("n_segments"))
    val nVert = stitched.select(col("level"), col("poly"), col("k1").as("k"))
      .unionByName(stitched.select(col("level"), col("poly"), col("k2").as("k")))
      .groupBy(col("level"), col("poly"))
      .agg(countDistinct(col("k")).as("n_vertices"))
    nSeg.join(nVert, Seq("level", "poly"))
      .withColumn("closed", col("n_vertices") === col("n_segments"))
  }
}
