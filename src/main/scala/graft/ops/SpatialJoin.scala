package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large×large spatial radius join via integer grid-cell blocking —
  * the planar cousin of [[RangeJoin]]'s interval bucketing and the
  * geometric member of the engine's no-all-pairs family ([[graft.dedup.Dedup]]'s
  * LSH bands, [[graft.ann.Ann]]'s IVF cells).
  *
  * Pairs within L2 distance r of each other must share or neighbor a
  * grid cell of side `cellSize` ≥ r, so the candidate space is an
  * EQUI-join on cell ids: the probe side is replicated to its 3×3
  * neighbor cells (a constant ×9, via two `sequence(-1,1)` explodes —
  * never data-dependent), the build side keys by its home cell, and
  * Catalyst runs a plain shuffled (or broadcast, if one side is small)
  * hash join keyed by (cx, cy) — no BroadcastNestedLoopJoin, no
  * cartesian anywhere in the plan. The exact integer L2² predicate
  * then verifies candidates; every true pair is found exactly once
  * (each b point lives in ONE home cell, and that cell appears exactly
  * once in a's 3×3 probe set).
  *
  * At 100 TB: shuffle volume is 9·|A| + |B| rows keyed by cell;
  * per-cell work is |A∩cell|·|B∩cell| — bounded by the data's spatial
  * density, not its size. A skewed hot cell is a skewed join key like
  * any other (AQE skew-split or [[graft.ops.Salt]] applies unchanged).
  * Coordinates are integers (quantize upstream): the verify predicate
  * and the cell math are exact, so an independent engine replays the
  * result from the ALL-PAIRS definition and must agree — the oracle
  * proves the blocking loses nothing.
  */
object SpatialJoin {

  /** Floor division, exact for negative coordinates too. */
  private def fdiv(c: Column, d: Long): Column = ((c - pmod(c, lit(d))) / d).cast("long")

  /** All (a, b) pairs with (ax−bx)² + (ay−by)² ≤ r2. Inputs carry
    * integer coordinate columns `x`, `y` plus any id columns; output
    * is a's columns ++ b's columns ++ `d2`. `cellSize` must be ≥
    * ⌈sqrt(r2)⌉ (checked) — correctness needs every r-ball to fit in
    * the 3×3 neighborhood. */
  def radiusJoin(a: DataFrame, b: DataFrame, cellSize: Long, r2: Long): DataFrame = {
    require(cellSize >= 1 && r2 >= 0, s"need cellSize >= 1, r2 >= 0 (got $cellSize, $r2)")
    require(cellSize * cellSize >= r2,
      s"cellSize² ($cellSize²) must cover r² ($r2): a radius larger than the cell " +
        "escapes the 3×3 neighborhood and the blocking would drop true pairs")
    val aCells = a
      .withColumn("__nx", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("__ny", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("__cx", fdiv(col("x"), cellSize) + col("__nx"))
      .withColumn("__cy", fdiv(col("y"), cellSize) + col("__ny"))
      .drop("__nx", "__ny")
    val bCells = b.columns.foldLeft(b)((d, c) => d.withColumnRenamed(c, s"b_$c"))
      .withColumn("__cx", fdiv(col("b_x"), cellSize))
      .withColumn("__cy", fdiv(col("b_y"), cellSize))
    val dx = col("x") - col("b_x")
    val dy = col("y") - col("b_y")
    aCells.join(bCells, Seq("__cx", "__cy"))
      .withColumn("d2", dx * dx + dy * dy)
      .filter(col("d2") <= lit(r2))
      .drop("__cx", "__cy")
  }

  /** POINT-IN-POLYGON containment join — the polygon member of the
    * blocking family: every (point, polygon) pair where the point lies
    * inside the polygon, by the CROSSING-NUMBER rule (Shimrat 1962 /
    * the classic even–odd ray cast) evaluated in EXACT integer
    * arithmetic, so arbitrary (non-convex, even self-intersecting —
    * even–odd semantics) rings replay bit-for-bit in any engine.
    *
    * Inputs: `points` carries integer columns `x`, `y` plus a unique
    * id; `polyVertices` carries one row per ring vertex —
    * (`polyIdCol`, `seq`, `x`, `y`), ordered by `seq`, implicitly
    * closed (last joins back to first). Output: the point's id and
    * coordinates with the containing polygon's id — one row per
    * containment.
    *
    * Plan shape, never all-pairs: polygons key by every grid cell
    * their BBOX overlaps (a polygon-area-bounded explode), points by
    * their home cell; candidates come from ONE equi-join on the cell,
    * are pre-filtered to the exact bbox, then join the edge list on the
    * polygon id and resolve with a map-side-combined crossing count
    * (odd = inside). Per-cell work is point-density × polygon-density,
    * like [[radiusJoin]]; a continent-sized polygon replicating to many
    * cells is the known skew corner (hierarchical grids are the
    * standard mitigation) and is bounded by bboxArea/cellSize².
    *
    * Boundary points follow the half-open crossing convention — which
    * side counts is edge-direction-dependent (the standard crossing-
    * number ambiguity), but DETERMINISTIC: both engines run the same
    * integer comparisons, so even on-edge points hash-replay. */
  def pipJoin(points: DataFrame, pointIdCol: String,
              polyVertices: DataFrame, polyIdCol: String,
              cellSize: Long): DataFrame = {
    require(cellSize >= 1, s"pipJoin: cellSize=$cellSize")
    import org.apache.spark.sql.expressions.Window
    val pid = col(polyIdCol)
    val wSeq = Window.partitionBy(pid).orderBy(col("seq"))
    val wAll = Window.partitionBy(pid).orderBy(col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // close the ring: each vertex pairs with its successor, the last
    // with the first.
    val edges = polyVertices.select(pid, col("seq"),
        col("x").cast("long").as("x1"), col("y").cast("long").as("y1"))
      .withColumn("x2", coalesce(lead(col("x1"), 1).over(wSeq), first(col("x1")).over(wAll)))
      .withColumn("y2", coalesce(lead(col("y1"), 1).over(wSeq), first(col("y1")).over(wAll)))
      .drop("seq")
    val bbox = polyVertices.groupBy(pid).agg(
      min(col("x")).cast("long").as("bx0"), max(col("x")).cast("long").as("bx1"),
      min(col("y")).cast("long").as("by0"), max(col("y")).cast("long").as("by1"))
    val polyCells = bbox
      .withColumn("__cx", explode(sequence(fdiv(col("bx0"), cellSize), fdiv(col("bx1"), cellSize))))
      .withColumn("__cy", explode(sequence(fdiv(col("by0"), cellSize), fdiv(col("by1"), cellSize))))
    val pts = points.select(col(pointIdCol).as("pt_id"),
        col("x").cast("long").as("px"), col("y").cast("long").as("py"))
      .withColumn("__cx", fdiv(col("px"), cellSize))
      .withColumn("__cy", fdiv(col("py"), cellSize))
    val cand = pts.join(polyCells, Seq("__cx", "__cy"))
      .filter(col("px").between(col("bx0"), col("bx1")) &&
        col("py").between(col("by0"), col("by1")))
      .select(col("pt_id"), col("px"), col("py"), pid)
    // exact crossing test for the ray from (px,py) toward +x, half-open
    // in y ((y1 > py) != (y2 > py) excludes horizontal edges), with the
    // fractional intersection-x comparison cleared to integer products.
    val straddles = (col("y1") > col("py")) =!= (col("y2") > col("py"))
    val lhs = (col("px") - col("x1")) * (col("y2") - col("y1"))
    val rhs = (col("py") - col("y1")) * (col("x2") - col("x1"))
    val crosses = straddles && when(col("y2") > col("y1"), lhs < rhs).otherwise(lhs > rhs)
    cand.join(edges, Seq(polyIdCol))
      .groupBy(col("pt_id"), pid, col("px"), col("py"))
      .agg(sum(when(crosses, 1L).otherwise(0L)).as("__ncross"))
      .filter(col("__ncross") % 2 === 1)
      .select(col("pt_id"), col("px"), col("py"), pid)
  }
}
