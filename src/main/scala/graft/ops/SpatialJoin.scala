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
}
