package graft

import org.apache.spark.sql.functions._
import graft.ops.ZOrder

/** Z-order layout: the bit-interleave closed form, the compact() layout
  * contract, and the property the operator EXISTS for — a z-sorted
  * layout prunes 2-D box queries that a lexicographic sort cannot.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 closed form and monotone range") {
    // a = 3 (011), b = 5 (101), 3 bits:
    // a-bits at weights 1,4,16 -> 1+4 = 5; b-bits at 2,8,32 -> 2+32 = 34
    val z = Seq((3L, 5L)).toDF("a", "b")
      .select(ZOrder.zValue2($"a", $"b", 3)).head.getLong(0)
    assert(z === 39L)
    // the curve is a bijection on the 2^bits x 2^bits grid
    val n = 16
    val grid = spark.range(n * n)
      .select(($"id" / n).cast("long").as("a"), pmod($"id", lit(n.toLong)).as("b"))
    val distinct = grid.select(ZOrder.zValue2($"a", $"b", 4).as("z"))
      .distinct().count()
    assert(distinct === (n * n).toLong, "z-values must be unique on the grid")
  }

  test("compact(): range-partitioned by z, sorted within partitions") {
    val n = 32
    val grid = spark.range(n * n)
      .select(($"id" / n).cast("long").as("a"), pmod($"id", lit(n.toLong)).as("b"))
    val out = ZOrder.compact(grid, $"a", $"b", bits = 5, numFiles = 8)
    assert(out.rdd.getNumPartitions === 8)
    // within every partition the z column is non-decreasing
    val sortedPer = out.select($"__z").rdd
      .mapPartitions { it =>
        val zs = it.map(_.getLong(0)).toSeq
        Iterator.single(zs == zs.sorted)
      }.collect()
    assert(sortedPer.forall(identity), "z must be sorted within each partition")
  }

  test("z-sorted chunks prune 2-D box queries a lexicographic sort cannot") {
    // 32x32 grid, "files" = contiguous chunks of 128 rows. A file is
    // SKIPPED for a box query iff its (a, b) min-max stats miss the box
    // — exactly what parquet row-group pruning does with column stats.
    val n = 32
    val pts = (0 until n * n).map(i => (i / n, i % n))
    def chunksOf(order: Seq[(Int, Int)]): Seq[((Int, Int), (Int, Int))] =
      order.grouped(128).map { c =>
        ((c.map(_._1).min, c.map(_._1).max), (c.map(_._2).min, c.map(_._2).max))
      }.toSeq
    def zOf(p: (Int, Int)): Long =
      (0 until 5).map { j =>
        (((p._1 >> j) & 1).toLong << (2 * j)) + (((p._2 >> j) & 1).toLong << (2 * j + 1))
      }.sum
    val lex = chunksOf(pts.sortBy(p => (p._1, p._2))) // lexicographic (a, b)
    val zor = chunksOf(pts.sortBy(zOf))
    def touched(chunks: Seq[((Int, Int), (Int, Int))],
                box: ((Int, Int), (Int, Int))): Int =
      chunks.count { case ((a0, a1), (b0, b1)) =>
        a1 >= box._1._1 && a0 <= box._1._2 && b1 >= box._2._1 && b0 <= box._2._2
      }
    // a-narrow box: both layouts prune well
    val aBox = ((0, 3), (0, n - 1))
    // b-narrow box: the lex sort's worst case — EVERY 4-row chunk spans
    // all of b, so nothing is pruned; z-order keeps boxes square
    val bBox = ((0, n - 1), (0, 3))
    assert(touched(lex, bBox) === lex.size, "lex layout cannot prune the b-narrow box")
    assert(touched(zor, bBox) < zor.size / 2,
      s"z-order must prune most chunks for the b-narrow box (${touched(zor, bBox)}/${zor.size})")
    assert(touched(zor, aBox) + touched(zor, bBox) < touched(lex, aBox) + touched(lex, bBox),
      "z-order must win on the two orientations combined")
  }
}
