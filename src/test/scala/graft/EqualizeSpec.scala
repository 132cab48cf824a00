package graft

import graft.ops.Equalize
import graft.scan.Tile

/** Hand + replay oracles for global histogram equalization
  * (ops.Equalize): the exact-integer CDF remap, NaN transparency, the
  * degenerate constant raster, and the loud distinct-value guard. */
class EqualizeSpec extends SparkSpec {
  import spark.implicits._

  private def tile(yc: Int, xc: Int, px: Array[Double]): Tile =
    Tile(0, 0, "gray", 0L, yc, xc, 0, 0, 1, px.length, px)

  test("remap matches the integer CDF formula; NaN rides NaN") {
    // values: 10 ×3, 20 ×1, 30 ×2  (N=6, cdfMin=3, levels=256)
    // eq(10) = (3-3)*255/3 = 0; eq(20) = (4-3)*255/3 = 85 (exact);
    // eq(30) = (6-3)*255/3 = 255.
    val in = Seq(
      tile(0, 0, Array(10.0, 10.0, 20.0)),
      tile(0, 1, Array(30.0, Double.NaN, 10.0, 30.0)))
    val out = Equalize.histEq(in.toDS()).collect()
      .map(t => (t.yChunk, t.xChunk) -> t.pixels).toMap
    assert(out((0, 0)).toSeq == Seq(0.0, 0.0, 85.0))
    val t1 = out((0, 1))
    assert(t1(0) == 255.0 && t1(2) == 0.0 && t1(3) == 255.0)
    assert(t1(1).isNaN)
  }

  test("a constant raster degenerates to zeros, not a divide-by-zero") {
    val out = Equalize.histEq(Seq(tile(0, 0, Array(7.0, 7.0, 7.0))).toDS())
      .collect().head
    assert(out.pixels.toSeq == Seq(0.0, 0.0, 0.0))
  }

  test("output histogram is flat for a uniform input multiset") {
    // 16 distinct values, once each: eq hits 16 evenly spaced levels
    // with min 0 and max levels-1.
    val in = Seq(tile(0, 0, (1 to 16).map(_.toDouble).toArray))
    val out = Equalize.histEq(in.toDS(), levels = 256).collect().head.pixels
    assert(out.min == 0.0 && out.max == 255.0)
    assert(out.distinct.length == 16)
    val gaps = out.sorted.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(gaps.forall(g => g == 17.0))
  }

  test("distinct-value blowup guards loudly") {
    val in = Seq(tile(0, 0, (0 until 100).map(_.toDouble).toArray))
    val ex = intercept[IllegalStateException] {
      Equalize.histEq(in.toDS(), maxDistinct = 50).collect()
    }
    assert(ex.getMessage.contains("distinct"))
  }

  test("guard fires on a census far beyond the bound (limit-fetched, " +
       "not driver-materialized)") {
    // 40k distinct values vs maxDistinct=10: the limit-bounded fetch
    // pulls at most 11 rows to the driver before throwing — a
    // continuous-valued raster can't OOM the driver before the guard.
    val in = (0 until 40).map(c =>
      tile(0, c, Array.tabulate(1000)(i => (c * 1000 + i).toDouble)))
    val ex = intercept[IllegalStateException] {
      Equalize.histEq(in.toDS(), maxDistinct = 10).collect()
    }
    assert(ex.getMessage.contains("distinct"))
  }

  test("-0.0 pixels remap through the 0.0 census entry") {
    // Spark normalizes -0.0 to 0.0 in group keys; the remap side must
    // agree or the broadcast lookup misses. -0.0 == 0.0, so both land
    // on the same CDF row.
    val in = Seq(tile(0, 0, Array(-0.0, 0.0, 5.0)))
    val out = Equalize.histEq(in.toDS()).collect().head.pixels
    // values: 0.0 ×2 (cdf 2 = cdfMin), 5.0 ×1 → eq(0)=0, eq(5)=255
    assert(out.toSeq == Seq(0.0, 0.0, 255.0))
  }
}
