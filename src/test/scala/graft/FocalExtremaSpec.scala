package graft

import graft.ops.Focal
import graft.scan.Tile

/** Dense driver replays for radius-independent focal max/min
  * (ops.Focal.focalExtrema): ignore-nodata semantics, truncated edge
  * windows, NaN only where the whole window is invalid, and the vHGW
  * kernel's radius sweep against a brute O(r²) oracle. */
class FocalExtremaSpec extends SparkSpec {
  import spark.implicits._

  private def tile(yc: Int, xc: Int, n: Int, px: Array[Double]) =
    Tile(0, 0, "z", 0L, yc, xc, 0, 0, n, n, px)

  for (radius <- Seq(1, 2, 4))
  test(s"radius $radius matches a dense ignore-nodata replay, NaNs included") {
    val g = 20
    val rnd = new scala.util.Random(100 + radius)
    val vals = Array.tabulate(g * g)(i =>
      if (rnd.nextInt(10) == 0) Double.NaN else rnd.nextInt(97).toDouble)
    val tiles = for (yc <- 0 until 2; xc <- 0 until 2) yield
      tile(yc, xc, 10, Array.tabulate(100)(i =>
        vals((yc * 10 + i / 10) * g + xc * 10 + i % 10)))
    val got = Focal.focalExtrema(spark.createDataset(tiles), 10, 10, g, g, radius)
      .collect().flatMap { t =>
        for (r <- 0 until t.height; c <- 0 until t.width)
          yield (t.band, t.yChunk * 10 + r, t.xChunk * 10 + c) ->
            t.pixels(r * t.width + c)
      }.toMap
    for (r <- 0 until g; c <- 0 until g) {
      var mx = Double.NegativeInfinity
      var mn = Double.PositiveInfinity
      for {
        dr <- -radius to radius; dc <- -radius to radius
        rr = r + dr; cc = c + dc
        if rr >= 0 && rr < g && cc >= 0 && cc < g
        v = vals(rr * g + cc) if !v.isNaN
      } { mx = math.max(mx, v); mn = math.min(mn, v) }
      val wantMax = if (mx.isNegInfinity) Double.NaN else mx
      val wantMin = if (mn.isPosInfinity) Double.NaN else mn
      def eq(a: Double, b: Double) =
        java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
      assert(eq(got(("z_max", r, c)), wantMax), s"max ($r,$c) r=$radius")
      assert(eq(got(("z_min", r, c)), wantMin), s"min ($r,$c) r=$radius")
    }
  }

  test("an all-NaN window yields NaN, not a sentinel") {
    // 5x5 all-NaN raster: every output must be NaN for any radius
    val n = 5
    val px = Array.fill(n * n)(Double.NaN)
    val out = Focal.focalExtrema(
      spark.createDataset(Seq(tile(0, 0, n, px))), n, n, n, n, 2)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.pixels.forall(_.isNaN)))
  }
}
