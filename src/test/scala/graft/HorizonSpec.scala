package graft

import graft.ops.Focal
import graft.scan.Tile

/** Hand oracles for the horizon scan (ops.Focal.horizonQ): dense driver
  * replay, strict-stencil border/NaN behavior, and the exact-rational
  * floor convention. */
class HorizonSpec extends SparkSpec {
  import spark.implicits._

  private def tile(yc: Int, xc: Int, n: Int, px: Array[Double]) =
    Tile(0, 0, "z", 0L, yc, xc, 0, 0, n, n, px)

  test("horizonQ equals a dense driver replay on a random integer DEM") {
    val g = 18
    val d = 3
    val rnd = new scala.util.Random(7)
    val z = Array.fill(g * g)(rnd.nextInt(40).toDouble)
    val tiles = for (yc <- 0 until 3; xc <- 0 until 3) yield
      tile(yc, xc, 6, Array.tabulate(36)(i => z((yc * 6 + i / 6) * g + xc * 6 + i % 6)))
    val got = Focal.horizonQ(spark.createDataset(tiles), 6, 6, g, g, d)
      .collect().flatMap { t =>
        assert(t.band == "z_horq")
        for (r <- 0 until t.height; c <- 0 until t.width)
          yield (t.yChunk * 6 + r, t.xChunk * 6 + c) -> t.pixels(r * t.width + c)
      }.toMap
    val dirs = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
    for (r <- 0 until g; c <- 0 until g) {
      val v = got((r, c))
      if (r < d || r >= g - d || c < d || c >= g - d)
        assert(v.isNaN, s"border ($r,$c) must be NaN (strict stencil)")
      else {
        val want = dirs.map { case (dr, dc) =>
          (1 to d).map { k =>
            math.floor(1024.0 * (z((r + k * dr) * g + (c + k * dc)) - z(r * g + c)) / k)
          }.max
        }.sum
        assert(v == want, s"($r,$c): got $v want $want")
      }
    }
  }

  test("a NaN cell poisons exactly the cells whose rays cross it") {
    val g = 12
    val d = 2
    val z = Array.tabulate(g * g)(i => ((i * 13) % 9).toDouble)
    z(5 * g + 5) = Double.NaN
    val got = Focal.horizonQ(spark.createDataset(
        Seq(tile(0, 0, g, z))), g, g, g, g, d)
      .collect().flatMap { t =>
        for (r <- 0 until t.height; c <- 0 until t.width)
          yield (r, c) -> t.pixels(r * t.width + c)
      }.toMap
    // cells whose 8-ray star of radius 2 passes through (5,5): same
    // row/col/diagonal within distance 2 (plus (5,5) itself)
    for (r <- d until g - d; c <- d until g - d) {
      val dr = r - 5; val dc = c - 5
      val onStar = (dr == 0 && dc.abs <= d) || (dc == 0 && dr.abs <= d) ||
        (dr.abs == dc.abs && dr.abs <= d)
      assert(got((r, c)).isNaN == onStar, s"($r,$c)")
    }
  }

  test("flat terrain: every direction's horizon is 0; radius >= chunk throws") {
    val g = 9
    val z = Array.fill(g * g)(5.0)
    val got = Focal.horizonQ(spark.createDataset(Seq(tile(0, 0, g, z))),
        g, g, g, g, d = 2)
      .collect().flatMap { t =>
        for (r <- 0 until t.height; c <- 0 until t.width)
          yield (r, c) -> t.pixels(r * t.width + c)
      }.toMap
    for (r <- 2 until g - 2; c <- 2 until g - 2)
      assert(got((r, c)) == 0.0)
    val ex = intercept[IllegalArgumentException] {
      Focal.horizonQ(spark.createDataset(Seq(tile(0, 0, g, z))),
        g, g, g, g, d = 9)
    }
    assert(ex.getMessage.contains("halo depth"))
  }
}
