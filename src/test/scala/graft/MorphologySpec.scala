package graft

import graft.ops.Focal
import graft.scan.Tile

/** Hand oracles for binary morphology (ops.Focal.morphology): closing
  * fills pinholes, opening removes speckle, 0-padding border semantics,
  * cross-chunk halo, and the binary-input guard. */
class MorphologySpec extends SparkSpec {
  import spark.implicits._

  private def tile(yc: Int, xc: Int, n: Int, px: Array[Double]) =
    Tile(0, 0, "m", 0L, yc, xc, 0, 0, n, n, px)

  private def run(tiles: Seq[Tile], chunk: Int, grid: Int, radius: Int)
      : Map[(String, Int, Int), Double] =
    Focal.morphology(spark.createDataset(tiles), chunk, chunk, grid, grid, radius)
      .collect().flatMap { t =>
        for (r <- 0 until t.height; c <- 0 until t.width)
          yield (t.band, t.yChunk * chunk + r, t.xChunk * chunk + c) ->
            t.pixels(r * t.width + c)
      }.toMap

  test("closing fills a pinhole; opening erases a speckle; 0-pad keeps all-ones") {
    val n = 7
    val ones = Array.fill(n * n)(1.0)
    val pinhole = ones.clone(); pinhole(3 * n + 3) = 0.0
    val m = run(Seq(tile(0, 0, n, pinhole)), chunk = n, grid = n, radius = 1)
    for (r <- 0 until n; c <- 0 until n) {
      assert(m(("m_close", r, c)) == 1.0, s"close ($r,$c)") // hole filled
    }
    // opening of the pinhole mask: erosion kills the 3x3 around the hole,
    // dilation regrows all of it EXCEPT nothing — the hole sat deep inside,
    // so opening restores the original (pinhole survives opening)
    assert(m(("m_open", 3, 3)) == 0.0)

    val speck = Array.fill(n * n)(0.0); speck(3 * n + 3) = 1.0
    val s = run(Seq(tile(0, 0, n, speck)), chunk = n, grid = n, radius = 1)
    for (r <- 0 until n; c <- 0 until n)
      assert(s(("m_open", r, c)) == 0.0, s"open ($r,$c)") // speckle gone
    assert(s(("m_close", 3, 3)) == 1.0) // closing keeps it

    // all-ones: closing AND opening are identity under 0-padding (the
    // eroded border regrows from the surviving interior)
    val a = run(Seq(tile(0, 0, n, ones)), chunk = n, grid = n, radius = 1)
    for (r <- 0 until n; c <- 0 until n) {
      assert(a(("m_close", r, c)) == 1.0)
      assert(a(("m_open", r, c)) == 1.0)
    }
  }

  test("cross-chunk pinhole on the chunk seam closes via the halo") {
    // 6x6 grid, chunk 3: a solid 1-block rows/cols 1..4 with a hole at
    // the seam (2,3) — the hole's 3x3 context spans all four chunks
    val g = 6
    val full = Array.tabulate(g * g) { i =>
      val r = i / g; val c = i % g
      if (r >= 1 && r <= 4 && c >= 1 && c <= 4) 1.0 else 0.0
    }
    full(2 * g + 3) = 0.0
    val tiles = for (yc <- 0 until 2; xc <- 0 until 2) yield
      tile(yc, xc, 3, Array.tabulate(9)(i => full((yc * 3 + i / 3) * g + xc * 3 + i % 3)))
    val m = run(tiles, chunk = 3, grid = g, radius = 1)
    assert(m(("m_close", 2, 3)) == 1.0, "seam pinhole must close")
    assert(m(("m_close", 1, 1)) == 1.0) // block interior survives closing
    assert(m(("m_close", 0, 0)) == 0.0) // background stays background
    // the holed 4x4 block erodes to nothing: its opening is empty
    assert(m(("m_open", 2, 2)) == 0.0)
    assert(m(("m_open", 0, 0)) == 0.0)
  }

  test("NaN reads as background; non-binary input throws loudly") {
    val n = 5
    val withNan = Array.fill(n * n)(1.0); withNan(2 * n + 2) = Double.NaN
    val m = run(Seq(tile(0, 0, n, withNan)), chunk = n, grid = n, radius = 1)
    assert(m(("m_close", 2, 2)) == 1.0) // NaN hole = background 0, closed
    val bad = Array.fill(n * n)(1.0); bad(0) = 2.0
    val ex = intercept[org.apache.spark.SparkException] {
      run(Seq(tile(0, 0, n, bad)), chunk = n, grid = n, radius = 1)
    }
    assert(ex.getMessage.contains("0/1 mask") ||
      Option(ex.getCause).exists(_.getMessage.contains("0/1 mask")))
  }

  // radius sweep: the vHGW kernel must equal the dense O(r²) replay at
  // EVERY radius (its 3-comparisons-per-cell cost is radius-independent,
  // so so must be its correctness). The halo contract caps 2·radius at
  // chunk-1 (8-neighbor exchange), so radii ≥ 5 run on one 20-chunk —
  // line lengths there still exercise multi-block and sub-block vHGW
  // windows (w = 15, 19 over 20-to-56-cell padded lines); 2r caps at
  // chunk-1, so 9 is the deepest legal radius on a 20-grid.
  for (radius <- Seq(1, 2, 3, 4, 7, 9))
  test(s"radius $radius equals a driver-side dense replay on a random mask") {
    val g = 20
    val chunk = if (2 * radius < 10) 10 else g
    val rnd = new scala.util.Random(42 + radius)
    val mask = Array.fill(g * g)(if (rnd.nextBoolean()) 1.0 else 0.0)
    val nc = g / chunk
    val tiles = for (yc <- 0 until nc; xc <- 0 until nc) yield
      tile(yc, xc, chunk, Array.tabulate(chunk * chunk)(i =>
        mask((yc * chunk + i / chunk) * g + xc * chunk + i % chunk)))
    val got = run(tiles, chunk = chunk, grid = g, radius = radius)
    val R = radius
    // dense replay with explicit 0-extension
    def at(a: Array[Double], r: Int, c: Int): Double =
      if (r < 0 || r >= g || c < 0 || c >= g) 0.0 else a(r * g + c)
    def win(a: Array[Double], r: Int, c: Int, isMax: Boolean): Double = {
      var m = if (isMax) 0.0 else 1.0
      for (dr <- -R to R; dc <- -R to R) {
        val v = at(a, r + dr, c + dc)
        if (if (isMax) v > m else v < m) m = v
      }
      m
    }
    // build extended-domain dilate/erode on a padded array
    val pg = g + 4 * R
    def ext(f: (Int, Int) => Double): Array[Double] =
      Array.tabulate(pg * pg)(i => f(i / pg - 2 * R, i % pg - 2 * R))
    val dil = ext((r, c) => win(mask, r, c, isMax = true))
    val ero = ext((r, c) => win(mask, r, c, isMax = false))
    def atp(a: Array[Double], r: Int, c: Int): Double = a((r + 2 * R) * pg + (c + 2 * R))
    for (r <- 0 until g; c <- 0 until g) {
      var cl = 1.0; var op = 0.0
      for (dr <- -R to R; dc <- -R to R) {
        cl = math.min(cl, atp(dil, r + dr, c + dc))
        op = math.max(op, atp(ero, r + dr, c + dc))
      }
      assert(got(("m_close", r, c)) == cl, s"close ($r,$c)")
      assert(got(("m_open", r, c)) == op, s"open ($r,$c)")
    }
  }
}
