package graft

import org.scalacheck.Gen
import graft.scan.Tile
import graft.ops.{Mosaic, MosaicAgg, PixelMeanAgg}

/** Mosaic fixtures from the reference (`tests/test_mosaic.py:16-41`) plus
  * differential fuzz against a straight-line driver implementation
  * (`tests/test_mosaic.py:44-87` pattern). */
class MosaicSpec extends SparkSpec with GenChecks {

  private val NaN = Double.NaN
  private def row(itemIdx: Int, px: Array[Double]) =
    Tile(itemIdx, 0, "b", itemIdx.toLong, 0, 0, 0, 0, 1, px.length, px)

  // Reference example (axis 0):
  //   [[NaN,   1,   2, NaN],
  //    [NaN,  10,  20,  30],
  //    [NaN, 100, 200, NaN]]
  private val layers = Seq(
    row(0, Array(NaN, 1, 2, NaN)),
    row(1, Array(NaN, 10, 20, 30)),
    row(2, Array(NaN, 100, 200, NaN)))

  private def sameArr(a: Array[Double], b: Array[Double]): Boolean =
    a.length == b.length && a.indices.forall(i => a(i) == b(i) || (a(i).isNaN && b(i).isNaN))

  test("mosaic forward (last on top) matches reference example") {
    val agg = new MosaicAgg(1, 4, reverse = false)
    val buf = layers.foldLeft(agg.zero)(agg.reduce)
    assert(sameArr(agg.finish(buf), Array(NaN, 100, 200, 30)))
  }

  test("mosaic reverse (first on top) matches reference example") {
    val agg = new MosaicAgg(1, 4, reverse = true)
    val buf = layers.foldLeft(agg.zero)(agg.reduce)
    assert(sameArr(agg.finish(buf), Array(NaN, 1, 2, 30)))
  }

  test("mosaic is order-independent and merge-consistent (fuzz)") {
    val gen = for {
      nLayers <- Gen.choose(1, 6)
      width <- Gen.choose(1, 8)
      vals <- Gen.listOfN(nLayers * width,
        Gen.frequency(3 -> Gen.const(NaN), 7 -> Gen.choose(0.0, 100.0)))
    } yield (nLayers, width, vals)
    forAllN(gen, n = 50) { case (nLayers, width, vals) =>
      val tiles = (0 until nLayers).map(i =>
        row(i, vals.slice(i * width, (i + 1) * width).toArray))
      // straight-line reference: last-on-top = scan from last, keep first valid
      val want = (0 until width).map { c =>
        tiles.reverse.map(_.pixels(c)).find(!_.isNaN).getOrElse(NaN)
      }.toArray
      val agg = new MosaicAgg(1, width)
      // shuffled reduce order + a split merge must both agree
      val shuffled = scala.util.Random.shuffle(tiles)
      val direct = agg.finish(shuffled.foldLeft(agg.zero)(agg.reduce))
      assert(sameArr(direct, want))
      val (l, r) = shuffled.splitAt(shuffled.length / 2)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      assert(sameArr(merged, want))
    }
  }

  test("distributed mosaic over Dataset[Tile] matches local") {
    import spark.implicits._
    val chunk = 4
    // two bands, three items, sparse rects inside a 4x4 chunk
    def t(item: Int, band: String, rowOff: Int, colOff: Int, h: Int, w: Int, v: Double) =
      Tile(item, if (band == "a") 0 else 1, band, item.toLong, 0, 0,
           rowOff, colOff, h, w, Array.fill(h * w)(v))
    val tiles = Seq(
      t(0, "a", 0, 0, 2, 2, 1.0), t(2, "a", 1, 1, 2, 2, 3.0),
      t(1, "a", 0, 0, 4, 4, 2.0), t(0, "b", 3, 3, 1, 1, 9.0))
    val out = Mosaic(spark.createDataset(tiles), chunk).collect()
      .map(c => (c.band, c.pixels)).toMap
    val a = out("a")
    // last-on-top: item2 rect wins where present, else item1's full cover
    assert(a(0) == 2.0)             // only items 0,1 cover (0,0); item1 on top
    assert(a(1 * 4 + 1) == 3.0)     // item2 rect top
    assert(a(3 * 4 + 3) == 2.0)     // item1 only
    val b = out("b")
    assert(b(3 * 4 + 3) == 9.0 && b(0).isNaN)
  }

  test("pixel mean skips NaN") {
    val agg = new PixelMeanAgg(1, 3)
    val buf = Seq(
      row(0, Array(1.0, NaN, 4.0)),
      row(1, Array(3.0, NaN, NaN))).foldLeft(agg.zero)(agg.reduce)
    val got = agg.finish(buf)
    assert(got(0) == 2.0 && got(1).isNaN && got(2) == 4.0)
  }
}
