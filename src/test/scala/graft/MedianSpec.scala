package graft

import graft.ops.PixelMedianAgg
import graft.scan.Tile

class MedianSpec extends SparkSpec {
  private val NaN = Double.NaN
  private def row(i: Int, px: Array[Double]) =
    Tile(i, 0, "b", i.toLong, 0, 0, 0, 0, 1, px.length, px)

  test("median: odd, even, NaN-skipping, all-NaN") {
    val agg = new PixelMedianAgg(1, 4)
    val buf = Seq(
      row(0, Array(1.0, 4.0, NaN, NaN)),
      row(1, Array(3.0, 2.0, 5.0, NaN)),
      row(2, Array(2.0, NaN, 7.0, NaN))).foldLeft(agg.zero)(agg.reduce)
    val got = agg.finish(buf)
    assert(got(0) == 2.0)            // {1,3,2} -> 2
    assert(got(1) == 3.0)            // {4,2} -> 3 (interpolated)
    assert(got(2) == 6.0)            // {5,7} -> 6
    assert(got(3).isNaN)             // all NaN
  }

  test("median merge equals single-pass") {
    val agg = new PixelMedianAgg(1, 2)
    val tiles = (0 until 7).map(i => row(i, Array(i.toDouble, (10 - i).toDouble)))
    val direct = agg.finish(tiles.foldLeft(agg.zero)(agg.reduce))
    val (l, r) = tiles.splitAt(3)
    val merged = agg.finish(agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
    assert(direct.sameElements(merged))
    assert(direct(0) == 3.0)
  }

  test("distributed temporal median matches sorted middle") {
    import spark.implicits._
    val tiles = (0 until 5).map(i =>
      Tile(i, 0, "b", i.toLong, 0, 0, 0, 0, 1, 1, Array(i.toDouble * 10)))
    val out = graft.ops.Median.temporal(spark.createDataset(tiles), 1, _ => 0L).collect()
    assert(out.length == 1 && out.head._2.pixels(0) == 20.0)
  }
}
