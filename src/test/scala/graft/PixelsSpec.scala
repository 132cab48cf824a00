package graft

import graft.core.{Bounds, RasterSpec}
import graft.ops.Pixels
import graft.scan.Tile

class PixelsSpec extends SparkSpec {
  test("pixel view labels world coordinates at centers and drops NaN") {
    import spark.implicits._
    val spec = RasterSpec(32633, Bounds(100, 200, 140, 240), 10, 10) // 4x4
    val tile = Tile(0, 0, "b", 5L, 0, 0, 1, 2, 1, 2, Array(7.0, Double.NaN))
    val df = Pixels.toPixels(spark.createDataset(Seq(tile)), spec, 4)
    val rows = df.collect()
    assert(rows.length == 1) // NaN dropped
    val r = rows.head
    // pixel (row 1, col 2): x = 100 + 2.5*10 = 125, y = 240 - 1.5*10 = 225
    assert(r.getAs[Double]("x") == 125.0 && r.getAs[Double]("y") == 225.0)
    assert(r.getAs[Double]("value") == 7.0 && r.getAs[String]("band") == "b")
  }
}
