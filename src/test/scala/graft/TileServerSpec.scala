package graft

import graft.core.{AffineTransform, Bounds}
import graft.ops.Mosaic
import graft.scan.{Tile, TileScan}
import graft.stac.{Prepare, StacAsset, StacItem}
import graft.viz.{TileServer, Xyz}

/** End-to-end serving test: composite -> HTTP GET /{z}/{x}/{y}.png. */
class TileServerSpec extends SparkSpec {

  test("serves a rendered PNG tile over HTTP with caching") {
    import spark.implicits._
    val items = (0 until 2).map { i =>
      StacItem(s"s$i", Some(f"2024-06-0${i + 1}T00:00:00Z"), epsg = Some(32633),
        assets = Map("gray" -> StacAsset(s"fake://gray/$i",
          bbox = Some(Bounds(399960, 4990200, 402520, 4992760)),
          shape = Some((256, 256)),
          transform = Some(AffineTransform.northUp(399960, 4992760, 10, 10)))))
    }
    val plan = Prepare(items)
    val composite = Mosaic(TileScan.scan(spark, plan.assetTable, plan.spec, 128), 128)
      .map(c => Tile(0, 0, c.band, 0L, c.yChunk, c.xChunk, 0, 0, c.height, c.width, c.pixels))
    val server = new TileServer(composite, plan.spec, 128) // range auto = 2-98 percentile
    val port = server.start()
    try {
      val (cx, cy) = ((399960 + 402520) / 2.0, (4990200 + 4992760) / 2.0)
      val (lon, lat) = graft.core.Proj.transform(32633, 4326, cx, cy)
      val (tx, ty) = Xyz.tileOf(lon, lat, 12)
      def get(path: String): (Int, Array[Byte]) = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code == 200) conn.getInputStream else conn.getErrorStream
        val bytes = is.readAllBytes(); is.close()
        (code, bytes)
      }
      val (code, png) = get(s"/12/$tx/$ty.png")
      assert(code == 200)
      assert(png.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
      // cached second hit returns identical bytes
      val (_, png2) = get(s"/12/$tx/$ty.png")
      assert(png2.sameElements(png))
      // malformed path -> 404
      assert(get("/nonsense")._1 == 404)
    } finally server.stop()
  }
}
