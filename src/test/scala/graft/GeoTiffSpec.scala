package graft

import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO
import graft.core.{AffineTransform, Bounds, RasterSpec, Window}
import graft.scan.{AssetRow, GeoTiffReader, TileScan}

/** Real-file scan path: write TIFFs with ImageIO, read windows back
  * through the engine, compare against the known pixel function. */
class GeoTiffSpec extends SparkSpec {

  /** value(row, col) = row * 300 + col (fits 16-bit for our sizes). */
  private def writeTiff(path: File, h: Int, w: Int): Unit = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
    val raster = img.getRaster
    for (r <- 0 until h; c <- 0 until w) raster.setSample(c, r, 0, r * 300 + c)
    ImageIO.write(img, "tiff", path)
  }

  test("windowed read on an aligned grid returns exact pixels") {
    val f = File.createTempFile("graft", ".tif"); f.deleteOnExit()
    writeTiff(f, 64, 64)
    val spec = RasterSpec(32633, Bounds(0, 0, 640, 640), 10, 10) // 64x64, aligned
    val reader = new GeoTiffReader(f.getAbsolutePath,
      AffineTransform.northUp(0, 640, 10, 10), spec)
    val px = reader.read(Window(3, 5, 4, 2))
    for (r <- 0 until 2; c <- 0 until 4)
      assert(px(r * 4 + c) == ((5 + r) * 300 + 3 + c).toDouble)
    reader.close()
  }

  test("scaled grid samples nearest source pixel") {
    val f = File.createTempFile("graft", ".tif"); f.deleteOnExit()
    writeTiff(f, 64, 64)
    // source res 10, output res 20 -> output pixel (r,c) center falls on
    // source pixel (2r+1, 2c+1)
    val spec = RasterSpec(32633, Bounds(0, 0, 640, 640), 20, 20) // 32x32 output
    val reader = new GeoTiffReader(f.getAbsolutePath,
      AffineTransform.northUp(0, 640, 10, 10), spec)
    val px = reader.read(Window(0, 0, 32, 32))
    for (r <- 0 until 32; c <- 0 until 32)
      assert(px(r * 32 + c) == ((2 * r + 1) * 300 + 2 * c + 1).toDouble, s"($r,$c)")
    reader.close()
  }

  test("bilinear on a 2x-scaled grid averages each 2x2 block") {
    val f = File.createTempFile("graft", ".tif"); f.deleteOnExit()
    writeTiff(f, 64, 64)
    // output centers land on source fractional (2r+1, 2c+1): gc = 2c+0.5,
    // weights exactly 0.5 -> the mean of the 2x2 block
    val spec = RasterSpec(32633, Bounds(0, 0, 640, 640), 20, 20) // 32x32
    val reader = new GeoTiffReader(f.getAbsolutePath,
      AffineTransform.northUp(0, 640, 10, 10), spec,
      method = graft.ops.Resampling.Bilinear)
    val px = reader.read(Window(0, 0, 32, 32))
    for (r <- 0 until 32; c <- 0 until 32) {
      val want = ((2 * r) * 300 + 2 * c + (2 * r) * 300 + 2 * c + 1 +
        (2 * r + 1) * 300 + 2 * c + (2 * r + 1) * 300 + 2 * c + 1) / 4.0
      assert(px(r * 32 + c) == want, s"($r,$c)")
    }
    reader.close()
  }

  test("nodata values become NaN") {
    val f = File.createTempFile("graft", ".tif"); f.deleteOnExit()
    writeTiff(f, 8, 8)
    val spec = RasterSpec(32633, Bounds(0, 0, 80, 80), 10, 10)
    val reader = new GeoTiffReader(f.getAbsolutePath,
      AffineTransform.northUp(0, 80, 10, 10), spec, nodata = Some(0.0))
    val px = reader.read(Window(0, 0, 8, 8))
    assert(px(0).isNaN) // value at (0,0) is 0 -> nodata
    assert(px(1) == 1.0)
    reader.close()
  }

  test("reader is image-format-agnostic: PNG assets scan identically") {
    // GeoTiffReader resolves a decoder via ImageIO.getImageReaders, so any
    // registered format works — georeferencing comes from the asset table
    // (STAC proj:*), not file tags, exactly like the TIFF path.
    val f = File.createTempFile("graft", ".png"); f.deleteOnExit()
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_USHORT_GRAY)
    for (r <- 0 until 32; c <- 0 until 32) img.getRaster.setSample(c, r, 0, r * 300 + c)
    ImageIO.write(img, "png", f)
    val spec = RasterSpec(32633, Bounds(0, 0, 320, 320), 10, 10)
    val reader = new GeoTiffReader(f.getAbsolutePath,
      AffineTransform.northUp(0, 320, 10, 10), spec)
    val px = reader.read(Window(0, 0, 32, 32))
    for (r <- 0 until 32; c <- 0 until 32)
      assert(px(r * 32 + c) == (r * 300 + c).toDouble, s"($r,$c)")
    reader.close()
  }

  test("cross-CRS read: 4326-native TIFF sampled onto a 3857 spec") {
    val f = File.createTempFile("graft", ".tif"); f.deleteOnExit()
    writeTiff(f, 64, 64) // native grid: lon/lat, 0.0002 deg
    val srcTf = AffineTransform.northUp(12.076, 46.857, 0.0002, 0.0002)
    val spec = RasterSpec(3857, Bounds(1344400.0, 5917200.0, 1345400.0, 5918200.0), 10.0, 10.0)
    val reader = new GeoTiffReader(f.getAbsolutePath, srcTf, spec, assetEpsg = 4326)
    val px = reader.read(Window(0, 0, 100, 100))
    val inv = srcTf.inverse
    var valid = 0
    for (row <- 0 until 100; col <- 0 until 100) {
      val (wx, wy) = spec.transform(col + 0.5, row + 0.5)
      val (lon, lat) = graft.core.Proj.transform(3857, 4326, wx, wy)
      val (fc, fr) = inv(lon, lat)
      val (cc, rr) = (math.floor(fc).toInt, math.floor(fr).toInt)
      val want = if (cc >= 0 && cc < 64 && rr >= 0 && rr < 64)
        (rr * 300 + cc).toDouble else Double.NaN
      val got = px(row * 100 + col)
      assert(got == want || (got.isNaN && want.isNaN), s"($row,$col)")
      if (!want.isNaN) valid += 1
    }
    assert(valid > 5000, s"fixture should mostly cover the spec, valid=$valid")
    reader.close()
  }

  test("end-to-end: Stack.geotiff stacks a 3857 and a 4326 item onto one grid") {
    import graft.stac.{PrepareOptions, StacAsset, StacItem}
    val dirF = java.nio.file.Files.createTempDirectory("graft_mixed").toFile
    val f0 = new File(dirF, "utm.tif"); writeTiff(f0, 64, 64)
    val f1 = new File(dirF, "ll.tif");  writeTiff(f1, 64, 64)
    val tf0 = AffineTransform.northUp(1344300.0, 5918300.0, 20.0, 20.0) // 3857-native, 64x64 @20m
    val tf1 = AffineTransform.northUp(12.076, 46.857, 0.0002, 0.0002)   // 4326-native
    val items = Seq(
      StacItem("m0", Some("2024-06-01T00:00:00Z"), epsg = Some(3857),
        assets = Map("gray" -> StacAsset(f0.getAbsolutePath,
          shape = Some((64, 64)), transform = Some(tf0)))),
      StacItem("m1", Some("2024-06-02T00:00:00Z"), epsg = Some(4326),
        assets = Map("gray" -> StacAsset(f1.getAbsolutePath,
          shape = Some((64, 64)), transform = Some(tf1)))))
    val stack = Stack.geotiff(spark, items,
      PrepareOptions(epsg = Some(3857),
        bounds = Some(Bounds(1344400.0, 5917200.0, 1345400.0, 5918200.0)),
        resolution = Some((10.0, 10.0))),
      chunk = 50)
    val tiles = stack.tiles.collect()
    assert(tiles.map(_.itemIdx).distinct.sorted.toSeq == Seq(0, 1))
    val byItem = Map(0 -> (tf0, 3857, 20.0), 1 -> (tf1, 4326, 0.0002))
    tiles.foreach { t =>
      val (tf, epsg, _) = byItem(t.itemIdx)
      val inv = tf.inverse
      for (r <- 0 until t.height; c <- 0 until t.width) {
        val grow = t.yChunk * 50 + t.rowOff + r
        val gcol = t.xChunk * 50 + t.colOff + c
        val (wx, wy) = stack.spec.transform(gcol + 0.5, grow + 0.5)
        val (sx, sy) = graft.core.Proj.transform(3857, epsg, wx, wy)
        val (fc, fr) = inv(sx, sy)
        val (cc, rr) = (math.floor(fc).toInt, math.floor(fr).toInt)
        val want = if (cc >= 0 && cc < 64 && rr >= 0 && rr < 64)
          (rr * 300 + cc).toDouble else Double.NaN
        val got = t.pixels(r * t.width + c)
        assert(got == want || (got.isNaN && want.isNaN),
          s"item ${t.itemIdx} ($grow,$gcol)")
      }
    }
  }

  test("two UTM zones (32633+32634) stack onto one grid across the seam") {
    import graft.core.Proj
    import graft.stac.{PrepareOptions, StacAsset, StacItem}
    // the reference's everyday input: a collection straddling a UTM zone
    // boundary (18°E). Each item is native to its own zone; the output
    // grid is zone 33 and spans the seam.
    val dirF = java.nio.file.Files.createTempDirectory("graft_utm").toFile
    val f33 = new File(dirF, "z33.tif"); writeTiff(f33, 64, 64)
    val f34 = new File(dirF, "z34.tif"); writeTiff(f34, 64, 64)
    // native grids from a lat/lon anchor so the fixture stays plausible:
    // both tiles cover ~17.95..18.05°E, 46.95..47.05°N in their own zone
    def northUpFor(epsg: Int): AffineTransform = {
      val (e, n) = Proj.transform(4326, epsg, 17.95, 47.05)
      AffineTransform.northUp(math.floor(e), math.ceil(n), 120, 120) // 64px ~ 7.7 km
    }
    val tf33 = northUpFor(32633); val tf34 = northUpFor(32634)
    val items = Seq(
      StacItem("z33", Some("2024-06-01T00:00:00Z"), epsg = Some(32633),
        assets = Map("gray" -> StacAsset(f33.getAbsolutePath,
          shape = Some((64, 64)), transform = Some(tf33)))),
      StacItem("z34", Some("2024-06-02T00:00:00Z"), epsg = Some(32634),
        assets = Map("gray" -> StacAsset(f34.getAbsolutePath,
          shape = Some((64, 64)), transform = Some(tf34)))))
    // output spec: zone 33, covering the shared lat/lon box
    val (e0, n0) = Proj.transform(4326, 32633, 17.96, 46.96)
    val (e1, n1) = Proj.transform(4326, 32633, 18.04, 47.04)
    val stack = Stack.geotiff(spark, items,
      PrepareOptions(epsg = Some(32633),
        bounds = Some(Bounds(math.ceil(e0), math.ceil(n0), math.floor(e1), math.floor(n1))),
        resolution = Some((100.0, 100.0))),
      chunk = 64)
    val tiles = stack.tiles.collect()
    assert(tiles.map(_.itemIdx).distinct.sorted.toSeq == Seq(0, 1),
      "both zones' items must contribute tiles")
    val byItem = Map(0 -> (tf33, 32633), 1 -> (tf34, 32634))
    var checked = 0
    tiles.foreach { t =>
      val (tf, epsg) = byItem(t.itemIdx)
      val inv = tf.inverse
      for (r <- 0 until t.height; c <- 0 until t.width) {
        val grow = t.yChunk * 64 + t.rowOff + r
        val gcol = t.xChunk * 64 + t.colOff + c
        val (wx, wy) = stack.spec.transform(gcol + 0.5, grow + 0.5)
        val (sx, sy) = Proj.transform(32633, epsg, wx, wy)
        val (fc, fr) = inv(sx, sy)
        val (cc, rr) = (math.floor(fc).toInt, math.floor(fr).toInt)
        val want = if (cc >= 0 && cc < 64 && rr >= 0 && rr < 64)
          (rr * 300 + cc).toDouble else Double.NaN
        val got = t.pixels(r * t.width + c)
        assert(got == want || (got.isNaN && want.isNaN),
          s"item ${t.itemIdx} ($grow,$gcol)")
        if (!want.isNaN) checked += 1
      }
    }
    assert(checked > 100, s"expected substantive cross-zone coverage, got $checked")
  }

  test("end-to-end: TileScan over real TIFF files") {
    val dirF = java.nio.file.Files.createTempDirectory("graft_tiff").toFile
    val files = (0 until 3).map { i =>
      val f = new File(dirF, s"scene$i.tif"); writeTiff(f, 64, 64); f
    }
    val spec = RasterSpec(32633, Bounds(0, 0, 640, 640), 10, 10)
    val assets = files.zipWithIndex.map { case (f, i) =>
      AssetRow(i, 0, "gray", i.toLong * 1000000L, f.getAbsolutePath,
               0, 0, 640, 640, 1.0, 0.0)
    }
    val tiles = TileScan.scan(spark, assets, spec, chunk = 32,
      readerFor = GeoTiffReader.factory(spec)).collect()
    assert(tiles.length == 3 * 4) // 3 items x (2x2 chunks)
    tiles.foreach { t =>
      for (r <- 0 until t.height; c <- 0 until t.width) {
        val gr = t.yChunk * 32 + t.rowOff + r
        val gc = t.xChunk * 32 + t.colOff + c
        assert(t.pixels(r * t.width + c) == (gr * 300 + gc).toDouble)
      }
    }
  }
}
