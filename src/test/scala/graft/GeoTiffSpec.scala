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
