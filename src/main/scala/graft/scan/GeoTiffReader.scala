package graft.scan

import java.io.File
import javax.imageio.{ImageIO, ImageReadParam, ImageReader}
import graft.core.{AffineTransform, RasterSpec, Window}

/** Windowed GeoTIFF scan over the JDK's ImageIO TIFF plugin — the engine's
  * counterpart of `AutoParallelRioReader` (`stackstac/rio_reader.py:287-429`)
  * for real files, with the GDAL/VRT machinery replaced by:
  *
  *  - georeferencing from the asset table (STAC `proj:transform`), not
  *    file tags — the planner already resolved it (`prepare.py:146-149`);
  *  - windowed decodes via `ImageReadParam.setSourceRegion` (the TIFF
  *    plugin reads only the strips/tiles intersecting the region — the
  *    same IO win COG windowed reads give rasterio);
  *  - grid mapping: requested windows are in the OUTPUT grid; each output
  *    pixel center is affine-mapped into the source grid and sampled
  *    nearest-neighbor (a "VRT-lite" for same-CRS, scaled/offset grids —
  *    cross-CRS warping is the [[graft.ops.Reproject]] operator's job,
  *    keeping the scan simple and the warp distributed);
  *  - per-task lazy open + dispose; Spark's task isolation replaces the
  *    reference's thread-local dataset dance (`rio_reader.py:124-265`).
  */
final class GeoTiffReader(
    url: String,
    assetTransform: AffineTransform,
    spec: RasterSpec,
    bandIndex: Int = 0,
    nodata: Option[Double] = None) extends Reader {

  @transient private var reader: ImageReader = _
  @transient private var stream: javax.imageio.stream.ImageInputStream = _

  private def open(): ImageReader = {
    if (reader == null) {
      val path = if (url.startsWith("file:")) new File(new java.net.URI(url)) else new File(url)
      stream = ImageIO.createImageInputStream(path)
      require(stream != null, s"cannot open $url")
      val it = ImageIO.getImageReaders(stream)
      require(it.hasNext, s"no TIFF reader for $url")
      reader = it.next()
      reader.setInput(stream, true, true)
    }
    reader
  }

  override def read(window: Window): Array[Double] = {
    val r = open()
    val srcW = r.getWidth(0); val srcH = r.getHeight(0)
    val srcInv = assetTransform.inverse
    val out = Array.fill(window.width * window.height)(Double.NaN)

    // source rect needed for this output window (affine corners + margin)
    val corners = for {
      (c, rr) <- Seq((window.colOff, window.rowOff), (window.colEnd, window.rowOff),
                     (window.colOff, window.rowEnd), (window.colEnd, window.rowEnd))
    } yield {
      val (x, y) = spec.transform(c.toDouble, rr.toDouble)
      srcInv(x, y)
    }
    val sc0 = math.max(0, math.floor(corners.map(_._1).min).toInt - 1)
    val sr0 = math.max(0, math.floor(corners.map(_._2).min).toInt - 1)
    val sc1 = math.min(srcW, math.ceil(corners.map(_._1).max).toInt + 1)
    val sr1 = math.min(srcH, math.ceil(corners.map(_._2).max).toInt + 1)
    if (sc1 <= sc0 || sr1 <= sr0) return out

    val param = new ImageReadParam()
    param.setSourceRegion(new java.awt.Rectangle(sc0, sr0, sc1 - sc0, sr1 - sr0))
    val img = r.read(0, param)
    val raster = img.getRaster

    var orow = 0
    while (orow < window.height) {
      var ocol = 0
      while (ocol < window.width) {
        val (wx, wy) = spec.transform(window.colOff + ocol + 0.5, window.rowOff + orow + 0.5)
        val (fc, fr) = srcInv(wx, wy)
        val scc = math.floor(fc).toInt; val srr = math.floor(fr).toInt
        if (scc >= sc0 && scc < sc1 && srr >= sr0 && srr < sr1) {
          val v = raster.getSampleDouble(scc - sc0, srr - sr0, bandIndex)
          out(orow * window.width + ocol) =
            if (nodata.contains(v)) Double.NaN else v
        }
        ocol += 1
      }
      orow += 1
    }
    out
  }

  override def close(): Unit = {
    if (reader != null) { reader.dispose(); reader = null }
    if (stream != null) { stream.close(); stream = null }
  }
}

object GeoTiffReader {
  /** readerFor factory for [[TileScan.scan]]: asset rows whose bounds are
    * north-up on the output CRS (the planner guarantees rectilinearity). */
  def factory(spec: RasterSpec, srcRes: Map[String, (Double, Double)] = Map.empty,
              nodata: Option[Double] = None): AssetRow => Reader = { a =>
    val (xres, yres) = srcRes.getOrElse(a.url, (spec.xres, spec.yres))
    new GeoTiffReader(a.url,
      AffineTransform.northUp(a.minx, a.maxy, xres, yres), spec, 0, nodata)
  }
}
