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
  *    pixel center is routed through [[Warp.sourceCoords]] — a pure affine
  *    hop when the asset shares the output CRS, and a full
  *    output-CRS -> asset-CRS transform when it doesn't (the reference's
  *    `WarpedVRT` wrap, `rio_reader.py:344-360`) — then sampled
  *    nearest-neighbor from one windowed decode;
  *  - per-task lazy open + dispose; Spark's task isolation replaces the
  *    reference's thread-local dataset dance (`rio_reader.py:124-265`).
  */
final class GeoTiffReader(
    url: String,
    assetTransform: AffineTransform,
    spec: RasterSpec,
    bandIndex: Int = 0,
    nodata: Option[Double] = None,
    assetEpsg: Int = 0,
    method: graft.ops.Resampling = graft.ops.Resampling.Nearest) extends Reader {

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
    val out = Array.fill(window.width * window.height)(Double.NaN)

    // Map every output-pixel center into the source grid (CRS hop included
    // for mixed-CRS assets), then decode exactly the bounding rect of the
    // landed samples — per-pixel min/max, because a cross-CRS footprint is
    // curved and affine corner extrapolation under-covers it. The decode
    // and nodata mapping route through an inner source-grid Reader so
    // nearest/bilinear share [[WarpedGridReader]]'s sampling verbatim.
    val (cols, rows) = Warp.sourceCoords(window, spec, assetTransform.inverse, assetEpsg)
    val need =
      if (method == graft.ops.Resampling.Nearest) Warp.sampleWindow(cols, rows, srcH, srcW)
      else {
        // widen by one pixel for the 2x2 bilinear support
        val w0 = Warp.sampleWindow(cols.map(_ - 0.5), rows.map(_ - 0.5), srcH, srcW)
        if (w0.isEmpty) w0
        else Window(w0.colOff, w0.rowOff,
          math.min(srcW - w0.colOff, w0.width + 1),
          math.min(srcH - w0.rowOff, w0.height + 1))
      }
    if (need.isEmpty) return out

    val param = new ImageReadParam()
    param.setSourceRegion(new java.awt.Rectangle(
      need.colOff, need.rowOff, need.width, need.height))
    val img = r.read(0, param)
    val raster = img.getRaster

    def s(rr: Int, cc: Int): Double =
      if (rr < need.rowOff || rr >= need.rowEnd || cc < need.colOff || cc >= need.colEnd)
        Double.NaN
      else {
        val v = raster.getSampleDouble(cc - need.colOff, rr - need.rowOff, bandIndex)
        if (nodata.contains(v)) Double.NaN else v
      }

    var i = 0
    if (method == graft.ops.Resampling.Nearest) {
      while (i < cols.length) {
        val scc = math.floor(cols(i)).toInt; val srr = math.floor(rows(i)).toInt
        if (scc >= 0 && scc < srcW && srr >= 0 && srr < srcH)
          out(i) = s(srr, scc)
        i += 1
      }
    } else {
      while (i < cols.length) {
        val gr = rows(i) - 0.5; val gc = cols(i) - 0.5
        val r0 = math.floor(gr).toInt; val c0 = math.floor(gc).toInt
        val wr = gr - r0; val wc = gc - c0
        val v00 = s(r0, c0); val v01 = s(r0, c0 + 1)
        val v10 = s(r0 + 1, c0); val v11 = s(r0 + 1, c0 + 1)
        out(i) = v00 * (1 - wr) * (1 - wc) + v01 * (1 - wr) * wc +
          v10 * wr * (1 - wc) + v11 * wr * wc
        i += 1
      }
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

  /** Mixed-CRS factory: each asset's NATIVE georeferencing (url ->
    * (affine, epsg), as the planner collects from `proj:transform` /
    * `proj:epsg` — [[graft.stac.PrepareResult.nativeGrids]]). Same-CRS
    * assets take the pure-affine path; others are warped per pixel
    * (reference `rio_reader.py:344-360`). Falls back to a north-up
    * spec-CRS grid from the asset row when no native grid is known. */
  def warped(spec: RasterSpec, nativeGrids: Map[String, (AffineTransform, Int)],
             nodata: Option[Double] = None): AssetRow => Reader = { a =>
    nativeGrids.get(a.url) match {
      case Some((tf, e)) => new GeoTiffReader(a.url, tf, spec, 0, nodata, assetEpsg = e)
      case None => new GeoTiffReader(a.url,
        AffineTransform.northUp(a.minx, a.maxy, spec.xres, spec.yres), spec, 0, nodata)
    }
  }
}
