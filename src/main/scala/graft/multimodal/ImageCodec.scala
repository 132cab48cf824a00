package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image encode/decode for the multimodal queries (SURVEY §2.11,
  * reference `show.py:915-967` — PIL PNG round-trip is the analog), using
  * only the JDK's ImageIO so no new dependency enters the build.
  *
  * The container ships no image fixtures, so the binary column is
  * *manufactured*: document bytes laid out row-major into an 8-bit
  * grayscale raster, zero-padded to the rectangle (document bytes are
  * ASCII in [32,121], so 0 is a safe out-of-band pad sentinel) and
  * encoded as a genuine PNG. The decode side then runs a real
  * `ImageIO.read` — an actual zlib inflate + PNG defilter — inside the
  * same batch `mapPartitions` shape a production image UDF uses.
  * 8-bit gray PNG raster samples round-trip bit-exactly through
  * ImageIO's PNGImageWriter/Reader (pinned by ImageCodecSpec for all 256
  * sample values), which is what lets the SQL oracle recompute the
  * decoded features from the original text.
  */
object ImageCodec {
  // ImageIO never needs a display for BufferedImage work, but some JDKs
  // probe AWT toolkits lazily; pin headless before the first call.
  System.setProperty("java.awt.headless", "true")

  /** Pixels row-major into a w x h 8-bit gray PNG; pixels.length <= w*h,
    * remainder zero-padded.
    *
    * Hot path for a 100 TB corpus (one encode per blob): the
    * TYPE_BYTE_GRAY backing store is a bare byte[] in exactly our
    * row-major layout, so the raster fills with ONE arraycopy (per-pixel
    * setSample costs ~10x), and the deflate level is dialed to fastest —
    * these blobs are synthetic carriers, not archival artifacts, and the
    * decode side is identical at any level. */
  def encodeGrayPng(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length <= w * h,
      s"bad raster: $w x $h for ${pixels.length} bytes")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val buf = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    System.arraycopy(pixels, 0, buf, 0, pixels.length)
    val bos = new ByteArrayOutputStream(w * h / 2 + 64)
    val writer = ImageIO.getImageWritersByFormatName("png").next()
    val param = writer.getDefaultWriteParam
    if (param.canWriteCompressed) {
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(1.0f) // PNG writer: 1.0 = fastest deflate
    }
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Decode any gray PNG to (width, height, row-major samples 0..255). */
  def decodeGrayPng(png: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(png))
    if (img == null) throw new IllegalArgumentException("undecodable image blob")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](w * h)
    img.getRaster.getDataBuffer match {
      // our own PNGs decode straight to TYPE_BYTE_GRAY — bulk-read the
      // backing array instead of w*h getSample virtual calls
      case b: java.awt.image.DataBufferByte
        if img.getType == BufferedImage.TYPE_BYTE_GRAY =>
        val data = b.getData
        var i = 0
        while (i < out.length) { out(i) = data(i) & 0xff; i += 1 }
      case _ =>
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
    }
    (w, h, out)
  }

  /** 64-bit difference hash (dHash — the classic perceptual fingerprint:
    * Krawetz's "kind of like that" construction) over a decoded gray
    * raster: nearest-neighbor downsample to a 9×8 grid
    * (g(r,c) = px[⌊r·h/8⌋·w + ⌊c·w/9⌋] — integer sampling so any engine
    * replays it exactly), then bit k = r·8+c set iff g(r,c+1) > g(r,c).
    * Packed 32 bits per word ((w0, w1)) — the v15 discipline: a 64-bit
    * pack would need the sign bit and stop being exactly representable
    * in engines whose BIGINT overflow errors rather than wraps.
    * Robust to brightness scaling and small edits; two rasters of the
    * same content differ in few bits (Hamming over the two words). */
  def dHash64(w: Int, h: Int, px: Array[Int]): (Long, Long) = {
    require(w > 0 && h > 0 && px.length == w * h, s"bad raster: $w x $h for ${px.length}")
    var w0 = 0L; var w1 = 0L
    var r = 0
    while (r < 8) {
      val row = (r * h / 8) * w
      var c = 0
      while (c < 8) {
        val a = px(row + c * w / 9)
        val b = px(row + (c + 1) * w / 9)
        if (b > a) {
          val k = r * 8 + c
          if (k < 32) w0 |= 1L << k else w1 |= 1L << (k - 32)
        }
        c += 1
      }
      r += 1
    }
    (w0, w1)
  }
}
