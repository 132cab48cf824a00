package graft.viz

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** PNG tile sink — the reference's render path (`show.py:915-967`):
  * normalize each band to [0,1] over a supplied range, apply a colormap
  * (single band) or RGB compose (2-3 bands), alpha = NaN mask, optional
  * checkerboard under transparency. Pure JVM (java.awt/ImageIO), runs
  * inside executors via a mapPartitions sink. */
object Png {

  /** Normalize to [0,1]; degenerate range maps to 0 (reference
    * `show.py:932-938`). NaN passes through. */
  def normalize(v: Double, vmin: Double, vmax: Double): Double =
    if (v.isNaN) Double.NaN
    else if (vmax == vmin) 0.0
    else {
      val x = (v - vmin) / (vmax - vmin)
      if (x < 0) 0.0 else if (x > 1) 1.0 else x
    }

  /** The default LUT — kept as the historical name; arbitrary maps live in
    * [[Colormap]] (registered standards, `_r` reversal, user anchors/LUTs). */
  lazy val viridis: Array[Int] = Colormap.viridis.lut

  /** Checkerboard pattern value (reference `make_checkerboard`,
    * `show.py:973-978`): 8px squares, light/dark grey. */
  def checker(r: Int, c: Int): Int = {
    val on = ((r / 8) + (c / 8)) % 2 == 0
    val g = if (on) 0xcc else 0x99
    (255 << 24) | (g << 16) | (g << 8) | g
  }

  /** Render 1-3 normalized band planes (row-major h*w, values in [0,1] or
    * NaN) to PNG bytes. Single-band output goes through `cmap`
    * (reference `show.py:940-948`: any registered map, e.g.
    * `Colormap.named("magma_r")`). */
  def encode(bands: Seq[Array[Double]], h: Int, w: Int,
             checkerboard: Boolean = true,
             cmap: Colormap = Colormap.viridis): Array[Byte] = {
    require(bands.nonEmpty && bands.length <= 3, s"1-3 bands, got ${bands.length}")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val i = r * w + c
        val argb =
          if (bands.length == 1) {
            val v = bands.head(i)
            if (v.isNaN) { if (checkerboard) checker(r, c) else 0 }
            else cmap(v)
          } else {
            val vs = bands.map(_(i))
            if (vs.exists(_.isNaN)) { if (checkerboard) checker(r, c) else 0 }
            else {
              def u(x: Double) = math.max(0, math.min(255, (x * 255).round.toInt))
              val rr = u(vs.head)
              val gg = u(vs(1))
              val bb = u(if (vs.length > 2) vs(2) else vs(1))
              (255 << 24) | (rr << 16) | (gg << 8) | bb
            }
          }
        img.setRGB(c, r, argb)
        c += 1
      }
      r += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
