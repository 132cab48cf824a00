package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.viz.{Png, Xyz}
import graft.core.Bounds

class VizSpec extends AnyFunSuite {

  test("normalize: range, clamp, degenerate") {
    assert(Png.normalize(5, 0, 10) == 0.5)
    assert(Png.normalize(-1, 0, 10) == 0.0)
    assert(Png.normalize(11, 0, 10) == 1.0)
    assert(Png.normalize(3, 4, 4) == 0.0) // degenerate range -> 0
    assert(Png.normalize(Double.NaN, 0, 1).isNaN)
  }

  test("png encode round-trips through ImageIO") {
    val h = 16; val w = 16
    val band = Array.tabulate(h * w)(i => if (i % 7 == 0) Double.NaN else (i % 256) / 255.0)
    val bytes = Png.encode(Seq(band), h, w)
    assert(bytes.take(8).sameElements(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == w && img.getHeight == h)
    // NaN pixel got checkerboard alpha=255 grey
    val nanPx = img.getRGB(0, 0)
    assert((nanPx >>> 24) == 255)
  }

  test("colormaps: endpoints, registry names, reversal, custom anchors") {
    import graft.viz.Colormap
    assert(Colormap.viridis(0.0) == ((255 << 24) | (68 << 16) | (1 << 8) | 84))
    assert(Colormap.viridis(1.0) == ((255 << 24) | (253 << 16) | (231 << 8) | 37))
    assert(Colormap.viridis(Double.NaN) == 0) // transparent
    assert(Colormap.named("magma_r")(0.0) == Colormap.magma(1.0))
    assert(Colormap.named("gray")(1.0) == 0xffffffff)
    intercept[IllegalArgumentException](Colormap.named("nope"))
    val two = Colormap.fromAnchors(Seq((0.0, (10, 20, 30)), (1.0, (10, 20, 30))))
    assert((0 until 256).forall(i => two(i / 255.0) == ((255 << 24) | (10 << 16) | (20 << 8) | 30)))
    // single-band encode honors the cmap
    val bytes = Png.encode(Seq(Array(0.0, 1.0)), 1, 2, checkerboard = false,
      cmap = Colormap.named("gray"))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert((img.getRGB(0, 0) & 0xffffff) == 0 && (img.getRGB(1, 0) & 0xffffff) == 0xffffff)
  }

  test("rgb encode with 3 bands") {
    val h = 4; val w = 4
    val bands = Seq.fill(3)(Array.fill(h * w)(0.5))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.encode(bands, h, w)))
    val px = img.getRGB(1, 1)
    assert(((px >> 16) & 0xff) == 128 && ((px >> 8) & 0xff) == 128)
  }

  test("xyz tile math: world tile 0/0/0 and zoom formula") {
    val b = Xyz.tileBounds3857(0, 0, 0)
    assert(math.abs(b.minx + 20037508.34) < 1 && math.abs(b.maxx - 20037508.34) < 1)
    // tileOf at lon=0,lat=0 zoom 1 -> tile (1,1) (SE quadrant)
    assert(Xyz.tileOf(0.0, -0.0001, 1) == ((1, 1)))
    assert(Xyz.tileOf(-0.0001, 0.0001, 1) == ((0, 0)))
    // 10m data -> zoom where 256px tile ~ 2560m: z = log2(40075016/2560) ~ 13.9 -> 14
    assert(Xyz.naturalZoom(10.0) == 14)
  }

  test("xyz overlap test reprojects array bounds") {
    val utm = Bounds(399960, 4990200, 402520, 4992760) // zone 33N patch (~45N, 13.7E)
    val (tx, ty) = Xyz.tileOf(13.75, 45.05, 10)
    assert(Xyz.overlapsTile(utm, 32633, 10, tx, ty))
    assert(!Xyz.overlapsTile(utm, 32633, 10, tx + 5, ty + 5))
  }
}
