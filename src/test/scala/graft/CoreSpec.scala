package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core._

/** Property-test helper over raw ScalaCheck generators (no scalatestplus
  * bridge in the offline cache). Deterministic seed. */
trait GenChecks {
  def forAllN[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
      i += 1
    }
  }
}

class CoreSpec extends AnyFunSuite with GenChecks {

  test("GDAL shape rounding matches reference formula") {
    // reference raster_spec.py:42-53
    val s = RasterSpec(4326, Bounds(0, 0, 10, 10), 3.0, 3.0)
    assert(s.shape == ((3, 3))) // (10 + 1.5) / 3 = 3.83 -> 3
    val s2 = RasterSpec(4326, Bounds(0, 0, 10.6, 10.6), 3.0, 3.0)
    assert(s2.shape == ((4, 4))) // (10.6 + 1.5) / 3 = 4.03 -> 4
  }

  test("snapped bounds floor/ceil to resolution multiples") {
    val b = Bounds(1.3, -2.7, 9.1, 4.2).snapped(0.5, 0.5)
    assert(b == Bounds(1.0, -3.0, 9.5, 4.5))
  }

  test("union and overlap") {
    val a = Bounds(0, 0, 2, 2); val b = Bounds(1, 1, 3, 3); val c = Bounds(2, 2, 4, 4)
    assert(a.union(b) == Bounds(0, 0, 3, 3))
    assert(a.overlaps(b)); assert(!a.overlaps(c)) // edge touch != overlap
  }

  test("affine inverse round-trips") {
    val gen = for {
      minx <- Gen.choose(-100.0, 100.0); maxy <- Gen.choose(-100.0, 100.0)
      xr <- Gen.choose(0.1, 10.0); yr <- Gen.choose(0.1, 10.0)
    } yield (minx, maxy, xr, yr)
    forAllN(gen) { case (minx, maxy, xr, yr) =>
      val t = AffineTransform.northUp(minx, maxy, xr, yr)
      val (x, y) = t(13.0, 7.0)
      val (c, r) = t.inverse(x, y)
      assert(math.abs(c - 13.0) < 1e-9 && math.abs(r - 7.0) < 1e-9)
    }
  }

  test("window from bounds matches grid math") {
    val spec = RasterSpec(4326, Bounds(0, 0, 8, 8), 1.0, 1.0)
    val w = spec.windowFor(Bounds(2, 3, 5, 6))
    // y axis flips: maxy=6 -> row 2, miny=3 -> row 5
    assert(w == Window(2, 2, 3, 3))
  }

  test("proj: 4326<->3857 round trip") {
    val gen = Gen.zip(Gen.choose(-179.0, 179.0), Gen.choose(-84.0, 84.0))
    forAllN(gen) { case (lon, lat) =>
      val (x, y) = Proj.transform(4326, 3857, lon, lat)
      val (lon2, lat2) = Proj.transform(3857, 4326, x, y)
      assert(math.abs(lon - lon2) < 1e-8 && math.abs(lat - lat2) < 1e-8)
    }
  }

  test("proj: 4326<->UTM round trip, sane magnitudes") {
    val gen = Gen.zip(Gen.choose(12.5, 17.5), Gen.choose(1.0, 70.0)) // zone 33N
    forAllN(gen) { case (lon, lat) =>
      val (e, n) = Proj.transform(4326, 32633, lon, lat)
      assert(e > 100000 && e < 900000 && n > 0)
      val (lon2, lat2) = Proj.transform(32633, 4326, e, n)
      assert(math.abs(lon - lon2) < 1e-7 && math.abs(lat - lat2) < 1e-7)
    }
  }

  test("proj: UTM central meridian maps to false easting") {
    val (e, _) = Proj.transform(4326, 32631, 3.0, 0.0)
    assert(math.abs(e - 500000.0) < 1e-6)
  }

  test("proj: southern hemisphere false northing") {
    val (_, n) = Proj.transform(4326, 32733, 15.0, -30.0)
    assert(n > 6000000 && n < 10000000)
  }

  test("mimetype structured match") {
    import graft.stac.Stac.mimetypeMatches
    assert(mimetypeMatches("image/tiff", "image/tiff; application=geotiff"))
    assert(mimetypeMatches("image/tiff; application=geotiff",
                           "image/tiff; application=geotiff; profile=cloud-optimized"))
    assert(!mimetypeMatches("image/png", "image/tiff"))
    assert(!mimetypeMatches("image/tiff; application=geotiff", "image/tiff"))
  }
}
