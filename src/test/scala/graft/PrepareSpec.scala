package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{AffineTransform, Bounds}
import graft.stac._

class PrepareSpec extends AnyFunSuite {

  private def item(id: String, dt: String, epsg: Int, b: Bounds,
                   bands: Map[String, StacAsset]) =
    StacItem(id, Some(dt), bboxLatLon = None, epsg = Some(epsg), assets = bands)

  private def asset(minx: Double, miny: Double, maxx: Double, maxy: Double,
                    res: Double = 1.0): StacAsset =
    StacAsset(s"fake://${minx}_$miny", mimetype = Some("image/tiff; application=geotiff"),
      bbox = Some(Bounds(minx, miny, maxx, maxy)),
      shape = Some((((maxy - miny) / res).toInt, ((maxx - minx) / res).toInt)),
      transform = Some(AffineTransform.northUp(minx, maxy, res, res)))

  test("same-CRS plan: union bounds, min resolution, sorted items") {
    val items = Seq(
      item("b", "2024-02-01T00:00:00Z", 32633, Bounds(0, 0, 10, 10),
        Map("red" -> asset(0, 0, 10, 10, res = 2.0))),
      item("a", "2024-01-01T00:00:00Z", 32633, Bounds(5, 5, 20, 15),
        Map("red" -> asset(5, 5, 20, 15, res = 1.0))))
    val r = Prepare(items)
    assert(r.items.map(_.id) == Seq("a", "b")) // sorted by datetime
    assert(r.spec.epsg == 32633)
    assert(r.spec.bounds == Bounds(0, 0, 20, 15)) // union, already snapped
    assert(r.spec.xres == 1.0 && r.spec.yres == 1.0) // min res
    assert(r.assetTable.count(_.url != null) == 2)
    // item_idx follows sorted order: item "a" -> 0
    val a0 = r.assetTable.find(_.itemIdx == 0).get
    assert(a0.minx == 5 && a0.maxx == 20)
  }

  test("requested bounds prune non-overlapping assets; missing assets null") {
    val items = Seq(
      item("a", "2024-01-01T00:00:00Z", 32633, Bounds(0, 0, 10, 10),
        Map("red" -> asset(0, 0, 10, 10), "nir" -> asset(0, 0, 10, 10))),
      item("b", "2024-01-02T00:00:00Z", 32633, Bounds(0, 0, 10, 10),
        Map("red" -> asset(100, 100, 110, 110)))) // outside + missing nir
    val r = Prepare(items, PrepareOptions(
      assets = Some(Seq("red", "nir")), bounds = Some(Bounds(0, 0, 10, 10))))
    // item b contributes nothing -> dropped entirely (P5)
    assert(r.items.map(_.id) == Seq("a"))
    assert(r.assetTable.count(_.url != null) == 2)
    assert(r.spec.bounds == Bounds(0, 0, 10, 10))
  }

  test("mixed CRS without epsg= fails; with epsg= reprojects bounds") {
    val items = Seq(
      item("a", "2024-01-01T00:00:00Z", 32633, Bounds(0, 0, 10, 10),
        Map("red" -> asset(500000, 0, 500010, 10))),
      item("b", "2024-01-02T00:00:00Z", 32634, Bounds(0, 0, 10, 10),
        Map("red" -> asset(500000, 0, 500010, 10))))
    intercept[IllegalArgumentException] { Prepare(items) }
    val r = Prepare(items, PrepareOptions(epsg = Some(4326),
      resolution = Some((1e-4, 1e-4))))
    assert(r.spec.epsg == 4326)
    assert(r.assetTable.count(_.url != null) == 2)
    // zone 33 central meridian is 15E; easting 500000 ~ lon 15
    val a0 = r.assetTable.find(_.itemIdx == 0).get
    assert(math.abs(a0.minx - 15.0) < 0.1)
  }

  test("mimetype selection keeps only matching asset ids") {
    val tiff = asset(0, 0, 10, 10)
    val jpg  = tiff.copy(mimetype = Some("image/jpeg"))
    val items = Seq(item("a", "2024-01-01T00:00:00Z", 32633, Bounds(0, 0, 10, 10),
      Map("data" -> tiff, "thumb" -> jpg)))
    val r = Prepare(items, PrepareOptions(mimetypes = Some(Seq("image/tiff"))))
    assert(r.assetIds == Seq("data"))
  }

  test("snapping only applies to auto-computed bounds") {
    val items = Seq(item("a", "2024-01-01T00:00:00Z", 32633, Bounds(0, 0, 10, 10),
      Map("red" -> asset(0.3, 0.3, 9.7, 9.7, res = 1.0))))
    val auto = Prepare(items)
    assert(auto.spec.bounds == Bounds(0, 0, 10, 10)) // snapped outward
    val explicit = Prepare(items, PrepareOptions(bounds = Some(Bounds(0.25, 0.25, 9.75, 9.75))))
    assert(explicit.spec.bounds == Bounds(0.25, 0.25, 9.75, 9.75))
  }

  test("bounds_latlon reprojects into the output CRS and prunes") {
    // zone 33N: lon 14.9-15.1, lat 44.9-45.1 around the central meridian
    val items = Seq(item("a", "2024-01-01T00:00:00Z", 32633, Bounds(0, 0, 1, 1),
      Map("red" -> asset(480000, 4960000, 520000, 5010000, res = 10.0))))
    val r = Prepare(items, PrepareOptions(
      boundsLatLon = Some(Bounds(14.9, 44.9, 15.1, 45.1))))
    assert(r.spec.epsg == 32633)
    // 15E is the central meridian -> easting ~500000 inside the bounds
    assert(r.spec.bounds.minx > 470000 && r.spec.bounds.maxx < 530000)
    assert(r.assetTable.count(_.url != null) == 1)
    // far-away latlon window prunes everything
    intercept[IllegalArgumentException] {
      Prepare(items, PrepareOptions(boundsLatLon = Some(Bounds(0.0, 0.0, 0.2, 0.2))))
    }
  }
}
