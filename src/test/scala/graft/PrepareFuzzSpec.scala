package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.core.{AffineTransform, Bounds}
import graft.stac._

/** Planner fuzz — the FIXTURES §1 variant matrix (asset-level proj:*
  * overriding item-level, missing proj:* falling back to item bbox,
  * missing assets, missing datetime, duplicate datetimes): for any such
  * item soup, Prepare either raises a clean IllegalArgumentException or
  * yields a consistent plan. */
class PrepareFuzzSpec extends AnyFunSuite with GenChecks {

  private val genAsset: Gen[StacAsset] = for {
    hasBbox <- Gen.prob(0.8)
    hasShape <- Gen.prob(0.8)
    hasTransform <- Gen.prob(0.8)
    hasEpsg <- Gen.prob(0.7)
    x0 <- Gen.choose(0, 50); y0 <- Gen.choose(0, 50)
    w <- Gen.choose(1, 40); h <- Gen.choose(1, 40)
    res <- Gen.oneOf(1.0, 2.0, 5.0)
  } yield StacAsset(
    href = s"fake://a/$x0/$y0",
    epsg = if (hasEpsg) Some(32633) else None,
    bbox = if (hasBbox) Some(Bounds(x0, y0, x0 + w, y0 + h)) else None,
    shape = if (hasShape) Some(((h / res).toInt max 1, (w / res).toInt max 1)) else None,
    transform = if (hasTransform) Some(AffineTransform.northUp(x0, y0 + h, res, res)) else None)

  private val genItem: Gen[StacItem] = for {
    id <- Gen.identifier.map(_.take(8))
    hasDt <- Gen.prob(0.85)
    day <- Gen.choose(1, 28)
    hasItemEpsg <- Gen.prob(0.5)
    hasItemBbox <- Gen.prob(0.5)
    nAssets <- Gen.choose(0, 3)
    assets <- Gen.listOfN(nAssets, genAsset)
  } yield StacItem(
    id = id,
    datetime = if (hasDt) Some(f"2024-03-$day%02dT00:00:00Z") else None,
    bboxLatLon = if (hasItemBbox) Some(Bounds(13.0, 45.0, 13.5, 45.4)) else None,
    epsg = if (hasItemEpsg) Some(32633) else None,
    assets = assets.zipWithIndex.map { case (a, i) => s"b$i" -> a }.toMap)

  test("prepare on arbitrary item soups: clean error or consistent plan") {
    forAllN(Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, genItem)), n = 200) { items =>
      try {
        val r = Prepare(items, PrepareOptions(epsg = Some(32633),
          resolution = Some((1.0, 1.0))))
        // invariants: table covers items x bands grid exactly
        assert(r.assetTable.size == r.items.size * r.assetIds.size)
        // every live asset has in-range indices + bounds
        r.assetTable.foreach { a =>
          assert(a.itemIdx >= 0 && a.itemIdx < r.items.size)
          assert(a.assetIdx >= 0 && a.assetIdx < r.assetIds.size)
        }
        // no fully-dead rows/cols (P5)
        val live = r.assetTable.filter(_.url != null)
        assert(live.map(_.itemIdx).distinct.size == r.items.size)
        assert(live.map(_.band).distinct.size == r.assetIds.size)
        // spec is valid
        assert(r.spec.bounds.minx < r.spec.bounds.maxx)
        assert(r.spec.height > 0 && r.spec.width > 0)
        // duplicate datetimes must not collapse items (stack.py:272-274)
        assert(r.items.map(_.id).distinct.size == r.items.size)
      } catch {
        case e: IllegalArgumentException => assert(e.getMessage != null)
      }
    }
  }

  test("sort is stable for duplicate datetimes, missing sorts first") {
    val items = Seq(
      StacItem("z", Some("2024-01-02T00:00:00Z")),
      StacItem("a", None),
      StacItem("m", Some("2024-01-02T00:00:00Z")),
      StacItem("b", Some("2024-01-01T00:00:00Z")))
    val sorted = Stac.sortByDate(items)
    assert(sorted.map(_.id) == Seq("a", "b", "z", "m")) // "" first; stable z,m
    assert(Stac.sortByDate(items, descending = true).map(_.id) == Seq("z", "m", "b", "a"))
  }
}
