package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{AffineTransform, Bounds}
import graft.stac._

/** R5 parity: planning is metadata-only and stays fast regardless of the
  * logical array size (the reference plans a ~122 GiB logical array in
  * 117 ms, `docs/basic.ipynb` cell 7). Here: 2,000 items × 10 bands =
  * 20,000 assets (~5 TB logical at 10980² px/asset) must plan well under
  * a second — and the tile work-list for a full-resolution grid stays
  * proportional to overlapping chunks only. */
class PlanningPerfSpec extends AnyFunSuite {

  test("20k-asset plan is metadata-only and sub-second") {
    val items = (0 until 2000).map { i =>
      val off = (i % 40) * 2560.0
      StacItem(f"scene-$i%04d", Some(f"2024-${i % 12 + 1}%02d-${i % 28 + 1}%02dT00:00:00Z"),
        epsg = Some(32633),
        assets = (0 until 10).map { b =>
          s"band$b" -> StacAsset(s"fake://$b/$i",
            bbox = Some(Bounds(399960 + off, 4990200 - off, 399960 + off + 10240, 4990200 - off + 10240)),
            shape = Some((1024, 1024)),
            transform = Some(AffineTransform.northUp(399960 + off, 4990200 - off + 10240, 10, 10)))
        }.toMap)
    }
    val t0 = System.nanoTime()
    val r = Prepare(items)
    val planMs = (System.nanoTime() - t0) / 1e6
    assert(r.assetTable.size == 2000 * 10)
    assert(planMs < 1000.0, s"plan took $planMs ms")

    // logical grid is ~11k x 11k px; chunk work-list stays metadata-sized
    val t1 = System.nanoTime()
    val grid = graft.scan.TileScan.chunkGrid(r.spec, 1024)
    val gridMs = (System.nanoTime() - t1) / 1e6
    assert(grid.nonEmpty && gridMs < 200.0, s"grid took $gridMs ms for ${grid.size} chunks")
  }
}
