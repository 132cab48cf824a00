package graft

import graft.core.{AffineTransform, Bounds}
import graft.stac.{StacAsset, StacItem}

/** The README end-to-end query through the public facade (FIXTURES §4):
  * stack -> metadata filter -> band select -> algebra -> monthly median. */
class StackSpec extends SparkSpec {

  private def items: Seq[StacItem] = (0 until 6).map { i =>
    StacItem(s"s$i", Some(f"2024-0${6 + i / 3}%d-${(i % 3) * 9 + 1}%02dT00:00:00Z"),
      epsg = Some(32633),
      assets = Seq("red", "nir").map { b =>
        b -> StacAsset(s"fake://$b/$i",
          bbox = Some(Bounds(0, 0, 640, 640)), shape = Some((64, 64)),
          transform = Some(AffineTransform.northUp(0, 640, 10, 10)))
      }.toMap,
      properties = Map("eo:cloud_cover" -> (i * 15).toString))
  }

  test("readme query: lowcloud ndvi monthly median") {
    val stack = Stack(spark, items, chunk = 64)
    val lowcloud = stack.filterItems(_.properties("eo:cloud_cover").toDouble < 40)
    val ndvi = lowcloud.algebra("ndvi", "nir", "red")((n, r) => (n - r) / (n + r))
    val monthly = ndvi.temporalMedian { micros =>
      java.time.Instant.ofEpochSecond(micros / 1000000L)
        .atZone(java.time.ZoneOffset.UTC).withDayOfMonth(1)
        .toLocalDate.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.getEpochSecond * 1000000L
    }.collect()
    // items 0,1,2 (cloud 0,15,30) are June; 3+ filtered (45,60,75)
    assert(monthly.length == 1)
    val (_, ct) = monthly.head
    assert(ct.band == "ndvi")
    assert(ct.pixels.forall(v => v >= -1.0 && v <= 1.0))
    // spot-check one pixel against driver-computed median of 3 NDVI values
    val vals = (0 until 3).map { i =>
      val n = graft.scan.FakeReader(s"fake://nir/$i").read(graft.core.Window(0, 0, 1, 1))(0)
      val r = graft.scan.FakeReader(s"fake://red/$i").read(graft.core.Window(0, 0, 1, 1))(0)
      (n - r) / (n + r)
    }.sorted
    assert(math.abs(ct.pixels(0) - vals(1)) < 1e-12)
  }

  test("chunked entry point resolves the chunk-spec grammar") {
    import graft.scan.ChunksParam
    val stack = Stack.chunked(spark, items, ChunksParam.parse("auto"))
    // tiny grid: auto caps at the dimensions -> one chunk, same pixels
    val viaInt = Stack(spark, items, chunk = 64)
    assert(stack.tiles.count() > 0)
    assert(stack.toPixels.count() == viaInt.toPixels.count())
  }

  test("time slicing and band selection compose") {
    val stack = Stack(spark, items, chunk = 64)
    val sliced = stack.sliceTime("2024-06-01T00:00:00Z", "2024-07-01T00:00:00Z")
      .selectBands("red")
    val tiles = sliced.tiles.collect()
    assert(tiles.nonEmpty && tiles.forall(_.band == "red"))
    assert(tiles.map(_.itemIdx).distinct.sorted.sameElements(Array(0, 1, 2)))
  }
}
