package graft

import java.nio.file.Files
import graft.stac.{Prepare, StacJson}

/** S1 ingestion: newline-delimited STAC JSON -> spark.read.json ->
  * canonical items -> planner. Mirrors the input-compat intent of
  * reference `tests/test_stac_types.py` (one canonical schema instead of
  * duck-typing four item flavors). */
class StacJsonSpec extends SparkSpec {

  private val itemJson = (i: Int) => {
    val off = i * 1280
    s"""{"id":"scene-$i","collection":"demo",
        "bbox":[13.0,45.0,13.1,45.1],
        "properties":{"datetime":"2024-06-0${i + 1}T10:00:00Z","proj:epsg":32633,
                      "eo:cloud_cover":${i * 20},
                      "proj:shape":[128,128],
                      "proj:transform":[10.0,0.0,${399960 + off}.0,0.0,-10.0,${4991480 + off}.0]},
        "assets":{"red":{"href":"fake://red/$i","type":"image/tiff; application=geotiff"},
                  "thumb":{"href":"fake://thumb/$i","type":"image/jpeg"}}}"""
      .replaceAll("\n\\s*", "")
  }

  test("json items round-trip through normalize and plan") {
    val f = Files.createTempFile("items", ".ndjson")
    Files.writeString(f, (0 until 3).map(itemJson).mkString("\n"))
    val items = StacJson.read(spark, f.toString)
    assert(items.length == 3)
    val it = items.find(_.id == "scene-0").get
    assert(it.epsg.contains(32633))
    assert(it.datetime.contains("2024-06-01T10:00:00Z"))
    assert(it.shape.contains((128, 128)))
    assert(it.transform.get.a == 10.0 && it.transform.get.e == -10.0)
    assert(it.assets.keySet == Set("red", "thumb"))
    assert(it.properties("eo:cloud_cover") == "0")
    assert(it.bboxLatLon.get.minx == 13.0)

    // mimetype selection drops the thumbnail; plan succeeds end-to-end
    val plan = Prepare(items, graft.stac.PrepareOptions(
      mimetypes = Some(Seq("image/tiff"))))
    assert(plan.assetIds == Seq("red"))
    assert(plan.spec.epsg == 32633)
    assert(plan.assetTable.count(_.url != null) == 3)
  }

  test("missing proj fields fall back to item bbox") {
    val f = Files.createTempFile("items2", ".ndjson")
    Files.writeString(f,
      """{"id":"bare","bbox":[13.0,45.0,13.1,45.1],"properties":{"datetime":"2024-01-01T00:00:00Z"},"assets":{"b":{"href":"fake://b/0"}}}""")
    val items = StacJson.read(spark, f.toString)
    assert(items.head.transform.isEmpty && items.head.epsg.isEmpty)
    // planning in epsg 4326 with explicit resolution uses the latlon bbox
    val plan = Prepare(items, graft.stac.PrepareOptions(
      epsg = Some(4326), resolution = Some((0.001, 0.001))))
    val a = plan.assetTable.head
    assert(math.abs(a.minx - 13.0) < 1e-9 && math.abs(a.maxy - 45.1) < 1e-9)
  }
}
