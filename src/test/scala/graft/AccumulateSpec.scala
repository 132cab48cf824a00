package graft

import graft.meta.Accumulate
import graft.stac.StacItem

class AccumulateSpec extends SparkSpec {

  private val items = Seq(
    StacItem("a", Some("2024-01-01T00:00:00Z"),
      properties = Map("platform" -> "sat-1", "cloud" -> "10", "orbit" -> "asc")),
    StacItem("b", Some("2024-01-02T00:00:00Z"),
      properties = Map("platform" -> "sat-1", "cloud" -> "40")),
    StacItem("c", Some("2024-01-03T00:00:00Z"),
      properties = Map("platform" -> "sat-1", "cloud" -> "10", "orbit" -> "desc")))

  test("constant fields collapse; varying/missing stay long-form") {
    val (constants, varying) = Accumulate.accumulate(spark, items)
    assert(constants == Map("platform" -> "sat-1"))
    val keys = varying.select("key").distinct().collect().map(_.getString(0)).toSet
    assert(keys == Set("cloud", "orbit")) // cloud varies; orbit missing on b
  }

  test("allsame per band keeps only identical values") {
    import spark.implicits._
    val bandFields = Seq(
      ("red", "wavelength", "665"), ("red", "gsd", "10"),
      ("nir", "wavelength", "842"), ("nir", "gsd", "10"),
      ("red", "wavelength", "665")).toDF("band", "key", "value")
    val out = Accumulate.allSamePerBand(bandFields).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(out(("red", "wavelength")) == "665" && out(("nir", "gsd")) == "10")
  }
}
