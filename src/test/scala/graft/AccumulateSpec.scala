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

  // ---- typed/nested accumulation (reference accumulate_metadata.py:134-230)

  import graft.meta.{MArr, MBool, MetaValue, MNull, MNum, MObj, MStr}
  import graft.meta.Accumulate.{Coord0D, Coord1D, CoordSet}

  test("MetaValue parses nested JSON and falls back to bare scalars") {
    assert(MetaValue.parse("""[{"name":"B04","w":0.665},[1,2]]""") ==
      MArr(Vector(MObj(Vector("name" -> MStr("B04"), "w" -> MNum(0.665))),
                  MArr(Vector(MNum(1), MNum(2))))))
    assert(MetaValue.parse("12.5") == MNum(12.5))
    assert(MetaValue.parse("sat-1") == MStr("sat-1")) // not JSON -> bare string
    assert(MetaValue.parse("true") == MBool(true))
    val v = MetaValue.parse("""{"a":[[3]],"b":"x\ny"}""")
    assert(MetaValue.parse(v.render) == v) // render/parse round-trip
  }

  test("constant singleton lists squeeze to 0-D (instruments = [['OLI']])") {
    val props = Seq.fill(3)(Map("instr" -> MetaValue.parse("""[["OLI"]]""")))
    assert(graft.meta.Accumulate.typedCoords(props) ==
      Map("instr" -> Coord0D(MStr("OLI"))))
  }

  test("constant multi-element scalar list setifies; list-of-lists drops") {
    val props = Seq.fill(2)(Map(
      "instruments" -> MetaValue.parse("""["OLI","TIRS","OLI"]"""),
      "nested"      -> MetaValue.parse("""[[1,2],[3]]""")))
    val out = graft.meta.Accumulate.typedCoords(props)
    assert(out == Map("instruments" -> CoordSet(Vector(MStr("OLI"), MStr("TIRS")))))
    assert(!out.contains("nested")) // unhashable elements -> dropped
  }

  test("varying scalars become a 1-D per-item coord with nulls for misses") {
    val props = Seq(
      Map("cloud" -> MNum(10)), Map[String, MetaValue](), Map("cloud" -> MNum(40)))
    assert(graft.meta.Accumulate.typedCoords(props) ==
      Map("cloud" -> Coord1D(Vector(MNum(10), MNull, MNum(40)))))
  }

  test("varying uniform list-of-lists drops; ragged and mixed stay 1-D") {
    val uniform = Seq(
      Map("t" -> MetaValue.parse("[1,2,3]")), Map("t" -> MetaValue.parse("[4,5,6]")))
    assert(graft.meta.Accumulate.typedCoords(uniform).isEmpty) // 2-D -> drop

    val ragged = Seq(
      Map("t" -> MetaValue.parse("[1,2]")), Map("t" -> MetaValue.parse("[3]")))
    assert(graft.meta.Accumulate.typedCoords(ragged) == Map("t" ->
      Coord1D(Vector(MArr(Vector(MNum(1), MNum(2))), MArr(Vector(MNum(3)))))))

    val mixed = Seq(Map("t" -> MetaValue.parse("[1,2]")), Map("t" -> MNum(7)))
    assert(graft.meta.Accumulate.typedCoords(mixed) == Map("t" ->
      Coord1D(Vector(MArr(Vector(MNum(1), MNum(2))), MNum(7)))))
  }

  test("varying uniform singleton lists squeeze then stay 1-D (np.squeeze)") {
    val props = Seq(
      Map("u" -> MetaValue.parse("[10]")), Map("u" -> MetaValue.parse("[20]")))
    assert(graft.meta.Accumulate.typedCoords(props) ==
      Map("u" -> Coord1D(Vector(MNum(10), MNum(20)))))
    // ...but a squeezed uniform 2-D block ([[a,b]] per item) still drops
    val deep = Seq(
      Map("u" -> MetaValue.parse("[[1,2]]")), Map("u" -> MetaValue.parse("[[3,4]]")))
    assert(graft.meta.Accumulate.typedCoords(deep).isEmpty)
  }

  test("coordsTable long-form view is queryable") {
    import spark.implicits._
    val typedItems = Seq(
      StacItem("a", Some("2024-01-01T00:00:00Z"), properties = Map(
        "platform" -> "sat-1", "eo:bands" -> """[{"name":"B04"},{"name":"B08"}]""",
        "cloud" -> "10")),
      StacItem("b", Some("2024-01-02T00:00:00Z"), properties = Map(
        "platform" -> "sat-1", "eo:bands" -> """[{"name":"B04"},{"name":"B08"}]""",
        "cloud" -> "40")))
    val df = Accumulate.coordsTable(spark, typedItems)
    val kinds = df.select("key", "kind").as[(String, String)].collect().toSet
    assert(kinds.contains(("platform", "const")))
    assert(kinds.exists(k => k._1 == "cloud" && k._2 == "time"))
    // eo:bands: constant list of OBJECTS -> unhashable -> dropped
    assert(!kinds.exists(_._1 == "eo:bands"))
    val cloud = df.filter($"key" === "cloud").orderBy($"item_idx")
      .select("value_json").as[String].collect().toSeq
    assert(cloud == Seq("10", "40"))
  }

  test("fuzz: typedCoords matches a direct transliteration of the reference") {
    val rnd = new scala.util.Random(42)
    def rndScalar(): MetaValue = rnd.nextInt(3) match {
      case 0 => MNum(rnd.nextInt(4)); case 1 => MStr(("a" + rnd.nextInt(3)))
      case _ => MBool(rnd.nextBoolean())
    }
    def rndVal(depth: Int): MetaValue =
      if (depth >= 2 || rnd.nextInt(3) > 0) rndScalar()
      else MArr(Vector.fill(rnd.nextInt(3) + (if (depth == 0) 0 else 1))(rndVal(depth + 1)))

    // reference algorithm, transliterated (accumulate_metadata + dict_to_coords)
    def reference(props: Seq[Map[String, MetaValue]]): Map[String, graft.meta.Accumulate.Coord] = {
      val n = props.size
      val keys = props.flatMap(_.keys).distinct
      keys.flatMap { k =>
        val vals = props.map(_.get(k))
        if (vals.forall(_.isDefined) && vals.flatten.distinct.size == 1) {
          var v = vals.head.get
          var loop = true
          while (loop) v match {
            case MArr(xs) if xs.size == 1 => v = xs.head
            case _ => loop = false
          }
          v match {
            case MArr(xs) if xs.forall(x => !x.isInstanceOf[MArr] && !x.isInstanceOf[MObj]) =>
              Some(k -> CoordSet(xs.distinct))
            case MArr(_) => None
            case s => Some(k -> Coord0D(s))
          }
        } else {
          var vs = vals.map(_.getOrElse(MNull)).toVector
          while (vs.forall { case MArr(xs) => xs.size == 1; case _ => false })
            vs = vs.map { case MArr(xs) => xs.head; case x => x }
          if (vs.forall(_.isInstanceOf[MArr]) &&
              vs.map { case MArr(xs) => xs.size; case _ => -1 }.distinct.size == 1) None
          else Some(k -> Coord1D(vs))
        }
      }.toMap
    }

    for (_ <- 0 until 200) {
      val nItems = rnd.nextInt(4) + 1
      val keys = Seq("k0", "k1", "k2")
      // shared pool of values per key makes constant fields likely
      val pool = keys.map(k => k -> Vector.fill(2)(rndVal(0))).toMap
      val props = Seq.fill(nItems)(keys.flatMap { k =>
        if (rnd.nextInt(4) == 0) None
        else Some(k -> pool(k)(rnd.nextInt(2)))
      }.toMap)
      assert(graft.meta.Accumulate.typedCoords(props) == reference(props),
        s"props=$props")
    }
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
