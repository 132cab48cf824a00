package graft

import graft.ops.Regions

/** Hand oracles for raster region labeling and outline vectorization
  * (ops.Regions): 4-connectivity semantics, the diagonal-touch vertex
  * split, hole rings, ring closure and deterministic vertex order. */
class RegionsSpec extends SparkSpec {
  import spark.implicits._

  private def cells(g: Seq[String]): Seq[(Int, Int, Long)] =
    for {
      (row, r) <- g.zipWithIndex
      (ch, c) <- row.zipWithIndex
      if ch != '.'
    } yield (r, c, (ch - '0').toLong)

  private def rings(g: Seq[String], h: Int, w: Int)
      : Map[(Long, Long), Seq[(Long, Long)]] =
    Regions.outlines(cells(g).toDF("r", "c", "lab"), h, w)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(t => (t._1, t._2))
      .map { case (k, vs) =>
        k -> vs.sortBy(_._3).map(t => (t._4, t._5)).toSeq
      }

  test("labelRegions: 4-connected equal values merge, diagonal touch splits") {
    // 1 1 .      two 1-regions? no: (0,0)-(0,1) joined; (1,2) diagonal
    // . . 1      from (0,1) -> separate region; 2-block below
    // 2 2 .
    val df = cells(Seq("11.", "..1", "22.")).toDF("r", "c", "v")
    val got = Regions.labelRegions(df, width = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(got((0, 0)) == 0L && got((0, 1)) == 0L) // region id = min cell id
    assert(got((1, 2)) == 5L)                      // diagonal: own region
    assert(got((2, 0)) == 6L && got((2, 1)) == 6L)
    // value difference splits even when adjacent
    assert(got((0, 0)) != got((2, 0)))
  }

  test("single cell: one closed ring, min-corner start, min-neighbor step") {
    // cell (1,1) on a 3x3 grid: corners (1,1)(1,2)(2,1)(2,2); start at
    // (1,1), min neighbor is (1,2) (corner key y*(w+1)+x: (1,2)=6 <
    // (2,1)=9), ring closes back
    val out = rings(Seq("...", ".7.", "..."), 3, 3)
    assert(out.size == 1)
    val ring = out.head._2
    assert(out.head._1._1 == 7L)
    assert(ring == Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 1L), (1L, 1L)))
  }

  test("2x1 block: one ring of 6 edges, first == last") {
    val out = rings(Seq("55"), 1, 2)
    assert(out.size == 1)
    val ring = out.head._2
    assert(ring.head == ring.last)
    assert(ring.length == 7) // 6 boundary edges + closure repeat
    assert(ring.toSet == Set((0L, 0L), (0L, 1L), (0L, 2L), (1L, 0L), (1L, 1L), (1L, 2L)))
  }

  test("diagonal touch of one label: vertex split yields TWO rings") {
    // 3 .      same label, diagonal only: the shared corner (1,1) is
    // . 3      split per inside cell; two 4-edge rings, not a figure-8
    val out = rings(Seq("3.", ".3"), 2, 2)
    assert(out.size == 2, out.keys.toString)
    assert(out.values.forall(r => r.length == 5 && r.head == r.last))
    // one ring wraps cell (0,0), the other cell (1,1)
    val sets = out.values.map(_.toSet).toSet
    assert(sets == Set(
      Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)),
      Set((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))))
  }

  test("region with a hole: outer ring + inner ring") {
    val g = Seq("111", "1.1", "111")
    val out = rings(g, 3, 3)
    assert(out.size == 2, out.keys.toString)
    val sizes = out.values.map(_.length).toSeq.sorted
    assert(sizes == Seq(5, 13)) // hole: 4 edges + closure; outer: 12 + closure
  }

  test("two labels sharing an edge trace it from both sides") {
    val out = rings(Seq("12"), 1, 2)
    assert(out.size == 2)
    assert(out.keySet.map(_._1) == Set(1L, 2L))
    assert(out.values.forall(r => r.length == 5 && r.head == r.last))
  }

  test("checkerboard of two labels: each label splits into two rings") {
    // 1 2
    // 2 1   — for label 1 the center corner is a diagonal touch; same
    //         for label 2: four rings total, all squares
    val out = rings(Seq("12", "21"), 2, 2)
    assert(out.size == 4, out.keys.toString)
    assert(out.values.forall(r => r.length == 5 && r.head == r.last))
    assert(out.keySet.map(_._1) == Set(1L, 2L))
  }

  test("the fused local route and the CC+list-ranking route emit " +
       "identical rings (size routing is invisible)") {
    val h = 10; val w = 12
    val rnd = new scala.util.Random(11)
    val df = (for (r <- 0 until h; c <- 0 until w)
      yield (r, c, rnd.nextInt(2).toLong)).toDF("r", "c", "lab")
    // three routes (r19): the default whole-field driver route
    // (localCap), the distributed pipeline with the fused per-label
    // local walk (localCap = 0), and the distributed CC+list-ranking
    // route (both caps 0) — all must emit identical rings
    def collect(seqCap: Int, locCap: Long) =
      Regions.outlines(df, h, w, sequentialCap = seqCap, localCap = locCap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val wholeLocal = collect(4096, 262144L)
    assert(collect(4096, 0L) == wholeLocal)
    assert(collect(0, 0L) == wholeLocal)
  }

  test("outlines replay a driver-side boundary census on a random field") {
    val h = 12; val w = 15
    val rnd = new scala.util.Random(7)
    val field = Array.tabulate(h, w)((_, _) => rnd.nextInt(3).toLong)
    val df = (for (r <- 0 until h; c <- 0 until w)
      yield (r, c, field(r)(c))).toDF("r", "c", "lab")
    val got = Regions.outlines(df, h, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per label: total boundary edges == ring rows minus one closure
    // repeat per ring
    def at(r: Int, c: Int): Long =
      if (r < 0 || r >= h || c < 0 || c >= w) -1L else field(r)(c)
    val wantEdges = (for {
      r <- 0 until h; c <- 0 until w
      (dr, dc) <- Seq((-1, 0), (1, 0), (0, -1), (0, 1))
      if at(r + dr, c + dc) != field(r)(c)
    } yield field(r)(c) -> 1).groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val gotEdges = got.groupBy(_._1).map { case (lab, vs) =>
      val nRings = vs.map(_._2).distinct.size
      lab -> (vs.size.toLong - nRings) // each ring: n_edges + 1 rows
    }
    assert(gotEdges == wantEdges, s"$gotEdges vs $wantEdges")
    // every ring is a closed walk over unit steps
    for ((_, vs) <- got.groupBy(t => (t._1, t._2))) {
      val seq = vs.sortBy(_._3).map(t => (t._4, t._5))
      assert(seq.head == seq.last)
      for (w2 <- seq.sliding(2); a = w2(0); b = w2(1))
        assert((a._1 - b._1).abs + (a._2 - b._2).abs == 1, s"$a -> $b")
    }
  }

  test("ringRoles fuzz: role matches the label field, parents are shells") {
    // INDEPENDENT role oracle: a ring's test cell (south-east of its
    // ord-0 min corner) carries the ring's label iff the ring is a
    // SHELL (shells wrap region cells; holes wrap non-label cells) —
    // checked against the raw field, not against any containment logic.
    // Structural invariants: every hole has a parent; every parent is a
    // same-label SHELL; shells carry no parent.
    for (trial <- 0 until 3) {
      val h = 10 + trial; val w = 12 + trial
      val rnd = new scala.util.Random(40 + trial)
      val field = Array.tabulate(h, w)((_, _) => rnd.nextInt(2).toLong)
      val df = (for (r <- 0 until h; c <- 0 until w)
        yield (r, c, field(r)(c))).toDF("r", "c", "lab")
      val rings = Regions.outlines(df, h, w).localCheckpoint(true)
      val start = rings.filter($"ord" === 0).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(3).toInt, r.getLong(4).toInt))
        .toMap
      val roles = Regions.ringRoles(rings).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      assert(roles.keySet === start.keySet)
      for (((lab, ring), (role, parent)) <- roles) {
        val (y0, x0) = start((lab, ring))
        val cellLab = field(y0)(x0) // SE cell of the min corner
        val wantRole = if (cellLab == lab) 0 else 1
        assert(role === wantRole,
          s"trial $trial ring ($lab, $ring) at ($y0, $x0): " +
          s"role $role but cell label $cellLab")
        if (role == 1) {
          assert(parent.isDefined, s"hole ($lab, $ring) without parent")
          val p = roles((lab, parent.get))
          assert(p._1 === 0, s"hole ($lab, $ring) parent is not a shell")
        } else assert(parent.isEmpty, s"shell ($lab, $ring) carries a parent")
      }
    }
  }

  test("polygonCensus fuzz: net areas sum to cell counts, polys to components") {
    // INDEPENDENT identity gates on random fields: (a) per label,
    // Σ net_area2 == 2 × the label's CELL COUNT (holes subtract, nested
    // islands re-add — the shoelace/role/parent chain must compose
    // exactly); (b) the polygon count per label == the number of
    // 8-CONNECTED label components (outlines reads the field
    // 8-connected; every component owns exactly one shell).
    for (trial <- 0 until 3) {
      val h = 10 + trial; val w = 11 + trial
      val rnd = new scala.util.Random(80 + trial)
      val field = Array.tabulate(h, w)((_, _) => rnd.nextInt(2).toLong)
      val df = (for (r <- 0 until h; c <- 0 until w)
        yield (r, c, field(r)(c))).toDF("r", "c", "lab")
      val got = {
        import org.apache.spark.sql.functions.{count, lit, sum}
        Regions.polygonCensus(Regions.outlines(df, h, w))
          .groupBy($"lab")
          .agg(count(lit(1)).as("n_polys"), sum($"net_area2").as("net2"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      }
      // (a) cell-count identity
      val counts = (for (r <- 0 until h; c <- 0 until w)
        yield field(r)(c)).groupBy(identity).map { case (k, v) => k -> v.size }
      for ((lab, n) <- counts)
        assert(got(lab)._2 === 2L * n,
          s"trial $trial lab $lab: net2 ${got(lab)._2} vs cells $n")
      // (b) 4-connected component count via driver union-find (the
      // vertex-split salting separates diagonal touches into their own
      // rings — the "diagonal touch yields TWO rings" test above — so a
      // polygon is a 4-connected region)
      val parent = scala.collection.mutable.Map[Int, Int]()
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r)
        var c = x; while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }; r }
      def union(a: Int, b: Int): Unit = { val (x, y) = (find(a), find(b))
        if (x != y) parent(x) = y }
      for (r <- 0 until h; c <- 0 until w) parent(r * w + c) = r * w + c
      for { r <- 0 until h; c <- 0 until w
            (dr, dc) <- Seq((0, 1), (1, 0))
            r2 = r + dr; c2 = c + dc
            if r2 >= 0 && r2 < h && c2 >= 0 && c2 < w
            if field(r2)(c2) == field(r)(c) } union(r * w + c, r2 * w + c2)
      val nComp = (for (r <- 0 until h; c <- 0 until w)
        yield (field(r)(c), find(r * w + c))).distinct
        .groupBy(_._1).map { case (k, v) => k -> v.size }
      for ((lab, n) <- nComp)
        assert(got(lab)._1 === n.toLong,
          s"trial $trial lab $lab: ${got(lab)._1} polys vs $n components")
    }
  }

  test("out-of-range cells fail loudly instead of colliding packed keys") {
    // (0, -1) packs identically to a neighbor's corner key — must throw,
    // not produce wrong rings
    val negC = Seq((0, -1, 5L), (0, 0, 5L)).toDF("r", "c", "lab")
    val ex = intercept[IllegalArgumentException] { Regions.outlines(negC, 2, 2) }
    assert(ex.getMessage.contains("outside"))
    val bigR = Seq((2, 0, 5L), (0, 0, 5L)).toDF("r", "c", "lab") // r == height
    intercept[IllegalArgumentException] { Regions.outlines(bigR, 2, 2) }
    // labelRegions' id packing has the same guard (c == width collides)
    val badL = Seq((0, 2, 1L), (0, 0, 1L)).toDF("r", "c", "v")
    val ex2 = intercept[IllegalArgumentException] { Regions.labelRegions(badL, 2) }
    assert(ex2.getMessage.contains("collide"))
    val negR = Seq((-1, 0, 1L), (0, 0, 1L)).toDF("r", "c", "v")
    intercept[IllegalArgumentException] { Regions.labelRegions(negR, 2) }
  }

  test("ringCensus: shoelace area2 and perimeter on hand shapes") {
    // single cell: perimeter 4, enclosed area 1 (area2 = +2 — every walk
    // starts at the top-left corner stepping east, one fixed orientation)
    val one = Regions.ringCensus(
      Regions.outlines(Seq((0, 0, 7L)).toDF("r", "c", "lab"), 1, 1))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(one.length === 1 && one.head._2 === 4L && one.head._3 === 2L)
    // 2x1 block: perimeter 6, enclosed area 2
    val two = Regions.ringCensus(
      Regions.outlines(Seq((0, 0, 1L), (0, 1, 1L)).toDF("r", "c", "lab"), 1, 2))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(two.length === 1 && two.head._1 === 6L && two.head._2 === 4L)
    // 3x3 region with a hole at the center: the outer ring encloses 9
    // cells (area2 = 18, perimeter 12), the hole ring encloses the
    // 1-cell hole (area2 = 2, perimeter 4) — both POSITIVE (one shared
    // orientation; outer/hole roles are containment, not sign)
    val holed = for { r <- 0 until 3; c <- 0 until 3; if !(r == 1 && c == 1) }
      yield (r, c, 5L)
    val rc = Regions.ringCensus(
      Regions.outlines(holed.toDF("r", "c", "lab"), 3, 3))
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(rc === Set((12L, 18L), (4L, 2L)), rc.mkString(","))
    // two labels sharing an edge: each label's own ring census is
    // independent (perimeter 4, area2 2 each)
    val duo = Regions.ringCensus(
      Regions.outlines(Seq((0, 0, 1L), (0, 1, 2L)).toDF("r", "c", "lab"), 1, 2))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .toSet
    assert(duo === Set((1L, 4L, 2L), (2L, 4L, 2L)))
  }

  test("ringRoles: shell/hole parity and hole -> enclosing-shell parents") {
    // 3x3 of label 5 with a center hole: one shell (bigger ring), one
    // hole whose parent is the shell
    val holed = for { r <- 0 until 3; c <- 0 until 3; if !(r == 1 && c == 1) }
      yield (r, c, 5L)
    val rings = Regions.outlines(holed.toDF("r", "c", "lab"), 3, 3)
      .localCheckpoint(true)
    val roles = Regions.ringRoles(rings)
      .collect().map(r => (r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toList
    val perim = Regions.ringCensus(rings)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val shell = roles.filter(_._2 == 0)
    val hole = roles.filter(_._2 == 1)
    assert(shell.length === 1 && hole.length === 1, roles.toString)
    assert(hole.head._3 === shell.head._1) // parent = the shell ring
    assert(shell.head._3 === -1L)          // shells carry no parent
    assert(perim(shell.head._1) === 12L && perim(hole.head._1) === 4L)
  }

  test("ringRoles: nested annuli alternate shell/hole with nested parents") {
    // concentric square bands on 9x9: lab = chebyshev(center)/2 % 2 —
    // band 0 = {center ring 0 and ring 4..}, band structure gives label
    // 0 an island INSIDE label 0's own hole region? Use explicit nesting:
    // lab A ring (border), lab B ring inside it, lab A core inside that.
    val cells = for { r <- 0 until 5; c <- 0 until 5 } yield {
      val d = math.max(math.abs(r - 2), math.abs(c - 2))
      (r, c, if (d == 2) 9L else if (d == 1) 7L else 9L)
    }
    val rings = Regions.outlines(cells.toDF("r", "c", "lab"), 5, 5)
      .localCheckpoint(true)
    val got = Regions.ringRoles(rings)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    // label 9: border annulus (shell + hole) AND the 1-cell core — the
    // core's shell sits at depth 2 (inside 9's own hole and 7's rings is
    // label-blind: only label-9 rings count) -> depth 2, still a SHELL
    val l9 = got.filter(_._1._1 == 9L).values.toList
    assert(l9.count(_._1 == 0) === 2 && l9.count(_._1 == 1) === 1, got.toString)
    // label 7: annulus -> one shell + one hole, hole's parent = the shell
    val l7 = got.filter(_._1._1 == 7L)
    val l7shell = l7.filter(_._2._1 == 0).keys.head._2
    val l7hole = l7.values.filter(_._1 == 1)
    assert(l7.size === 2 && l7hole.size === 1 &&
      l7hole.head._2 === l7shell, got.toString)
    // the label-9 hole's parent is the label-9 border shell
    val l9rings = got.filter(_._1._1 == 9L)
    val l9hole = l9rings.values.filter(_._1 == 1).head
    val l9borderShell = l9rings.filter { case (_, (role, _)) => role == 0 }
      .keys.map(_._2).min // border shell has the grid-minimum corner key
    assert(l9hole._2 === l9borderShell, got.toString)
  }
}
