package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Contour POLYLINE STITCHING — the epilogue that turns
  * [[Focal.contourSegments]]'s per-cell segments into whole iso-lines
  * with stable ids (what a GIS user downloads): segments sharing an
  * endpoint belong to one polyline, so polylines are the connected
  * components of the segment graph, computed with the same distributed
  * min-label + pointer-jump machinery the dedup family uses
  * ([[graft.dedup.Dedup.connectedComponents]]) — O(edges)/round shuffle,
  * ~log(diameter) rounds, no geometry ever assembled on the driver.
  *
  * Vertex identity: the quantized coordinate pair packed into one long
  * (round(y·q) << 32 | round(x·q)). Exact, because contourSegments emits
  * BIT-IDENTICAL doubles for the shared vertex of adjacent cells (same
  * edge ⇒ same inputs ⇒ same IEEE ops), so quantization is a stable key,
  * not a tolerance match. Marching squares gives every vertex degree ≤ 2
  * (an edge crossing is shared by exactly its two flanking cells), so
  * components are simple paths or cycles — `closed` below distinguishes
  * them. All levels stitch in ONE pass: a vertex determines its grid
  * edge and its interpolation parameter, and on a fixed edge t is
  * strictly monotone in the level, so vertices of different levels can
  * never collide — components cannot merge across levels by
  * construction (still grouped by (level, poly) downstream, defensively).
  *
  * Returns the input segments + `poly` (the component's min vertex key —
  * stable across runs and parallelism because it is data-determined). */
object Contour {

  private def key(y: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column,
                  q: Double): org.apache.spark.sql.Column =
    (round(y * q).cast("long") * lit(1L << 32) + round(x * q).cast("long"))

  def stitch(segs: Dataset[Focal.ContourSeg], quantum: Double = 1024.0,
             sequentialCap: Int = 65536): DataFrame = {
    val df = segs.toDF()
      .withColumn("k1", key(col("y1"), col("x1"), quantum))
      .withColumn("k2", key(col("y2"), col("x2"), quantum))
      .localCheckpoint(true) // the halo exchange runs once, not per CC round
    // LOUD quantization guard: the no-cross-level-collision and
    // degree <= 2 invariants are EXACT-ARITHMETIC arguments (integer
    // raster, half-integer levels) — a float DEM with levels closer
    // than ~1/quantum in t-space, or a crossing within 1/quantum of a
    // cell corner, can collide keys after quantization. Any collision
    // surfaces as a vertex with > 2 incident segments (cross-level
    // merges stack two degree-2 vertices; corner collisions fuse two
    // edges' crossings), so one degree census catches every violation
    // before CC silently merges lines. Raise `quantum` or separate the
    // levels when it fires.
    val badDeg = df.select(col("k1").as("k"))
      .unionByName(df.select(col("k2").as("k")))
      .groupBy(col("k")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") > 2)
    if (!badDeg.isEmpty) throw new IllegalStateException(
      "Contour: a vertex key has > 2 incident segments — quantization " +
      s"(quantum=$quantum) collided distinct crossings (levels too close " +
      "or a crossing within 1/quantum of a cell corner). Raise `quantum` " +
      "or space the levels; the marching-squares degree bound is 2.")
    // SIZE-ROUTED component labeling (the r47 ring-pipeline discipline
    // applied to the stitch): a LEVEL whose segment set fits one task
    // labels its polylines with an in-memory union-find — one shuffle,
    // zero CC iteration floors — while a coastline-scale level takes
    // the distributed min-label CC. Identical labels either way (both
    // are the component-minimum vertex key), and vertex keys are
    // globally unique across levels (the monotone-t argument above), so
    // the label table unions and joins back on k1 alone.
    val spark = segs.sparkSession
    import spark.implicits._
    val sizes = df.groupBy(col("level")).agg(count(lit(1)).as("n_seg"))
    val withN = df.join(sizes, Seq("level"))
    val smallEdges = withN.filter(col("n_seg") <= sequentialCap)
      .select(col("level"), col("k1"), col("k2"))
    val bigEdges = withN.filter(col("n_seg") > sequentialCap)
      .select(col("k1"), col("k2")).localCheckpoint(true)
    val localComps = smallEdges.as[(Double, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_: Double, it: Iterator[(Double, Long, Long)]) =>
        // in-memory union-find (path-halving) with component-minimum
        // extraction — ≤ sequentialCap edges per group by the router
        val parent = new scala.collection.mutable.HashMap[Long, Long]()
        def find(x0: Long): Long = {
          var x = x0
          while (parent(x) != x) {
            parent(x) = parent(parent(x))
            x = parent(x)
          }
          x
        }
        it.foreach { case (_, a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val minOf = new scala.collection.mutable.HashMap[Long, Long]()
        parent.keysIterator.foreach { k =>
          val r = find(k)
          minOf.get(r) match {
            case Some(m) => if (k < m) minOf(r) = k
            case None => minOf(r) = k
          }
        }
        parent.keysIterator.map(k => (k, minOf(find(k)))).toSeq.iterator
      }.toDF("k1", "poly")
    val comps =
      if (bigEdges.isEmpty) localComps
      else localComps.unionByName(
        graft.dedup.Dedup.connectedComponents(
          bigEdges.select(col("k1").as("a"), col("k2").as("b")))
          .select(col("node").as("k1"), col("component").as("poly")))
    df.join(comps, Seq("k1"))
      // downstream consumers branch over this frame several times
      // (census reads it three ways; orderedVertices twice) and Spark
      // does no CSE across branches — truncate here so the CC join
      // runs once
      .localCheckpoint(true)
  }

  /** ORDERED vertex sequences — the geometry export a GIS consumer
    * downloads (each polyline's vertices with 0-based ordinals), from
    * [[stitch]]'s labeled segments, fully distributed via WYLLIE LIST
    * RANKING (Wyllie 1979; JáJá §3.1): a contour line can be
    * arbitrarily long (a coastline at 10 m cells is millions of
    * vertices), so walking it sequentially — on the driver or inside
    * one task — is the scale-killer; pointer jumping ranks every
    * vertex in ⌈log₂(longest line)⌉ rounds of one self-equi-join each.
    *
    * Construction: every segment yields two directed HALF-EDGES; at an
    * interior vertex (degree 2, the marching-squares bound) the
    * successor of (u→v) is (v→w), w = v's other neighbor — a FUNCTIONAL
    * successor list. Each polyline designates a start: its min
    * degree-1 endpoint (open path) or its min vertex with the
    * back-edge into it cut (cycle). Wyllie state (pointer, distance,
    * terminal) doubles per round; afterwards the forward chain is the
    * half-edges sharing the start's terminal, and ordinal =
    * chain-length − suffix-distance. Closed rings emit first == last
    * vertex (the GIS ring convention).
    *
    * Output: (level, poly, ord, y, x) — y/x recovered from the packed
    * key (quantized grid coords / quantum). `rounds` is a cap with
    * fixpoint early-exit; exhaustion throws loudly (the Flow/KCore
    * guard discipline — 2^rounds must cover the longest polyline).
    *
    * SIZE ROUTING (the AQE-skew-handling shape): real contour sets are
    * a power law — millions of small rings and a few coastline-scale
    * lines. A poly with ≤ `sequentialCap` half-edges walks SEQUENTIALLY
    * inside its one group (a single mapGroups stage, memory bounded by
    * the cap); only the giants pay Wyllie's log-rounds of self-joins.
    * Both paths reproduce the identical vertex order (same start rule,
    * same min-neighbor first step), so routing is invisible to
    * consumers — it only moves the iteration floors off the fixture-
    * scale common case. */
  def orderedVertices(stitched: DataFrame, rounds: Int = 24,
                      quantum: Double = 1024.0,
                      sequentialCap: Int = 4096): DataFrame =
    orderedVertexKeys(stitched, rounds, sequentialCap)
      .select(col("level"), col("poly"), col("ord"),
        (shiftright(col("k"), 32).cast("double") / quantum).as("y"),
        (col("k").bitwiseAND(lit(0xFFFFFFFFL)).cast("double") / quantum).as("x"))

  /** [[orderedVertices]] stopping at the PACKED vertex key — the
    * size-routed walk/Wyllie machinery independent of how keys encode
    * geometry, so any degree-≤2 segment graph keyed on longs can ride
    * it ([[Regions.outlines]] does, with region-salted corner keys).
    * Emits (level, poly, ord, k). */
  def orderedVertexKeys(stitched: DataFrame, rounds: Int = 24,
                        sequentialCap: Int = 4096): DataFrame = {
    val all = stitched.select(col("level"), col("poly"), col("k1"), col("k2"))
    val sizes = all.groupBy(col("level"), col("poly"))
      .agg(count(lit(1)).as("n_seg"))
    // one co-partitioned join (agg output is already hashed on the key),
    // checkpointed so both routes read it without replaying the stitch
    val routed = all.join(sizes, Seq("level", "poly")).localCheckpoint(true)
    val small = routed.filter(col("n_seg") <= sequentialCap)
    val big = routed.filter(col("n_seg") > sequentialCap)
      .drop("n_seg")
    val smallOut = walkSequential(small.drop("n_seg"))
    if (big.isEmpty) smallOut
    else smallOut.unionByName(wyllie(big, rounds))
  }

  /** The sequential route: each (level, poly) group's half-edges fit
    * comfortably in one task (≤ sequentialCap by the router), so the
    * chain walks in-memory — same start vertex (min degree-1 endpoint,
    * else the min vertex = the poly id) and same min-neighbor first
    * step as the Wyllie route and the SQL replays. */
  private def walkSequential(segs: DataFrame): DataFrame = {
    val spark = segs.sparkSession
    import spark.implicits._
    val NONE = Long.MinValue
    segs.as[(Double, Long, Long, Long)]
      .groupByKey { case (level, poly, _, _) => (level, poly) }
      .flatMapGroups { (key: (Double, Long), it: Iterator[(Double, Long, Long, Long)]) =>
        val (level, poly) = key
        val nbr = new scala.collection.mutable.HashMap[Long, (Long, Long)]()
        var nSeg = 0
        it.foreach { case (_, _, a, b) =>
          def add(u: Long, v: Long): Unit = nbr.get(u) match {
            case None => nbr(u) = (v, NONE)
            case Some((x, _)) => nbr(u) = (math.min(x, v), math.max(x, v))
          }
          add(a, b); add(b, a); nSeg += 1
        }
        // start: min degree-1 endpoint (open path), else min vertex (ring)
        var start = Long.MaxValue
        var anyDeg1 = false
        nbr.foreach { case (v, (_, n2)) =>
          if (n2 == NONE) {
            if (!anyDeg1 || v < start) { start = v; anyDeg1 = true }
          } else if (!anyDeg1 && v < start) start = v
        }
        val out = new scala.collection.mutable.ArrayBuffer[(Double, Long, Long, Long)](nSeg + 1)
        def emit(ord: Long, k: Long): Unit =
          out += ((level, poly, ord, k))
        var prev = NONE
        var cur = start
        var ord = 0L
        var done = false
        while (!done) {
          emit(ord, cur)
          val (n1, n2) = nbr(cur)
          if (ord > 0 && n2 == NONE) done = true // the open end
          else {
            val nxt = if (n2 == NONE || prev == NONE) n1
                      else if (n1 == prev) n2 else n1
            prev = cur; cur = nxt; ord += 1
            if (cur == start) { emit(ord, cur); done = true } // ring: first == last
          }
        }
        out.iterator
      }.toDF("level", "poly", "ord", "k")
  }

  /** The Wyllie route (giant lines): see [[orderedVertices]]. */
  private def wyllie(base: DataFrame, rounds: Int): DataFrame = {
    val he = base.select(col("level"), col("poly"),
        col("k1").as("src"), col("k2").as("dst"))
      .unionByName(base.select(col("level"), col("poly"),
        col("k2").as("src"), col("k1").as("dst")))
      .localCheckpoint(true)
    // neighbor table: degree <= 2 by the marching-squares bound (each
    // crossing is used once by each of its two flanking cells)
    val nb = he.groupBy(col("level"), col("src").as("v"))
      .agg(min(col("dst")).as("n1"), max(col("dst")).as("n2"),
           count(lit(1)).as("deg"))
    // designated start per polyline: min degree-1 endpoint, else (cycle)
    // the min vertex — which IS the poly id (CC min-label)
    val starts = he.select(col("level"), col("poly"), col("src").as("v")).distinct()
      .join(nb, Seq("level", "v"))
      .groupBy(col("level"), col("poly"))
      .agg(min(when(col("deg") === 1, col("v"))).as("minEnd"))
      .select(col("level"), col("poly"),
        coalesce(col("minEnd"), col("poly")).as("startV"))
      .localCheckpoint(true)
    // successor pointers; a half-edge ENDING at a degree-1 vertex or at
    // a cycle's designated start is terminal (the cycle cut)
    val succ = he.join(starts, Seq("level", "poly"))
      .join(nb.select(col("level"), col("v").as("dst"),
        col("n1"), col("n2"), col("deg")), Seq("level", "dst"))
      .select(col("level"), col("poly"), col("src"), col("dst"),
        when(col("deg") === 1 || col("dst") === col("startV"), lit(null))
          .otherwise(when(col("n1") === col("src"), col("n2"))
            .otherwise(col("n1"))).as("nxt"))
    // Wyllie state: pointer (pS,pD) to the successor half-edge, suffix
    // distance d (this half-edge inclusive), terminal (tS,tD) once the
    // chain end is known
    var st = succ.select(col("level"), col("poly"), col("src"), col("dst"),
        when(col("nxt").isNotNull, col("dst")).as("pS"), col("nxt").as("pD"),
        lit(1L).as("d"),
        when(col("nxt").isNull, col("src")).as("tS"),
        when(col("nxt").isNull, col("dst")).as("tD"))
      .localCheckpoint(true)
    var it = 0
    var pending = !st.filter(col("pS").isNotNull).isEmpty
    while (it < rounds && pending) {
      val nxtSt = st.select(col("level"), col("src").as("pS"), col("dst").as("pD"),
        col("pS").as("qS"), col("pD").as("qD"), col("d").as("d2"),
        col("tS").as("t2S"), col("tD").as("t2D"))
      val stepped = st.join(nxtSt, Seq("level", "pS", "pD"), "left")
        .select(col("level"), col("poly"), col("src"), col("dst"),
          when(col("d2").isNotNull, col("qS")).otherwise(col("pS")).as("pS"),
          when(col("d2").isNotNull, col("qD")).otherwise(col("pD")).as("pD"),
          (col("d") + coalesce(col("d2"), lit(0L))).as("d"),
          coalesce(col("tS"), col("t2S")).as("tS"),
          coalesce(col("tD"), col("t2D")).as("tD"))
        .localCheckpoint(true)
      st = stepped
      pending = !st.filter(col("pS").isNotNull).isEmpty
      it += 1
    }
    if (pending) throw new IllegalStateException(
      s"Contour: round budget $rounds exhausted before list ranking " +
      "converged — 2^rounds must cover the longest polyline's " +
      "half-edge count. Raise `rounds`: overshoot is free, the loop " +
      "exits at the first fixpoint round.")
    // forward chain = half-edges sharing the START half-edge's terminal;
    // the start half-edge is (startV -> its n1): deg-1 start has one
    // neighbor (n1 == n2), a cycle start walks toward min neighbor
    val startHe = starts
      .join(nb.select(col("level"), col("v").as("startV"), col("n1")),
        Seq("level", "startV"))
      .join(st.select(col("level"), col("src").as("startV"), col("dst").as("n1"),
          col("d").as("len"), col("tS"), col("tD")),
        Seq("level", "startV", "n1"))
      .select(col("level"), col("poly"), col("len"), col("tS"), col("tD"))
    val chain = st.join(startHe, Seq("level", "poly", "tS", "tD"))
    // every half-edge contributes its src at ordinal len - d; the chain
    // terminal additionally contributes its dst at ordinal len (for a
    // ring that vertex IS the start again — first == last)
    val inner = chain.select(col("level"), col("poly"),
      (col("len") - col("d")).as("ord"), col("src").as("k"))
    val last = chain.filter(col("src") === col("tS") && col("dst") === col("tD"))
      .select(col("level"), col("poly"), col("len").as("ord"), col("dst").as("k"))
    inner.unionByName(last)
      .select(col("level"), col("poly"), col("ord"), col("k"))
  }

  /** Per-(level, polyline) census: segment count and whether the line is
    * CLOSED (a cycle: every vertex degree 2 ⇔ n_vertices == n_segments;
    * an open path has one more vertex than segments). The shape a
    * contour-map legend wants, and the replayable read-out of the
    * stitch. */
  def census(stitched: DataFrame): DataFrame = {
    val nSeg = stitched.groupBy(col("level"), col("poly"))
      .agg(count(lit(1)).as("n_segments"))
    val nVert = stitched.select(col("level"), col("poly"), col("k1").as("k"))
      .unionByName(stitched.select(col("level"), col("poly"), col("k2").as("k")))
      .groupBy(col("level"), col("poly"))
      .agg(countDistinct(col("k")).as("n_vertices"))
    nSeg.join(nVert, Seq("level", "poly"))
      .withColumn("closed", col("n_vertices") === col("n_segments"))
  }
}
