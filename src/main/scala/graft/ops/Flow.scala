package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.scan.Tile

/** D8 flow ACCUMULATION — the hydrology consumer of
  * [[Focal.d8Flow3x3]]'s flow-direction raster (O'Callaghan & Mark
  * 1984): for every cell, how many upstream cells drain through it.
  * Watershed delineation, stream extraction, and drainage-area
  * thresholds are all reads of this surface.
  *
  * Two stages, both distributed:
  *
  *  1. [[d8Edges]] flattens the direction raster into a FUNCTIONAL
  *     graph (≤ 1 out-edge per cell, cell → steepest-descent neighbor);
  *     strictly-descending flow means the graph is a forest flowing
  *     into pits/flats — acyclic by construction.
  *  2. [[accumulate]] runs synchronous rounds of the upstream-count
  *     recurrence acc₁ = indegree, accᵢ₊₁(v) = indeg(v) + Σ_{u→v}
  *     accᵢ(u) — correct WITHOUT double-counting precisely because the
  *     graph is functional: every ancestor reaches v through exactly
  *     one parent. Each round is one equi-join of the edge list against
  *     the node-sized accumulation table plus a map-side-combined sum —
  *     shuffle O(edges)/round, lineage truncated per round (the
  *     KCore/LabelProp localCheckpoint discipline), and the loop EXITS
  *     at the first fixpoint round (no count changed ⇒ every upstream
  *     path is fully propagated). Rounds needed = the longest flow
  *     path; on integer DEMs each D8 hop strictly decreases elevation,
  *     so the path length — and the round count — is bounded by the
  *     DEM's relief (max − min elevation), not the grid size. `rounds`
  *     is a CAP: exhausting it before the fixpoint throws loudly (it
  *     also catches a cyclic edge list, where counts grow forever).
  */
object Flow {

  /** Flow edges (src, dst) as row-major cell ids (r·gridW + c) from a
    * D8 flow-direction tile layer (ESRI codes; −1/NaN cells emit no
    * edge). A border cell whose direction points OFF the
    * gridH×gridW domain is an OUTLET (ESRI semantics: flow leaves the
    * grid) and emits no edge — without the bounds guard the row-major
    * id would silently wrap (gc=0 with a W code aliases the previous
    * row's last column). Pure per-tile flatMap — no shuffle. */
  def d8Edges(dirTiles: Dataset[Tile], chunkY: Int, chunkX: Int,
              gridW: Int, gridH: Int): DataFrame = {
    val spark = dirTiles.sparkSession
    import spark.implicits._
    dirTiles.flatMap { t =>
      for {
        r <- 0 until t.height
        c <- 0 until t.width
        v = t.pixels(r * t.width + c)
        if !v.isNaN && v >= 1.0
        gr = t.yChunk * chunkY + t.rowOff + r
        gc = t.xChunk * chunkX + t.colOff + c
        (dr, dc) = v.toInt match {
          case 1 => (0, 1); case 2 => (1, 1); case 4 => (1, 0)
          case 8 => (1, -1); case 16 => (0, -1); case 32 => (-1, -1)
          case 64 => (-1, 0); case 128 => (-1, 1)
          case bad => throw new IllegalArgumentException(
            s"Flow.d8Edges: not an ESRI D8 code: $bad at ($gr, $gc)")
        }
        if gr + dr >= 0 && gr + dr < gridH && gc + dc >= 0 && gc + dc < gridW
      } yield (gr.toLong * gridW + gc, (gr + dr).toLong * gridW + (gc + dc))
    }.toDF("src", "dst")
  }

  /** Upstream-cell counts (node, acc) for every node with ≥ 1 upstream
    * cell over a FUNCTIONAL edge list (≤ 1 out-edge per src — the
    * [[d8Edges]] contract; a src with several out-edges would
    * double-count its ancestors downstream). Cells that receive no flow
    * have acc 0 and are simply absent. */
  def accumulate(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"Flow: rounds=$rounds")
    val e = edges.toDF("src", "dst").localCheckpoint(true)
    val indeg = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("deg")).localCheckpoint(true)
    var acc = indeg.select(col("node"), col("deg").as("acc"))
    var converged = acc.isEmpty
    var it = 1 // acc already holds round 1 (the 1-hop ancestors)
    while (it < rounds && !converged) {
      val up = e.join(acc.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("acc")).as("ups"))
      val next = indeg.join(up, Seq("node"), "left")
        .select(col("node"),
          (col("deg") + coalesce(col("ups"), lit(0L))).as("acc"))
        .localCheckpoint(true)
      converged = next.join(acc.withColumnRenamed("acc", "prev"), Seq("node"))
        .filter(col("acc") =!= col("prev")).isEmpty
      acc = next
      it += 1
    }
    if (!converged && !acc.isEmpty) {
      checkSettledOrThrow(e, indeg, acc, rounds)
    }
    acc
  }

  private def checkSettledOrThrow(e: DataFrame, indeg: DataFrame,
                                  acc: DataFrame, rounds: Int): Unit = {
      // one extra probe: the budget may be exactly the path length
      val up = e.join(acc.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("acc")).as("ups"))
      val next = indeg.join(up, Seq("node"), "left")
        .select(col("node"),
          (col("deg") + coalesce(col("ups"), lit(0L))).as("acc"))
      val settled = next.join(acc.withColumnRenamed("acc", "prev"), Seq("node"))
        .filter(col("acc") =!= col("prev")).isEmpty
      if (!settled) throw new IllegalStateException(
        s"Flow: round budget $rounds exhausted before accumulation " +
        "converged — the longest flow path exceeds the budget (or the " +
        "edge list has a cycle, which never converges). Raise `rounds`: " +
        "overshoot is free, the loop exits at the first fixpoint round.")
  }

  /** WATERSHED BASIN labeling over the functional flow forest — the
    * third hydrology consumer of [[d8Edges]]: every cell is labeled with
    * the terminal pit/outlet its flow path reaches (the cells sharing a
    * terminal ARE the drainage basin). Returns (node, basin) for every
    * node that appears in the edge list; a terminal labels itself (cells
    * absent from the edge list entirely are their own trivial basins and
    * are simply not emitted — the [[accumulate]] absence convention).
    *
    * Algorithm: POINTER JUMPING (parent ← grandparent each round) — the
    * functional-forest specialization of path doubling: after round k
    * every pointer has advanced 2^k hops, so convergence takes
    * ⌈log₂(longest flow path)⌉ rounds, not path-length rounds — on
    * integer DEMs the path is relief-bounded, so the round count is
    * ~log₂(relief). Each round is ONE self-equi-join of the node-sized
    * pointer table (shuffle O(nodes)/round, lineage checkpointed) — the
    * general CC machinery (`Dedup.connectedComponents`) is overkill
    * here: a forest needs no min-label propagation, just jump-to-root.
    * `rounds` is a cap with fixpoint early-exit; exhausting it before
    * the fixpoint throws loudly (a cyclic edge list never converges —
    * the KCore/[[accumulate]] guard discipline). */
  def basins(edges: DataFrame, rounds: Int): DataFrame =
    resolveForest(edges, rounds).select(col("node"), col("basin"))

  /** Distance-to-outlet over the same forest — hydrology's flow-path
    * length (per cell: HOPS to its terminal pit/outlet; multiply by cell
    * size / √2 per diagonal downstream for metric length). Same Wyllie
    * state as [[basins]] with the distance accumulated through the
    * jumps; terminals are distance 0. */
  def distanceToOutlet(edges: DataFrame, rounds: Int): DataFrame =
    resolveForest(edges, rounds).select(col("node"), col("basin"), col("dist"))

  /** The shared pointer-jumping resolver: (node, basin, dist) for every
    * node in the edge list — parent ← grandparent with distance
    * accumulation (Wyllie), ⌈log₂(longest path)⌉ rounds, one node-sized
    * self-join per round, lineage checkpointed, loud budget and cycle
    * guards (see [[basins]]' scaladoc for the full argument). */
  private def resolveForest(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"Flow: rounds=$rounds")
    val e = edges.toDF("node", "p").localCheckpoint(true)
    var ptr = e.withColumn("d", lit(1L))
    var converged = ptr.isEmpty
    var it = 0
    def jump(cur: DataFrame): DataFrame =
      cur.join(
          cur.select(col("node").as("p"), col("p").as("gp"), col("d").as("gd")),
          Seq("p"), "left")
        .select(col("node"), coalesce(col("gp"), col("p")).as("p"),
          (col("d") + coalesce(col("gd"), lit(0L))).as("d"))
    while (it < rounds && !converged) {
      val next = jump(ptr).localCheckpoint(true)
      converged = next
        .join(ptr.select(col("node"), col("p").as("prev")), Seq("node"))
        .filter(col("p") =!= col("prev")).isEmpty
      ptr = next
      it += 1
    }
    if (!converged && !ptr.isEmpty) {
      val settled = jump(ptr)
        .join(ptr.select(col("node"), col("p").as("prev")), Seq("node"))
        .filter(col("p") =!= col("prev")).isEmpty
      if (!settled) throw new IllegalStateException(
        s"Flow: round budget $rounds exhausted before basin pointers " +
        "converged — need ~log2(longest flow path) rounds (or the edge " +
        "list has a cycle, which never converges). Raise `rounds`: " +
        "overshoot is free, the loop exits at the first fixpoint round.")
    }
    // CYCLE guard: a power-of-2 cycle SELF-STABILIZES to bogus
    // self-labels (after k jumps each pointer advanced 2^k hops, and
    // L | 2^k makes that the identity), so fixpoint alone cannot be
    // trusted — but a TRUE basin never has an out-edge, so any resolved
    // pointer that still lands on a src is a cycle artifact. One
    // semi-join, loud like the other iterative guards.
    val srcs = e.select(col("node").as("src_node")).distinct()
    val onCycle = ptr.join(srcs, ptr("p") === srcs("src_node"), "left_semi")
    if (!onCycle.isEmpty) throw new IllegalStateException(
      "Flow: basin pointers resolved onto nodes that still have " +
      "out-edges — the edge list has a cycle (a functional-forest " +
      "input is the contract; D8 edges are acyclic by construction).")
    // terminals label themselves at distance 0; interior nodes carry
    // their root + accumulated hop count. SET difference (except, not
    // exceptAll): a confluence dst appears as p once PER TRIBUTARY, and
    // multiset difference would leave the surplus occurrences behind,
    // misclassifying an interior node with in-degree >= 2 as a terminal.
    val terminals = e.select(col("p").as("node"))
      .except(e.select(col("node")))
      .select(col("node"), col("node").as("basin"), lit(0L).as("dist"))
    ptr.select(col("node"), col("p").as("basin"), col("d").as("dist"))
      .unionByName(terminals)
  }

  /** Strahler stream order (Strahler 1957) over the same functional
    * flow forest — hydrology's stream-classification primitive (order-1
    * headwaters; order rises only where two equal-order tributaries
    * meet). Defined per node as: 1 for a node with no upstream
    * neighbors; otherwise M + 1 if ≥ 2 upstream neighbors attain the
    * max upstream order M, else M.
    *
    * Computed as a MONOTONE fixpoint: every node starts at 1 (sources
    * are already correct) and rounds apply the definition
    * synchronously — values only ever rise toward the true order, and
    * the fixpoint is reached after longest-flow-path rounds (relief-
    * bounded on integer DEMs, like [[accumulate]]). Per round: one
    * edge⋈order equi-join, a (node, childOrder) count, and a struct-max
    * argmax — O(edges) shuffle, no window over the graph, lineage
    * checkpointed. `rounds` is a cap with fixpoint early-exit; budget
    * exhaustion before the fixpoint throws (cycle or under-budget). */
  def strahler(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"Flow: rounds=$rounds")
    val e = edges.toDF("src", "dst").localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(true)
    var ord = nodes.select(col("node"), lit(1L).as("ord"))
      .localCheckpoint(true)
    def step(cur: DataFrame): DataFrame = {
      val ch = e.join(cur.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("ord"))
      val top = ch.groupBy(col("node"), col("ord"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(max(struct(col("ord"), col("c"))).as("m"))
        .select(col("node"),
          (col("m.ord") + when(col("m.c") >= 2, 1L).otherwise(0L)).as("up"))
      nodes.join(top, Seq("node"), "left")
        .select(col("node"), coalesce(col("up"), lit(1L)).as("ord"))
    }
    var converged = ord.isEmpty
    var it = 0
    while (it < rounds && !converged) {
      val next = step(ord).localCheckpoint(true)
      converged = next.join(ord.withColumnRenamed("ord", "prev"), Seq("node"))
        .filter(col("ord") =!= col("prev")).isEmpty
      ord = next
      it += 1
    }
    if (!converged && !ord.isEmpty) {
      val settled = step(ord)
        .join(ord.withColumnRenamed("ord", "prev"), Seq("node"))
        .filter(col("ord") =!= col("prev")).isEmpty
      if (!settled) throw new IllegalStateException(
        s"Flow: round budget $rounds exhausted before Strahler orders " +
        "converged — the longest flow path exceeds the budget (or the " +
        "edge list has a cycle). Raise `rounds`: overshoot is free, the " +
        "loop exits at the first fixpoint round.")
    }
    ord
  }
}
