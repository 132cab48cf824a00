package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling (Matula & Beck 1983) —
  * the fifth graph primitive (components/PageRank/LabelProp/Triangles
  * give connectivity, influence, density-communities, local density;
  * the k-core gives GLOBAL density: the maximal subgraph where every
  * node keeps ≥ k neighbors). Pipelines use it to strip the long tail
  * of weakly-connected spam/noise nodes from link and co-occurrence
  * graphs before the expensive per-community work.
  *
  * Each peeling round is one map-side-combined degree census plus two
  * semi-joins of the edge list against the surviving-node table — all
  * equi-joins, shuffle O(edges)/round, no window, no collect. A round
  * removes EVERY node currently under degree k at once (synchronous),
  * so the round count needed is the graph's peeling depth, not its node
  * count; a FIXED round budget keeps the plan deterministic and
  * lineage-bounded (eager localCheckpoint per round, the LabelProp
  * discipline). Rounds past convergence are no-ops, so overshooting is
  * safe — callers size `rounds` at the expected peel depth + slack. */
object KCore {

  /** Degrees of the k-core after `rounds` synchronous peels of the
    * undirected graph given as canonical edges (u < v, distinct).
    * Returns (node, deg) over the surviving subgraph — empty when the
    * whole graph peels away. */
  def coreDegrees(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"KCore: k=$k")
    require(rounds >= 1, s"KCore: rounds=$rounds")
    val e0 = edges.toDF("a", "b")
    var e = e0.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b")).distinct()
      .localCheckpoint(true)
    var it = 0
    while (it < rounds) {
      val alive = e.groupBy(col("a")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= k).select(col("a"))
      e = e.join(alive, Seq("a"), "left_semi")
        .join(alive.withColumnRenamed("a", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b")).localCheckpoint(true)
      it += 1
    }
    e.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .select(col("a").as("node"), col("deg"))
  }
}
