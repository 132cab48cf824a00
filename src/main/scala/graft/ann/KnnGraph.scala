package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions

/** Graph-based ANN: build an approximate kNN GRAPH (the HNSW / NSG /
  * NN-Descent family's data structure), then answer queries by expanding
  * the graph one hop — candidates(q) = neighbors(q) ∪ neighbors of
  * neighbors(q) — and exact-reranking the candidate set. This is the
  * recall lever the bucket family (v3/v7) cannot reach: a true neighbor
  * that landed across EVERY probed hyperplane is still found if any of
  * its graph neighbors was caught, because the hop-2 join walks the edge
  * regardless of which bucket it came from.
  *
  * Graph CONSTRUCTION seeds edges from TWO independent LSH tables
  * (disjoint hyperplane sets). With one table, neighbors-of-neighbors
  * collapse into the seed bucket (edges never leave it) and expansion adds
  * nothing; with two, a hop through a table-B edge escapes the table-A
  * bucket — the multi-table trick every LSH-seeded graph builder
  * (NN-Descent's sampled init, LSH Forest) relies on.
  *
  * Determinism: Ann's quantized-integer contract throughout — cosines are
  * round(dot/√·√·, 6) off exact integer dots, every top-g / top-k ranked
  * (cos DESC, id ASC), so the graph and the answers are bit-identical at
  * any parallelism and replayable by the DuckDB oracle.
  *
  * Scale shape (the 100 TB story):
  *  - seeding is the LSH-banding bound — an equi-join on bucket id per
  *    table, Σ|bucket|² candidate rows, never the global n² pair space;
  *  - the graph is n·g rows (g small: 4–32), partitioned by src;
  *  - expansion is an equi-join edges⋈edges on the middle node — at most
  *    n·g² candidate rows, shuffled on a key, AQE-splittable if a hub
  *    node skews;
  *  - exact rerank touches only the candidate set (≤ g + g² per query).
  * Nothing in the pipeline materializes an unbounded pair space, and the
  * graph itself is a first-class DataFrame a caller can persist and serve
  * from (same contract as [[Ann.ivfSqBuild]]'s index).
  */
object KnnGraph {

  /** Approximate kNN graph over `prepared` (Ann.prepare output:
    * id, qv, nq). Seeds candidate pairs from `nTables` disjoint
    * sign-random-hyperplane tables of `nPlanes` planes each, keeps each
    * node's top-`g` by quantized cosine. Returns (src, dst, cos) —
    * directed, g rows per src (fewer only if a node's buckets are
    * near-empty). */
  def build(prepared: DataFrame, nPlanes: Int, nTables: Int, dim: Int,
            g: Int): DataFrame = {
    require(nTables >= 2,
      s"KnnGraph.build: nTables=$nTables — with a single LSH table every " +
      "edge stays inside its seed bucket and hop-2 expansion degenerates " +
      "to the bucket itself; seed from >= 2 disjoint tables")
    val planes = graft.Queries.lshPlanes(nPlanes * nTables, dim)
    val bucketed = (0 until nTables).foldLeft(prepared) { (df, t) =>
      val bucket = (0 until nPlanes).map { j =>
        when(GraftFunctions.dot_long(col("qv"), typedLit(planes(t * nPlanes + j))) > 0,
             1L << j).otherwise(0L)
      }.reduce(_ + _)
      df.withColumn(s"b$t", bucket)
    }
    // One equi-join per table, unioned, then (src, dst) dedup: a pair
    // sharing both buckets must not score twice in the top-g ranking.
    val pairs = (0 until nTables).map { tb =>
      bucketed.as("a").join(bucketed.as("b"),
          col(s"a.b$tb") === col(s"b.b$tb") && col("a.id") =!= col("b.id"))
        .select(col("a.id").as("src"), col("b.id").as("dst"),
                Ann.cosine(col("a.qv"), col("b.qv"), col("a.nq"), col("b.nq")).as("cos"))
    }.reduce(_ unionByName _)
      .groupBy(col("src"), col("dst")).agg(min(col("cos")).as("cos"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= g)
      .select(col("src"), col("dst"), col("cos"))
  }

  /** One NN-Descent refinement round (Dong, Moses & Li, WWW'11): two
    * nodes adjacent to a common pivot become candidate neighbors of each
    * other ("a neighbor of my neighbor is probably my neighbor"), scored
    * exactly and merged with the old edges, keeping each node's top-g.
    * The pivot's neighborhood B(v) = out-edges ∪ top-g REVERSE edges —
    * the reverse side is capped at g (NN-Descent's reverse sampling) so a
    * hub node cannot blow up the local join: candidates ≤ 4g²·n rows, an
    * equi-join on the pivot, never the pair space. Each call strictly
    * improves (or keeps) every node's neighborhood, monotone like the
    * paper's iterate-until-converged loop; callers chain rounds. */
  def refine(edges: DataFrame, prepared: DataFrame, g: Int): DataFrame = {
    val wIn = Window.partitionBy(col("dst")).orderBy(col("cos").desc, col("src"))
    val rev = edges.withColumn("rk", row_number().over(wIn)).filter(col("rk") <= g)
      .select(col("dst").as("src"), col("src").as("dst"))
    val und = edges.select(col("src"), col("dst")).unionByName(rev).distinct()
    val coAdj = und.as("x").join(und.as("y"),
        col("x.src") === col("y.src") && col("x.dst") =!= col("y.dst"))
      .select(col("x.dst").as("src"), col("y.dst").as("dst"))
    val cands = coAdj.unionByName(edges.select(col("src"), col("dst")))
      .filter(col("src") =!= col("dst")).distinct()
    val scored = cands
      .join(prepared.as("a"), col("src") === col("a.id"))
      .join(prepared.as("b"), col("dst") === col("b.id"))
      .select(col("src"), col("dst"),
              Ann.cosine(col("a.qv"), col("b.qv"), col("a.nq"), col("b.nq")).as("cos"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= g)
      .select(col("src"), col("dst"), col("cos"))
  }

  /** Incremental ADMISSION of a new vector batch into an existing graph —
    * the index-maintenance member (the dedup family's x10/x15 pattern,
    * here for the graph): the stored corpus is never re-scanned beyond
    * the joined slices. Each new vector seeds candidates from its two
    * LSH buckets (same planes as [[build]]) and widens ONE hop through
    * the existing graph's edges — so a new vector finds neighbors even
    * when its own bucket is sparse. Returns the new→corpus edges
    * (src, dst, cos), ≤ g per new vector; append them to the stored edge
    * table, and the next [[refine]] round's REVERSE sampling propagates
    * the corpus→new direction without any rebuild. */
  def admit(edges: DataFrame, corpus: DataFrame, batch: DataFrame,
            nPlanes: Int, nTables: Int, dim: Int, g: Int): DataFrame = {
    val planes = graft.Queries.lshPlanes(nPlanes * nTables, dim)
    def bucketed(df: DataFrame): DataFrame =
      (0 until nTables).foldLeft(df) { (d, t) =>
        val bucket = (0 until nPlanes).map { j =>
          when(GraftFunctions.dot_long(col("qv"), typedLit(planes(t * nPlanes + j))) > 0,
               1L << j).otherwise(0L)
        }.reduce(_ + _)
        d.withColumn(s"b$t", bucket)
      }
    val cb = bucketed(corpus)
    val bb = bucketed(batch)
    val bucketMates = (0 until nTables).map { tb =>
      bb.as("a").join(cb.as("b"), col(s"a.b$tb") === col(s"b.b$tb"))
        .select(col("a.id").as("src"), col("b.id").as("dst"))
    }.reduce(_ unionByName _)
    val hop = bucketMates.as("m")
      .join(edges.as("e"), col("m.dst") === col("e.src"))
      .select(col("m.src"), col("e.dst"))
    val cands = bucketMates.unionByName(hop)
      .filter(col("src") =!= col("dst")).distinct()
    val scored = cands
      .join(batch.as("q"), col("src") === col("q.id"))
      .join(corpus.as("c"), col("dst") === col("c.id"))
      .select(col("src"), col("dst"),
              Ann.cosine(col("q.qv"), col("c.qv"), col("q.nq"), col("c.nq")).as("cos"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= g)
      .select(col("src"), col("dst"), col("cos"))
  }

  /** Answer top-`k` for the rows of `prepared` matching `queryFilter` by
    * one-hop graph expansion over `edges` (build() output) plus exact
    * rerank. Returns (qid, rk, nid, cos). */
  def expandTopK(edges: DataFrame, prepared: DataFrame, k: Int,
                 queryFilter: Column): DataFrame = {
    val qids = prepared.filter(queryFilter).select(col("id").as("qid"))
    val direct = qids.join(edges, col("qid") === col("src"))
      .select(col("qid"), col("dst").as("nid"))
    val hop2 = direct.as("h1")
      .join(edges.as("e2"), col("h1.nid") === col("e2.src"))
      .select(col("h1.qid"), col("e2.dst").as("nid"))
    val cands = direct.unionByName(hop2)
      .filter(col("qid") =!= col("nid")).distinct()
    val scored = cands
      .join(prepared.as("q"), col("qid") === col("q.id"))
      .join(prepared.as("c"), col("nid") === col("c.id"))
      .select(col("qid"), col("nid"),
              Ann.cosine(col("q.qv"), col("c.qv"), col("q.nq"), col("c.nq")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("nid"), col("cos"))
  }
}
