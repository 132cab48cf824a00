package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.graph.{KCore, Triangles}
import graft.ops.Sample

/** Randomized property fuzz for the round-13 operators: each op is
  * checked against a straight-line driver-side reference on seeded
  * random inputs (the AccumulateSpec / RoundTenFuzzSpec discipline). */
class RoundThirteenFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def randomGraph(rng: Random, n: Int, p: Double): Seq[(Long, Long)] =
    (for {
      u <- 0 until n; v <- (u + 1) until n
      if rng.nextDouble() < p
    } yield (u.toLong, v.toLong))

  test("triangles == brute-force triple enumeration (15 seeded graphs)") {
    for (seed <- 1 to 15) {
      val rng = new Random(seed)
      val es = randomGraph(rng, 24, 0.22)
      val eset = es.toSet
      val want = (for {
        x <- 0L until 24L; y <- (x + 1) until 24L; z <- (y + 1) until 24L
        if eset((x, y)) && eset((x, z)) && eset((y, z))
      } yield (x, y, z)).toSet
      val got = Triangles.triangles(es.toDF("u", "v")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("k-core == sequential peel reference (12 seeded graphs, k in 2..4)") {
    for (seed <- 1 to 12) {
      val rng = new Random(100 + seed)
      val es = randomGraph(rng, 30, 0.12)
      val k = 2 + seed % 3
      // reference: peel to fixed point, then report degrees
      var adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
      es.foreach { case (u, v) => adj(u) = adj(u) + v; adj(v) = adj(v) + u }
      var changed = true
      while (changed) {
        val drop = adj.collect { case (n, s) if s.size < k => n }.toSet
        changed = drop.nonEmpty
        drop.foreach { n => adj(n).foreach(m => adj(m) = adj(m) - n); adj.remove(n) }
      }
      val want = adj.map { case (n, s) => (n, s.size.toLong) }.toSet
      val got = KCore.coreDegrees(es.toDF("u", "v"), k, rounds = 30).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"seed $seed k=$k")
    }
  }

  test("ppsBernoulli == the exact integer inclusion test replayed on the driver") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def u32(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    for (seed <- 1 to 8) {
      val rng = new Random(200 + seed)
      val rows = (0 until 400).map(i => (s"g${i % 3}", i.toLong, 1L + rng.nextInt(500)))
      val k = 10 + seed * 7
      val totals = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val want = rows.collect {
        case (g, id, w) if BigInt(u32(id)) * totals(g) < BigInt(4294967296L) * k * w => id
      }.toSet
      val got = Sample.ppsBernoulli(rows.toDF("grp", "id", "w"), "grp", col("id"), "w", k)
        .select("id").as[Long].collect().toSet
      assert(got === want, s"seed $seed k=$k")
    }
  }

  test("knn-graph build == driver replay of buckets, candidates, and top-g (4 seeds)") {
    import graft.ann.{Ann, KnnGraph}
    val planes = Queries.lshPlanes(8, 16)
    for (seed <- 1 to 4) {
      val rng = new Random(300 + seed)
      val vecs = (0 until 60).map { i =>
        (i.toLong, Array.fill(16)((rng.nextDouble() * 2 - 1).toFloat).toSeq)
      }
      val df = vecs.toDF("vec_id", "embedding")
      val got = KnnGraph.build(Ann.prepare(df, "vec_id", "embedding"),
          nPlanes = 4, nTables = 2, dim = 16, g = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // driver reference with the identical integer-quantized convention
      val q = vecs.map { case (id, e) => id -> e.map(x => math.round(x.toDouble * 10000)).toArray }.toMap
      def dot(a: Array[Long], b: Array[Long]): Long = a.zip(b).map { case (x, y) => x * y }.sum
      def cosine(a: Long, b: Long): Double = {
        val qa = q(a); val qb = q(b)
        BigDecimal(dot(qa, qb).toDouble / (math.sqrt(dot(qa, qa).toDouble) * math.sqrt(dot(qb, qb).toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      def bucket(id: Long, table: Int): Long =
        (0 until 4).map { j =>
          if (dot(q(id), planes(table * 4 + j).toArray) > 0) 1L << j else 0L
        }.sum
      val want = vecs.map(_._1).flatMap { src =>
        val cands = vecs.map(_._1).filter(d => d != src &&
          (bucket(d, 0) == bucket(src, 0) || bucket(d, 1) == bucket(src, 1)))
        cands.map(d => (d, cosine(src, d))).sortBy { case (d, c) => (-c, d) }
          .take(3).map { case (d, c) => (src, d, c) }
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }
}
