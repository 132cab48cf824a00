package graft

import graft.ops.{Flow, Focal}
import graft.scan.Tile
import graft.sketch.TDigest
import org.apache.spark.sql.functions._

/** Randomized property fuzz for the round-14 operators — every case
  * checks the DISTRIBUTED result against a straight-line driver
  * recompute on randomized inputs (seeded, deterministic), at randomized
  * chunkings, the RoundThirteenFuzzSpec discipline. */
class RoundFourteenFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def mkTiles(vals: Array[Double], g: Int, chunk: Int): Seq[Tile] = {
    val nc = (g + chunk - 1) / chunk
    for (yc <- 0 until nc; xc <- 0 until nc) yield {
      val h = math.min(chunk, g - yc * chunk)
      val w = math.min(chunk, g - xc * chunk)
      val px = Array.tabulate(h * w) { i =>
        vals((yc * chunk + i / w) * g + xc * chunk + i % w)
      }
      Tile(0, 0, "g", 0L, yc, xc, 0, 0, h, w, px)
    }
  }

  test("gaussSum5x5 fuzz: random fields with NaN holes == dense recompute, any chunking") {
    val w5 = Array(1.0, 4.0, 6.0, 4.0, 1.0)
    for (seed <- Seq(5, 19, 104)) {
      val rnd = new scala.util.Random(seed)
      val g = 24 + rnd.nextInt(17)             // 24..40
      val chunk = Seq(6, 8, 12)(rnd.nextInt(3)) // > depth 2
      val vals = Array.tabulate(g * g)(_ =>
        if (rnd.nextInt(17) == 0) Double.NaN else rnd.nextInt(100).toDouble)
      val tiles = spark.createDataset(mkTiles(vals, g, chunk))
      val out = Focal.gaussSum5x5(tiles, chunk, chunk, g, g).collect()
      val got = Array.fill(g * g)(Double.NaN)
      out.foreach { t =>
        for (r <- 0 until t.height; c <- 0 until t.width)
          got((t.yChunk * chunk + r) * g + t.xChunk * chunk + c) =
            t.pixels(r * t.width + c)
      }
      for (r <- 0 until g; c <- 0 until g) {
        val want =
          if (r < 2 || r > g - 3 || c < 2 || c > g - 3) Double.NaN
          else {
            var s = 0.0; var ok = true
            for (dr <- -2 to 2; dc <- -2 to 2) {
              val v = vals((r + dr) * g + c + dc)
              if (v.isNaN) ok = false else s += w5(dr + 2) * w5(dc + 2) * v
            }
            if (ok) s else Double.NaN
          }
        val gv = got(r * g + c)
        assert(gv == want || (gv.isNaN && want.isNaN),
          s"seed $seed chunk $chunk ($r,$c): got $gv want $want")
      }
    }
  }

  test("flow accumulate + strahler fuzz: random functional forests == driver replay") {
    for (seed <- Seq(3, 42, 777)) {
      val rnd = new scala.util.Random(seed)
      val n = 60 + rnd.nextInt(80)
      // random DAG-forest: node i may point at a LOWER-numbered node
      // (strictly decreasing ids => acyclic, <= 1 out-edge => functional)
      val es = (1 until n).flatMap { i =>
        if (rnd.nextInt(4) == 0) None else Some((i.toLong, rnd.nextInt(i).toLong))
      }
      if (es.nonEmpty) {
        val edf = es.toDF("src", "dst")
        // accumulation replay: walk every node's path, count arrivals
        val next = es.toMap
        val wantAcc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        next.keys.foreach { u =>
          var v = u
          while (next.contains(v)) { v = next(v); wantAcc(v) += 1 }
        }
        val gotAcc = Flow.accumulate(edf, rounds = 256)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotAcc == wantAcc.toMap, s"seed $seed accumulate")
        // strahler replay: memoized recursion over children
        val children = es.groupBy(_._2).map { case (v, ps) => v -> ps.map(_._1) }
        val memo = scala.collection.mutable.Map.empty[Long, Long]
        def orderOf(v: Long): Long = memo.getOrElseUpdate(v, {
          children.get(v) match {
            case None => 1L
            case Some(cs) =>
              val os = cs.map(orderOf); val m = os.max
              if (os.count(_ == m) >= 2) m + 1 else m
          }
        })
        val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
        val wantOrd = nodes.map(v => v -> orderOf(v)).toMap
        val gotOrd = Flow.strahler(edf, rounds = 256)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotOrd == wantOrd, s"seed $seed strahler")
      }
    }
  }

  test("marchingSquaresCase fuzz: random thresholds == dense corner-bit replay") {
    for (seed <- Seq(8, 61)) {
      val rnd = new scala.util.Random(seed)
      val g = 16 + rnd.nextInt(17)
      val chunk = Seq(4, 8)(rnd.nextInt(2))
      val thr = 20.0 + rnd.nextInt(60)
      val vals = Array.tabulate(g * g)(_ => rnd.nextInt(100).toDouble)
      val tiles = spark.createDataset(mkTiles(vals, g, chunk))
      val out = Focal.marchingSquaresCase(tiles, chunk, chunk, g, g, thr).collect()
      out.foreach { t =>
        for (r <- 0 until t.height; c <- 0 until t.width) {
          val gr = t.yChunk * chunk + r; val gc = t.xChunk * chunk + c
          val gv = t.pixels(r * t.width + c)
          if (gr >= 1 && gr <= g - 2 && gc >= 1 && gc <= g - 2) {
            var cs = 0
            if (vals(gr * g + gc) >= thr) cs |= 8
            if (vals(gr * g + gc + 1) >= thr) cs |= 4
            if (vals((gr + 1) * g + gc + 1) >= thr) cs |= 2
            if (vals((gr + 1) * g + gc) >= thr) cs |= 1
            assert(gv == cs.toDouble, s"seed $seed ($gr,$gc)")
          } else assert(gv.isNaN)
        }
      }
    }
  }

  test("t-digest fuzz: rank bound holds across distributions and partitionings") {
    for ((seed, shape) <- Seq((11, "uniform"), (23, "zipf"), (99, "bimodal"))) {
      val rnd = new scala.util.Random(seed)
      val data = shape match {
        case "uniform" => IndexedSeq.fill(8000)(rnd.nextDouble() * 1000)
        case "zipf"    => IndexedSeq.fill(8000)(1.0 / (1e-4 + rnd.nextDouble()))
        case _         => IndexedSeq.fill(8000)(
          if (rnd.nextBoolean()) rnd.nextDouble() else 500 + rnd.nextDouble())
      }
      val sorted = data.sorted
      val parts = 1 + rnd.nextInt(16)
      val d = data.toDF("x").repartition(parts)
        .agg(TDigest.digest($"x").as("d"))
        .head.getAs[scala.collection.Seq[Double]](0).toArray
      assert(d.length / 2 < 400, s"$shape size")
      for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
        val est = TDigest.quantile(d, q)
        val rank = sorted.count(_ <= est)
        assert(math.abs(rank - q * data.size) <= 0.025 * data.size,
          s"$shape parts=$parts q=$q")
      }
    }
  }
}
