package graft

import org.apache.spark.sql.functions._
import graft.sketch.{Hll, Kmv}

/** HLL sketch: pinned against a pure-Scala register replay, parallelism
  * invariance (merge associativity), and accuracy bands vs exact counts.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private val P = 8
  private val W = 60 - P

  /** Driver-side replay of the aggregator from raw 60-bit hashes. */
  private def replay(hashes: Seq[Long]): (Long, Long) = {
    val regs = new Array[Int](1 << P)
    hashes.foreach { h =>
      val bucket = (h >>> W).toInt
      val rest = h & ((1L << W) - 1)
      val rank = if (rest == 0L) W + 1 else W + java.lang.Long.numberOfLeadingZeros(rest) - 63
      if (rank > regs(bucket)) regs(bucket) = rank
    }
    val s = regs.map(r => 1L << (W + 1 - r)).sum
    (s, regs.count(_ == 0).toLong)
  }

  private def md5hash60(v: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("sketch matches a driver-side register replay") {
    val vals = (0L until 5000L).map(v => v * 7919L % 100000L)
    val df = vals.toDF("v")
    val got = df.agg(Hll.sketch(Kmv.hash60($"v"), P).as("h"))
      .select($"h._1", $"h._2").collect()(0)
    val want = replay(vals.distinct.map(md5hash60))
    assert((got.getLong(0), got.getLong(1)) === want)
  }

  test("merge is associative: identical at any parallelism") {
    val df = (0L until 20000L).toDF("v")
    def run(parts: Int) = df.repartition(parts)
      .agg(Hll.sketch(Kmv.hash60($"v"), P).as("h"),
           floor(Hll.estimate(col("h"), P) * 1000.0 + 0.5).as("em"))
      .select($"h._1", $"h._2", $"em").collect()(0)
    assert(run(1) === run(13))
  }

  test("estimate lands inside the 3-sigma HLL band") {
    val n = 20000
    val df = (0L until n.toLong).map(v => v % 10000L).toDF("v") // 10k distinct
    val est = df.agg(Hll.estimate(Hll.sketch(Kmv.hash60($"v"), P), P))
      .collect()(0).getDouble(0)
    val sigma = 1.04 / math.sqrt(1 << P) // ~6.5% at p=8
    assert(math.abs(est - 10000.0) < 3 * sigma * 10000.0)
  }

  test("small cardinalities take the linear-counting branch and stay tight") {
    val df = (0L until 50L).toDF("v")
    val est = df.agg(Hll.estimate(Hll.sketch(Kmv.hash60($"v"), P), P))
      .collect()(0).getDouble(0)
    assert(math.abs(est - 50.0) < 5.0) // LC at n << m is near-exact
  }

  test("p=4 uses Flajolet's small-m alpha (0.673), not the m>=128 constant") {
    // enough distinct values that the raw (non-LC) branch is taken:
    // raw >= 2.5*m = 40 needs n >> m = 16
    val n = 5000
    val df = (0L until n.toLong).toDF("v")
    val got = df.agg(Hll.sketch(Kmv.hash60($"v"), 4).as("h"),
        Hll.estimate(col("h"), 4).as("est"))
      .select($"h._1", $"est").collect()(0)
    val s = got.getLong(0).toDouble
    val m = 16.0
    val want = 0.673 * m * m * math.pow(2.0, 57) / s // w+1 = 57 at p=4
    assert(math.abs(got.getDouble(1) - want) < 1e-6 * want)
    // and the biased large-m constant would have been a different number
    val biased = (0.7213 / (1.0 + 1.079 / m)) * m * m * math.pow(2.0, 57) / s
    assert(math.abs(biased - want) > 1e-3 * want)
  }
}
