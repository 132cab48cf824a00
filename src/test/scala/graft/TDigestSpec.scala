package graft

import graft.sketch.TDigest
import org.apache.spark.sql.functions._

/** Accuracy/mergeability contract for the t-digest quantile sketch. The
  * digest is merge-order-sensitive by nature (documented), so every
  * check gates on GUARANTEED properties — rank-error bounds against the
  * exact data, size bounds, monotonicity — never on centroid values. */
class TDigestSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.95, 0.99)

  test("small inputs: weight-1 centroids interpolate the exact median") {
    val d = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("x")
      .agg(TDigest.digest($"x").as("d"))
      .head.getAs[scala.collection.Seq[Double]](0).toArray
    assert(TDigest.quantile(d, 0.5) == 3.0)
    assert(TDigest.quantile(d, 0.0) == 1.0)
    assert(TDigest.quantile(d, 1.0) == 5.0)
  }

  test("rank error stays under 2.5% at every parallelism (the a11 gate, tighter)") {
    // deterministic pseudo-random data: md5-derived doubles, heavy tail
    val data = (0 until 20000).map { i =>
      val h = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(i.toString.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString, 16)
      (h % 100000).toDouble + (if (i % 97 == 0) 1e6 else 0.0) // spikes
    }
    val sorted = data.sorted
    val n = data.size
    for (parts <- Seq(1, 4, 32)) {
      val d = data.toDF("x").repartition(parts)
        .agg(TDigest.digest($"x").as("d"))
        .head.getAs[scala.collection.Seq[Double]](0).toArray
      // size bound: < 2*delta centroids
      assert(d.length / 2 < 400, s"parts=$parts: ${d.length / 2} centroids")
      qs.foreach { q =>
        val est = TDigest.quantile(d, q)
        val rank = sorted.count(_ <= est)
        val err = math.abs(rank - q * n) / n
        assert(err <= 0.025, f"parts=$parts q=$q: rank err $err%.4f")
      }
      // monotone quantiles
      val ests = qs.map(TDigest.quantile(d, _))
      assert(ests == ests.sorted, s"parts=$parts: non-monotone $ests")
    }
  }

  test("merged shard digests meet the same bound as one digest of the union") {
    val a = (0 until 5000).map(i => (i % 997).toDouble)
    val b = (0 until 5000).map(i => ((i * 7) % 499).toDouble + 500.0)
    val all = (a ++ b).sorted
    val da = a.toDF("x").agg(TDigest.digest($"x").as("d"))
      .head.getAs[scala.collection.Seq[Double]](0).toArray
    val db = b.toDF("x").agg(TDigest.digest($"x").as("d"))
      .head.getAs[scala.collection.Seq[Double]](0).toArray
    val merged = TDigest.merge(da, db)
    assert(merged.length / 2 < 400)
    qs.foreach { q =>
      val est = TDigest.quantile(merged, q)
      val rank = all.count(_ <= est)
      assert(math.abs(rank - q * all.size) <= 0.025 * all.size,
        s"q=$q est=$est rank=$rank")
    }
  }

  test("total weight is conserved through compression and merge") {
    val d = (0 until 3000).map(_.toDouble).toDF("x")
      .agg(TDigest.digest($"x").as("d"))
      .head.getAs[scala.collection.Seq[Double]](0).toArray
    val w = (0 until d.length / 2).map(i => d(2 * i + 1)).sum
    assert(w == 3000.0)
    val m = TDigest.merge(d, d)
    assert((0 until m.length / 2).map(i => m(2 * i + 1)).sum == 6000.0)
  }
}
