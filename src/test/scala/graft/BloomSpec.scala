package graft

import org.apache.spark.sql.functions._
import graft.sketch.Bloom

/** Bloom filter laws: no false negatives ever, false positives near the
  * analytic rate, dense words == table bits, 63-bit words keep every
  * value non-negative (the cross-engine shift-safety invariant). */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val m = 4096
  private val k = 3
  private lazy val members = (0 until 300).map(i => s"member-$i")
  private lazy val absent = (0 until 1000).map(i => s"absent-$i")
  private lazy val bt = Bloom.table(members.toDF("v"), $"v", m, k).cache()
  private lazy val w = Bloom.words(bt, m)

  test("no false negatives: every inserted value probes true") {
    val got = members.toDF("v")
      .filter(!Bloom.mightContain($"v", w, m, k)).count()
    assert(got == 0)
  }

  test("false positives stay near the analytic rate; absence prunes") {
    val fp = absent.toDF("v")
      .filter(Bloom.mightContain($"v", w, m, k)).count()
    // (1 - e^(-kn/m))^k with n=300, m=4096, k=3 => ~0.7%; allow 4x slack
    val expect = math.pow(1 - math.exp(-k.toDouble * members.size / m), k)
    assert(fp <= math.max(10L, (4 * expect * absent.size).toLong),
      s"fp=$fp expect~${expect * absent.size}")
    assert(fp < absent.size / 10, "bloom must actually prune")
  }

  test("words: dense array equals the table's bits; absent words are 0; all non-negative") {
    val fromTable = bt.collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    w.zipWithIndex.foreach { case (word, i) =>
      assert(word == fromTable.getOrElse(i, 0L), s"word $i")
      assert(word >= 0L, s"word $i uses the sign bit — 63-bit invariant broken")
    }
    assert(w.length == (m + 62) / 63)
  }

  test("mightContain == a join-based membership replay on the word table") {
    val probes = (members.take(50) ++ absent.take(150)).toDF("v")
    val viaLit = probes.withColumn("mc", Bloom.mightContain($"v", w, m, k))
      .select($"v", $"mc").collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // independent replay: explode k positions, join the word table, AND bits
    val pos = probes.select($"v", explode(array((0 until k).map(j =>
        pmod(conv(substring(md5(concat(lit(s"$j|"), $"v")), 1, 15), 16, 10)
          .cast("long"), lit(m.toLong))): _*)).as("pos"))
      .select($"v", floor($"pos" / 63).cast("long").as("word_idx"),
              pmod($"pos", lit(63L)).cast("int").as("bit"))
    val viaJoin = pos.join(bt, Seq("word_idx"), "left")
      .select($"v", (coalesce($"word", lit(0L))
        .bitwiseAND(call_function("shiftleft", lit(1L), $"bit")) =!= 0L).as("hit"))
      .groupBy($"v").agg((sum(when($"hit", 1).otherwise(0)) === k).as("mc"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(viaLit == viaJoin)
  }

  test("words refuses an un-model-sized m, loudly") {
    val e = intercept[IllegalArgumentException] {
      Bloom.words(bt, m = 1 << 30, maxWords = 1024)
    }
    assert(e.getMessage.contains("maxWords"))
  }
}
