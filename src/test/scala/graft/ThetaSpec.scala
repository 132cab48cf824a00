package graft

import org.apache.spark.sql.functions._
import graft.sketch.{Kmv, Theta}

/** Theta-sketch set operations: exact regime, sampling identities,
  * accuracy vs ground truth, and parallelism invariance. */
class ThetaSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private def toks = spark.read.parquet(s"$dir/documents.parquet")
    .select($"doc_id", explode(split($"text", " ")).as("tok"))
    .filter(length($"tok") > 0)
    .select(($"doc_id" % 2 === 0).as("side"), $"tok", Kmv.hash60($"tok").as("h"))

  private def ests(k: Int) = {
    val sk = toks.groupBy($"side").agg(Theta.sketch($"h", k).as("sk"))
    sk.filter($"side").select($"sk".as("ska"))
      .crossJoin(sk.filter(!$"side").select($"sk".as("skb")))
      .select(
        Theta.distinctEstimate($"ska", k).as("a"),
        Theta.distinctEstimate($"skb", k).as("b"),
        Theta.unionEstimate($"ska", $"skb", k).as("u"),
        Theta.intersectEstimate($"ska", $"skb", k).as("i"),
        Theta.diffEstimate($"ska", $"skb", k).as("dab"),
        Theta.diffEstimate($"skb", $"ska", k).as("dba"))
      .collect().head
  }

  private lazy val truth = {
    val da = toks.filter($"side").select($"tok").distinct().count()
    val db = toks.filter(!$"side").select($"tok").distinct().count()
    val du = toks.select($"tok").distinct().count()
    (da, db, du, da + db - du) // inclusion-exclusion intersection
  }

  test("exact regime: k above the distinct count reproduces exact set algebra") {
    // tiny controlled sets: A = {a..f}, B = {d..i}; k = 64 >> |A ∪ B|
    val df = Seq(
      ("A", "a"), ("A", "b"), ("A", "c"), ("A", "d"), ("A", "e"), ("A", "f"),
      ("B", "d"), ("B", "e"), ("B", "f"), ("B", "g"), ("B", "h"), ("B", "i"))
      .toDF("s", "v").select($"s", Kmv.hash60($"v").as("h"))
    val sk = df.groupBy($"s").agg(Theta.sketch($"h", 64).as("sk"))
    val r = sk.filter($"s" === "A").select($"sk".as("ska"))
      .crossJoin(sk.filter($"s" === "B").select($"sk".as("skb")))
      .select(Theta.unionEstimate($"ska", $"skb", 64).as("u"),
        Theta.intersectEstimate($"ska", $"skb", 64).as("i"),
        Theta.diffEstimate($"ska", $"skb", 64).as("dab"),
        Theta.diffEstimate($"skb", $"ska", 64).as("dba"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((9L, 3L, 3L, 3L)))
  }

  test("k=256 estimates land within 25% of the exact token-set algebra") {
    val (da, db, du, di) = truth
    val r = ests(256)
    def within(est: Long, exact: Long, tol: Double): Unit =
      assert(math.abs(est - exact).toDouble <= tol * exact,
        s"estimate $est vs exact $exact")
    within(r.getLong(0), da, 0.25)
    within(r.getLong(1), db, 0.25)
    within(r.getLong(2), du, 0.25)
    within(r.getLong(3), di, 0.35) // intersection has the widest variance
  }

  test("sketch aggregation is parallelism-invariant (1 vs 13 partitions)") {
    def run(parts: Int): Seq[Seq[Long]] =
      toks.repartition(parts).groupBy($"side").agg(Theta.sketch($"h", 64).as("sk"))
        .orderBy($"side").collect().map(_.getSeq[Long](1)).toSeq
    assert(run(1) === run(13))
  }

  test("sample-domain partition identity: intersect + diff counts cover each side below theta") {
    val sk = toks.groupBy($"side").agg(Theta.sketch($"h", 64).as("sk"))
    val r = sk.filter($"side").select($"sk".as("ska"))
      .crossJoin(sk.filter(!$"side").select($"sk".as("skb")))
      .select($"ska", $"skb",
        least(Theta.theta($"ska", 64), Theta.theta($"skb", 64)).as("th"))
      .select(
        size(filter($"ska", h => h < $"th")).as("na"),
        size(filter(array_intersect($"ska", $"skb"), h => h < $"th")).as("ni"),
        size(filter(array_except($"ska", $"skb"), h => h < $"th")).as("nd"))
      .collect().head
    assert(r.getInt(0) === r.getInt(1) + r.getInt(2))
  }
}
