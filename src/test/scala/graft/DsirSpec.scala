package graft

import graft.text.Dsir

class DsirSpec extends SparkSpec {

  private val B = 64

  /** Same 60-bit md5 gram hash as the engine (Dedup.tokenHash family). */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def buckets(text: String): Seq[Long] = {
    val tk = text.split(" ", -1)
    (0 until tk.length - 1).map(i => h60(tk(i) + " " + tk(i + 1)) % B)
  }

  private val fixture = Seq(
    (0L, "en", "the cat sat on the mat"),
    (1L, "en", "the cat sat"),
    (2L, "de", "der hund lief weiter"),
    (3L, "de", "the cat sat weiter"), // target-looking text in the raw slice
    (4L, "en", "x"),                  // gram-less: must still get a row
    (5L, "zh", "on the mat the cat"))

  private def counts(rows: Seq[(Long, String, String)]): (Map[Long, Long], Long) = {
    val all = rows.flatMap(r => buckets(r._3))
    (all.groupBy(identity).map { case (b, o) => b -> o.size.toLong }, all.size.toLong)
  }

  test("affinityScores matches a driver-side integer replay") {
    import spark.implicits._
    val df = fixture.toDF("doc_id", "lang", "text")
    val tc = Dsir.bucketCounts(df.filter($"lang" === "en"), "text", 2, B)
    val rc = Dsir.bucketCounts(df, "text", 2, B)
    val got = Dsir.affinityScores(df, "doc_id", "text", tc, rc, 2, B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toMap2
    val (tCnt, tt) = counts(fixture.filter(_._2 == "en"))
    val (rCnt, rt) = counts(fixture)
    def q(c: Long, tot: Long): Long = (1000000000L * (c + 1)) / (tot + B)
    val want = fixture.map { case (id, _, text) =>
      val bs = buckets(text)
      id -> (bs.map(b => q(tCnt.getOrElse(b, 0L), tt) - q(rCnt.getOrElse(b, 0L), rt)).sum,
             bs.size.toLong)
    }.toMap
    assert(got == want)
  }

  test("logRatioWeights matches a driver-side replay (shared Java log)") {
    import spark.implicits._
    val df = fixture.toDF("doc_id", "lang", "text")
    val tc = Dsir.bucketCounts(df.filter($"lang" === "en"), "text", 2, B)
    val rc = Dsir.bucketCounts(df, "text", 2, B)
    val got = Dsir.logRatioWeights(df, "doc_id", "text", tc, rc, 2, B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toMap2
    val (tCnt, tt) = counts(fixture.filter(_._2 == "en"))
    val (rCnt, rt) = counts(fixture)
    def d(b: Long): Long =
      math.floor((math.log((tCnt.getOrElse(b, 0L) + 1).toDouble / (tt + B).toDouble) -
                  math.log((rCnt.getOrElse(b, 0L) + 1).toDouble / (rt + B).toDouble))
        * 1e9 + 0.5).toLong
    val want = fixture.map { case (id, _, text) =>
      val bs = buckets(text)
      id -> (bs.map(d).sum, bs.size.toLong)
    }.toMap
    assert(got == want)
    // the target-slice docs outrank the pure-background doc
    val w = got.map { case (id, (wt, _)) => id -> wt }
    assert(w(0L) > w(2L) && w(1L) > w(2L))
  }

  test("resample: Gumbel-top-k matches a driver-side replay; selection is ∝ exp(weight)") {
    import spark.implicits._
    // weights spanning several orders so the noise matters but cannot
    // completely drown the signal
    val rows = (0L until 100L).map(id => (id, (id % 10) * 2000000L - 9000000L))
    val df = rows.toDF("doc_id", "weight")
    val got = Dsir.resample(df, "doc_id", "weight", k = 20,
        quantDigits = 6, seed = 7L)
      .orderBy($"gkey".desc, $"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // replay: u = (first 52 md5 bits of "id:7" + 0.5)/2^52, g = -ln(-ln u)
    def h52(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(13), 16)
    }
    val want = rows.map { case (id, w) =>
      val u = (h52(s"$id:7") + 0.5) / 4503599627370496.0
      val g = -math.log(-math.log(u))
      (id, w, math.floor((w / 1e6 + g) * 1e6 + 0.5).toLong)
    }.sortBy { case (id, _, k) => (-k, id) }.take(20)
    assert(got == want)
    // the keys are finite and the draw leans toward heavy weights:
    // mean weight of the selected 20 must exceed the corpus mean
    assert(got.map(_._2).sum / 20.0 > rows.map(_._2).sum / 100.0)
    // determinism: same seed -> same set; different seed -> (almost
    // surely) a different set
    val again = Dsir.resample(df, "doc_id", "weight", k = 20,
        quantDigits = 6, seed = 7L).collect().map(_.getLong(0)).toSet
    assert(again == got.map(_._1).toSet)
    val other = Dsir.resample(df, "doc_id", "weight", k = 20,
        quantDigits = 6, seed = 8L).collect().map(_.getLong(0)).toSet
    assert(other != got.map(_._1).toSet)
  }

  test("scores are invariant under partitioning") {
    import spark.implicits._
    val df = fixture.toDF("doc_id", "lang", "text")
    def run(parts: Int): Seq[(Long, Long, Long)] = {
      val d = df.repartition(parts)
      val tc = Dsir.bucketCounts(d.filter($"lang" === "en"), "text", 2, B)
      val rc = Dsir.bucketCounts(d, "text", 2, B)
      Dsir.affinityScores(d, "doc_id", "text", tc, rc, 2, B)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    assert(run(1) == run(7))
  }

  private implicit class Map2[A, B1, C](rows: Array[(A, B1, C)]) {
    def toMap2: Map[A, (B1, C)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
