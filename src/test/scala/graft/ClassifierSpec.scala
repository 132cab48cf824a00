package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.Classifier

/** Oracle tests for the NB quality/topic classifier
  * ([[graft.text.Classifier]]): hand-checked NB math on a tiny corpus,
  * determinism, and the planted-signal learnability contract on the
  * sf0.01 documents slice (the t15 teacher task). */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def toy: DataFrame = Seq(
    (0L, "spam", "win free prize"),
    (1L, "spam", "win win offer"),
    (2L, "ham", "meeting notes attached"),
    (3L, "ham", "lunch notes")
  ).toDF("id", "label", "text")

  test("NB weights match the closed form on a hand-checked corpus") {
    val B = 32
    val model = Classifier.trainNaiveBayes(toy, "label", "text", 1, B, 6)
      .as[(String, Long, Long)].collect()
      .map { case (l, b, w) => (l, b) -> w }.toMap
    assert(model.size === 2 * (B + 1))
    // recompute one real bucket by hand: 'win' appears 3x in spam's
    // 6 grams, 0x in ham's 5 grams
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest("win".getBytes("UTF-8"))
    val h = (d.take(8).foldLeft(0L)((a, x) => (a << 8) | (x & 0xffL)) >>> 4) % B
    def q(p: Double): Long = math.floor(math.log(p) * 1e6 + 0.5).toLong
    assert(model(("spam", h)) === q(4.0 / (6 + B)))
    assert(model(("ham", h)) === q(1.0 / (5 + B)))
    // prior rows at bucket = B: balanced corpus, ln(1/2) each
    assert(model(("spam", B.toLong)) === q(0.5))
    assert(model(("ham", B.toLong)) === q(0.5))
  }

  test("predict recovers the classes and carries the prior via bias") {
    val model = Classifier.trainNaiveBayes(toy, "label", "text", 1, 32, 6)
    val got = Classifier.predict(toy, "id", "text", 1, 32, model)
      .join(toy.select($"id", $"label"), Seq("id"))
      .select($"id", $"pred", $"label").as[(Long, String, String)]
      .collect().sortBy(_._1)
    assert(got.forall { case (_, p, t) => p == t },
      s"misclassified: ${got.filterNot(r => r._2 == r._3).mkString(",")}")
    // an empty doc still predicts: split("") yields ONE empty token, so
    // the evidence is a single unseen gram — Laplace smoothing favors
    // the class with the smaller gram census (ham: ln(1/(5+32)) >
    // spam: ln(1/(6+32))); priors are equal
    val empty = Seq((9L, "")).toDF("id", "text")
    val p = Classifier.predict(empty, "id", "text", 1, 32, model)
      .select($"pred").as[String].collect()
    assert(p === Array("ham"))
  }

  /** The t15 teacher corpus: plant a 3-token topical vocabulary per
    * class (class = doc_id % 3) — two planted tokens appended per doc,
    * chosen by doc_id arithmetic. */
  private def planted: DataFrame =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"doc_id",
        element_at(
          array(lit("ads"), lit("news"), lit("code")),
          ($"doc_id" % 3 + 1).cast("int")).as("truth"),
        concat($"text", lit(" "),
          expr("""element_at(element_at(
                    array(array('win','free','prize'),
                          array('today','report','city'),
                          array('func','var','loop')),
                    cast(doc_id % 3 + 1 as int)),
                  cast((doc_id div 3) % 3 + 1 as int))"""),
          lit(" "),
          expr("""element_at(element_at(
                    array(array('win','free','prize'),
                          array('today','report','city'),
                          array('func','var','loop')),
                    cast(doc_id % 3 + 1 as int)),
                  cast((doc_id div 9) % 3 + 1 as int))""")).as("text2"))

  test("learnability contract: planted signal -> 1.0, no signal -> chance") {
    val docs = planted.cache()
    val train = docs.filter($"doc_id" % 2 === 0)
    val test = docs.filter($"doc_id" % 2 =!= 0)
    val model = Classifier.trainNaiveBayes(train, "truth", "text2", 1, 256, 6)
    val n = test.count().toDouble
    val acc = Classifier.predict(test, "doc_id", "text2", 1, 256, model)
      .join(test.select($"doc_id", $"truth"), Seq("doc_id"))
      .filter($"pred" === $"truth").count() / n
    // deterministic pipeline: measured exactly 1.0 on the planted task
    assert(acc >= 0.98, s"planted-signal held-out accuracy = $acc")
    // ablation: score the UNPLANTED text under the same model — the
    // base corpus is class-free by construction, so accuracy collapses
    // to chance (measured 0.344 at sf0.01); this proves t15's accuracy
    // comes from LEARNED evidence, not leakage through the label rule
    val raw = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter($"doc_id" % 2 =!= 0)
    val acc0 = Classifier.predict(raw, "doc_id", "text", 1, 256, model)
      .join(docs.select($"doc_id", $"truth"), Seq("doc_id"))
      .filter($"pred" === $"truth").count() / n
    assert(acc0 < 0.5, s"no-signal accuracy should be ~chance, got $acc0")
    docs.unpersist()
  }

  test("training and prediction are deterministic across runs") {
    val docs = planted
    val train = docs.filter($"doc_id" % 2 === 0)
    def run(): Map[(String, Long), Long] =
      Classifier.trainNaiveBayes(train, "truth", "text2", 1, 256, 6)
        .as[(String, Long, Long)].collect()
        .map { case (l, b, w) => (l, b) -> w }.toMap
    assert(run() === run())
  }
}
