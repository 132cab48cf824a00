package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.dedup.Dedup
import scala.util.Random

/** The native one-pass [[org.apache.spark.sql.graftx.NgramHash]] kernel must
  * be value-identical to the declarative built-ins chain it replaced
  * (split → transform/concat_ws grams → md5-prefix hash → sort/distinct),
  * because every dedup/decontamination oracle replays that chain in SQL. */
class NgramHashSpec extends SparkSpec {

  private val edgeCases = Seq(
    "",                       // one empty token
    " ",                      // two empty tokens
    "a",                      // single token
    "a b",                    // minimal bigram
    "a  b",                   // consecutive spaces -> empty middle token
    " a b ",                  // leading + trailing empties
    "über größe naïve café",  // multi-byte UTF-8
    "a a a a a",              // repeats -> distinct collapses
    "tok1 tok2 tok3 tok4 tok5 tok6"
  )

  private def randomDocs(n: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    (0 until n).map { _ =>
      val words = (0 until rnd.nextInt(40)).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
      words.mkString(" ")
    }
  }

  test("shingle_hashes equals the declarative chain on edge cases and random docs") {
    import spark.implicits._
    for (n <- Seq(1, 2, 3, 5)) {
      val df = (edgeCases ++ randomDocs(200, seed = 42 * n)).toDF("text")
        .filter(size(split($"text", " ")) >= n) // declarative form requires >= n tokens
        .select(
          GraftFunctions.shingle_hashes($"text", n).as("fast"),
          Dedup.shinglesDeclarative($"text", n).as("slow"))
      val bad = df.filter(not($"fast" <=> $"slow")).count()
      assert(bad == 0, s"n=$n: native shingle_hashes diverges from declarative chain")
    }
  }

  test("ngram_hashes (raw) preserves order and multiplicity") {
    import spark.implicits._
    val toksN = 2
    val df = (edgeCases ++ randomDocs(200, seed = 7)).toDF("text")
      .filter(size(split($"text", " ")) >= toksN)
      .select(
        GraftFunctions.ngram_hashes($"text", toksN).as("fast"),
        {
          val toks = split($"text", " ")
          transform(sequence(lit(0), size(toks) - toksN),
            i => Dedup.tokenHash(concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
        }.as("slow"))
    val bad = df.filter(not($"fast" <=> $"slow")).count()
    assert(bad == 0, "raw ngram_hashes diverges from per-gram md5 chain")
  }

  test("fewer than n tokens yields an empty array, null stays null") {
    import spark.implicits._
    val rows = Seq(Some("a b"), Some("a"), Some(""), None).toDF("text")
      .select(GraftFunctions.shingle_hashes($"text", 3).as("h"))
      .collect()
    assert(rows(0).getSeq[Long](0).isEmpty)  // 2 tokens < 3
    assert(rows(1).getSeq[Long](0).isEmpty)
    assert(rows(2).getSeq[Long](0).isEmpty)
    assert(rows(3).isNullAt(0))
  }

  test("minhash_sig equals the declarative signature on random docs") {
    import spark.implicits._
    // Every in-repo caller uses shingleN = 1 (token sets); parity-check that
    // shape. (For n >= 2 the declarative form was undefined on short docs —
    // sequence(0, negative) — while the kernel returns null mins.)
    val docs = (edgeCases ++ randomDocs(300, seed = 99)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    val fast = Dedup.minhashSignature(df, "id", "text", numHashes = 8)
    val slow = Dedup.minhashSignatureDeclarative(df, "id", "text", numHashes = 8)
    assert(fast.schema == slow.schema)
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      "native minhash_sig diverges from declarative array_min(md5) chain")
  }

  test("minhash_sig kernel is evaluated once per row, not once per h_i") {
    // A non-foldable (parquet-backed) input: a literal relation would be
    // constant-folded away and make the assertion vacuous.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = Dedup.minhashSignature(docs, "doc_id", "text", 8)
    val plan = df.queryExecution.optimizedPlan.toString
    val hits = "minhash_sig".r.findAllIn(plan).length
    assert(hits == 1, s"expected 1 minhash_sig in optimized plan, found $hits:\n$plan")
  }

  test("SQL registration: shingle_hashes/ngram_hashes callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT size(shingle_hashes('a b c d', 2)) s, size(ngram_hashes('a b a b', 2)) r")
      .collect()(0)
    assert(r.getInt(0) == 3 && r.getInt(1) == 3)
  }
}
