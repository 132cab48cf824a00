package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) vocabulary induction — the
  * SentencePiece/GPT-2 tokenizer TRAINING step (Sennrich et al. 2016),
  * in the shape every large-corpus trainer actually uses: the corpus is
  * reduced ONCE to the distinct-word frequency table, and the merge loop
  * runs entirely over that table — pair statistics are weighted by word
  * frequency, so a 100 TB corpus pays one corpus-sized groupBy total,
  * then k rounds over a vocabulary-sized frame (the word-form table is
  * bounded by the language, not the corpus; same discipline as
  * `Ann.kmeans`: per-round driver state is ONE (a,b,count) scalar — the
  * argmax pair — and the loop-carried frame is localCheckpoint-truncated
  * so the plan stays O(1) in rounds).
  *
  * Merge semantics are the standard greedy left-to-right non-overlapping
  * replace ("aaaa" + (a,a) -> "aa","aa"): a fold that merges the
  * accumulator's last symbol with the incoming one iff they equal the
  * round's pair — after a merge the new symbol can itself merge again
  * only on a LATER round, exactly BPE's definition. Ties in pair counts
  * break deterministically by (count desc, left, right) so training is
  * reproducible across engines and parallelism.
  *
  * Returns the learned merge table: (rank, left, right, merged, c) with
  * rank 1..numMerges — the artifact a tokenizer ships.
  */
object Bpe {

  def train(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    // the ONE corpus-sized pass: token -> frequency
    val words = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // symbol sequences start as characters
    var syms = words.select(col("w"), col("cnt"),
        expr("transform(sequence(0, length(w)-1), i -> substring(w, i+1, 1))").as("s"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    while (r <= numMerges) {
      val best = syms.filter(size(col("s")) >= 2)
        .select(col("cnt"), explode(
          expr("transform(sequence(0, size(s)-2), " +
            "i -> struct(element_at(s, i+1) AS a, element_at(s, i+2) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) {
        r = numMerges + 1 // fully merged corpus: nothing left to learn
      } else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, a, b, c))
        // greedy fold: seed with the first symbol, merge-or-append the rest
        val aq = lit(a); val bq = lit(b)
        syms = syms.withColumn("s",
            when(size(col("s")) < 2, col("s")).otherwise(
              aggregate(slice(col("s"), lit(2), size(col("s")) - 1),
                array(element_at(col("s"), 1)),
                (acc, x) =>
                  when(element_at(acc, -1) === aq && x === bq,
                    concat(slice(acc, lit(1), size(acc) - 1), array(concat(aq, bq))))
                  .otherwise(concat(acc, array(x))))))
          .localCheckpoint(true) // vocabulary-sized; truncates per-round lineage
        r += 1
      }
    }
    val rows = merges.result().map { case (rk, a, b, c) => Row(rk, a, b, a + b, c) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("c", LongType, nullable = false))))
  }

  /** Apply a learned merge table to a text column: tokenize on spaces,
    * split each token to characters, replay the merges in rank order.
    * The merge list is a driver-side constant folded into ONE expression
    * chain — no join, no shuffle; the scan stays a single map. */
  def segment(df: DataFrame, textCol: String,
              merges: Seq[(String, String)]): DataFrame = {
    // anonymous inner column — never materialized, so it cannot clobber
    // a caller's column of any name
    val toks = split(col(textCol), " ")
    val charSplit =
      transform(toks, w => transform(
        sequence(lit(0), length(w) - 1), i => w.substr(i + 1, lit(1))))
    val merged = merges.foldLeft(charSplit) { case (prev, (a, b)) =>
      val aq = lit(a); val bq = lit(b)
      transform(prev, w =>
        when(size(w) < 2, w).otherwise(
          aggregate(slice(w, lit(2), size(w) - 1), array(element_at(w, 1)),
            (acc, x) =>
              when(element_at(acc, -1) === aq && x === bq,
                concat(slice(acc, lit(1), size(acc) - 1), array(concat(aq, bq))))
              .otherwise(concat(acc, array(x))))))
    }
    df.withColumn("pieces", merged)
  }
}
