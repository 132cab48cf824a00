package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer training (Schuster & Nakajima 2012; the BERT
  * vocabulary builder) — the third trainer beside BPE ([[Bpe]]) and
  * Unigram ([[Unigram]]). Same greedy-merge skeleton as BPE with ONE
  * changed line, which is the whole algorithm: the merge argmax is the
  * LIKELIHOOD gain score c(ab) / (c(a)·c(b)) — "merge the pair whose
  * joint frequency most exceeds what independence predicts" — instead of
  * raw pair count, so frequent-but-uninformative pairs ("e"+" s") lose
  * to cohesive ones.
  *
  * Determinism discipline (t11/t13): the rational score quantizes to
  * integer picoparts, sq = ⌊c·10^12 / (c(a)·c(b))⌋, computed through
  * DECIMAL(38,0) (both factors corpus-sized at 100 TB — a Long product
  * would wrap), ties broken by (a, b) in binary string order; any SQL
  * engine replays every round bit-for-bit.
  *
  * Plan shape per round (the Bpe.train shape + one census): ONE pair
  * census + ONE symbol census over the word-form table — both map-side-
  * combined groupBys over a vocabulary-bounded frame, never the corpus
  * (the corpus is touched exactly once, in the initial word census) —
  * then a 1-row argmax collect and a map-only greedy fold. Returns the
  * merge table (rank, left, right, merged, c, sq). */
object WordPiece {

  def train(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    val words = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    var syms = words.select(col("w"), col("cnt"),
        expr("transform(sequence(0, length(w)-1), i -> substring(w, i+1, 1))").as("s"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, String, Long, Long)]
    var r = 1
    while (r <= numMerges) {
      val symCnt = syms
        .select(col("cnt"), explode(col("s")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("cnt")).as("cs"))
      val best = syms.filter(size(col("s")) >= 2)
        .select(col("cnt"), explode(
          expr("transform(sequence(0, size(s)-2), " +
            "i -> struct(element_at(s, i+1) AS a, element_at(s, i+2) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .join(symCnt.select(col("sym").as("a"), col("cs").as("ca")), Seq("a"))
        .join(symCnt.select(col("sym").as("b"), col("cs").as("cb")), Seq("b"))
        .withColumn("sq", expr(
          "(CAST(c AS DECIMAL(38,0)) * 1000000000000) div " +
          "(CAST(ca AS DECIMAL(38,0)) * cb)").cast("long"))
        // using-column joins reorder columns (each key moves to the
        // front) — pin the projection before the positional reads below
        .select(col("a"), col("b"), col("c"), col("sq"))
        .orderBy(col("sq").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) {
        r = numMerges + 1 // fully merged: nothing left to learn
      } else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((r, a, b, a + b, best(0).getLong(2), best(0).getLong(3)))
        val aq = lit(a); val bq = lit(b)
        val prev = syms
        // greedy fold — identical to Bpe.train's merge apply
        syms = syms.withColumn("s",
            when(size(col("s")) < 2, col("s")).otherwise(
              aggregate(slice(col("s"), lit(2), size(col("s")) - 1),
                array(element_at(col("s"), 1)),
                (acc, x) =>
                  when(element_at(acc, -1) === aq && x === bq,
                    concat(slice(acc, lit(1), size(acc) - 1), array(concat(aq, bq))))
                  .otherwise(concat(acc, array(x))))))
          .localCheckpoint(true)
        prev.unpersist()
        r += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "left", "right", "merged", "c", "sq")
  }
}
