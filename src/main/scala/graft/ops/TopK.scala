package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-state grouped top-k — the scale form of the
  * `row_number().over(Window.partitionBy(g).orderBy(...)) <= k` idiom.
  *
  * The window plan shuffles EVERY row to its group's reducer and sorts
  * there: exchange volume is the corpus, and one hot group serializes
  * into one task. This aggregator keeps only the k best (key1, key2)
  * pairs per group per task — map-side partial aggregation ships
  * ≤ groups × k rows across the wire no matter the input (the KMV
  * bottom-k discipline applied to ranking), and a hot group costs every
  * task at most k buffer slots. Results are IDENTICAL to the window
  * form when key2 is UNIQUE per row (pass the row id — the same
  * uniqueness a deterministic window tiebreak needs anyway): insertion
  * keeps the k lexicographically smallest (key1, key2) with exact
  * integer comparisons, so ordering and ties match row_number over
  * (key1 ASC, key2 ASC); exact duplicate pairs collapse to one entry,
  * which a unique key2 makes unreachable. For descending rankings pass
  * a negated key, the [[graft.Queries]] quantization discipline.
  */
object TopK {

  private type Pair = (Long, Long)

  private final class TopKAgg(k: Int) extends Aggregator[Pair, Array[Pair], Seq[Pair]] {
    override def zero: Array[Pair] = Array.empty[Pair]

    private def lt(a: Pair, b: Pair): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

    private def insert(b: Array[Pair], v: Pair): Array[Pair] =
      if (b.length >= k && !lt(v, b(k - 1))) b
      else {
        var ins = 0
        while (ins < b.length && lt(b(ins), v)) ins += 1
        if (ins < b.length && b(ins) == v) return b // exact duplicate
        val outLen = math.min(b.length + 1, k)
        val out = new Array[Pair](outLen)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = v
        var i = ins + 1
        while (i < outLen) { out(i) = b(i - 1); i += 1 }
        out
      }

    override def reduce(b: Array[Pair], v: Pair): Array[Pair] = insert(b, v)
    override def merge(a: Array[Pair], b: Array[Pair]): Array[Pair] =
      b.foldLeft(a)(insert)
    override def finish(b: Array[Pair]): Seq[Pair] = b.toSeq
    override def bufferEncoder: Encoder[Array[Pair]] = Encoders.kryo[Array[Pair]]
    override def outputEncoder: Encoder[Seq[Pair]] = ExpressionEncoder[Seq[Pair]]()
  }

  /** Aggregate column: the k smallest (key1, key2) pairs of the group,
    * ascending — an array of structs `(_1, _2)`. */
  def smallestK(key1: Column, key2: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    udaf(new TopKAgg(k), ExpressionEncoder[Pair]())(key1, key2)
  }

  /** The full operator: per `groupCols` group, the top-k rows by
    * (sortKey ASC, tieKey ASC), returned as
    * (groupCols..., rk, tieKey as idCol, sortKey as keyCol) — the shape
    * of the window idiom with exchange volume ≤ groups × k. */
  def perGroup(df: DataFrame, groupCols: Seq[String], sortKey: Column,
               tieKey: Column, k: Int,
               keyCol: String = "key", idCol: String = "id"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(smallestK(sortKey, tieKey, k).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__p", "__v")): _*)
      .select(groupCols.map(col) :+
        (col("__p") + 1).cast("int").as("rk") :+
        col("__v._2").as(idCol) :+
        col("__v._1").as(keyCol): _*)
}
