package graft.sketch

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable element-wise vector-sum aggregate over quantized (BIGINT)
  * embedding arrays — the centroid/mean-pool primitive (and the IVF
  * training step: per-cluster centroid = vector_sum / count).
  *
  * The buffer is one long array per group per task, merged pairwise —
  * map-side partial aggregation ships (groups × dims) longs, never the
  * input vectors, where the posexplode-then-groupBy formulation shuffles
  * (rows × dims) rows. Integer sums are reorder-free, so the result is
  * bit-stable under any partitioning (and DuckDB-reproducible).
  */
object VectorAgg {

  private val seqLongEnc: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  private final class SumAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], v: Seq[Long]): Array[Long] =
      if (v == null) b
      else if (b.length == 0) v.toArray
      else { var i = 0; while (i < b.length && i < v.length) { b(i) += v(i); i += 1 }; b }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.length == 0) b
      else if (b.length == 0) a
      else { var i = 0; while (i < a.length && i < b.length) { a(i) += b(i); i += 1 }; a }

    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Seq[Long]] = seqLongEnc
  }

  /** Aggregate column: element-wise sum of BIGINT arrays. */
  def vectorSum(c: Column): Column = udaf(new SumAgg, seqLongEnc)(c)
}
