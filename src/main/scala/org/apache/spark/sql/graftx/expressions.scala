package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot kernels of dedup / similarity
  * search. Spark's higher-order functions (`zip_with` + `aggregate`) are
  * evaluated by the interpreter per element; for N-pair × 64-dim dot
  * products that interpreter overhead dominates the runtime. These
  * expressions generate tight Java loops inside whole-stage codegen
  * instead (preference order per SURVEY §7.3: built-ins, then custom
  * `Expression`, before any mapPartitions fallback).
  */

/** Exact dot product of two BIGINT arrays: sum(a[i]*b[i]). Integer math —
  * order-free, overflow-free for quantized embeddings (|x|<=1e4 squared
  * times 64 dims << 2^63). */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L; var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Jaccard similarity of two SORTED, DISTINCT string arrays via a single
  * merge pass — no intermediate intersection/union arrays. Equal to
  * |a ∩ b| / |a ∪ b| (what `array_intersect`/`array_union` sizes give)
  * but allocation-free and codegen'd. Inputs MUST be array_sort(
  * array_distinct(...)) — the planner-side contract of the dedup ops. */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val un = ctx.freshName("un")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $inter++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |int $un = $nx + $ny - $inter;
         |${ev.value} = $un == 0 ? 0.0 : (double) $inter / $un;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Jaccard similarity of two SORTED, DISTINCT BIGINT arrays (token/shingle
  * hashes) via a single merge pass over primitive longs — the scalable form
  * of [[SortedJaccard]]: rows carry fixed-width primitive arrays instead of
  * UTF8 strings, so join materialization is a memcpy and the merge loop is
  * branch-predictable. */
case class SortedJaccardLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val un = ctx.freshName("un")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |int $un = $nx + $ny - $inter;
         |${ev.value} = $un == 0 ? 0.0 : (double) $inter / $un;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hamming distance between two BIGINTs (bit population of xor) — the
  * SimHash comparison kernel. */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_dist"
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column <-> Expression bridge + SQL registration. Lives in the
  * org.apache.spark.sql subtree because the Spark 4 bridge APIs
  * (ExpressionUtils, AbstractDataType) are private[sql]. Public facade:
  * [[graft.functions.GraftFunctions]]. */
object GraftExpr {
  import org.apache.spark.sql.classic.ExpressionUtils
  private def ex(c: Column): Expression = ExpressionUtils.expression(c)
  private def col(e: Expression): Column = ExpressionUtils.column(e)

  def dotLong(a: Column, b: Column): Column = col(DotLong(ex(a), ex(b)))
  def sortedJaccardLong(a: Column, b: Column): Column = col(SortedJaccardLong(ex(a), ex(b)))
  def sortedJaccard(a: Column, b: Column): Column = col(SortedJaccard(ex(a), ex(b)))
  def hammingDist(a: Column, b: Column): Column = col(HammingDist(ex(a), ex(b)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_long", es => DotLong(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_jaccard", es => SortedJaccard(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_jaccard_long", es => SortedJaccardLong(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("hamming_dist", es => HammingDist(es.head, es(1)), "scala_udf")
  }
}
