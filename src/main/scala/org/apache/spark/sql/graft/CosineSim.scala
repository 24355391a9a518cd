package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst cosine similarity for the pair-verification hot path of
  * the similarity/dedup operators: `dot(a,b) / (||a|| * ||b||)` in one
  * fused codegen'd loop.
  *
  * The composable form is three `aggregate(zip_with(...))` folds per pair
  * (dot + two norms) — higher-order functions, CodegenFallback in Spark:
  * tens of thousands of candidate pairs × 3×64 interpreted lambda frames
  * was the dominant cost of `dedup_embedding`'s verify stage at bench.
  *
  * Bit-identical to the HOF form (and the DuckDB oracle's
  * `list_aggregate('sum')`): each of the three accumulators advances
  * sequentially in index order — fusing them into one loop does not change
  * any accumulator's own IEEE addition sequence — and the final combine
  * `dot / (sqrt(na) * sqrt(nb))` is the same expression tree.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  // nullable even over non-null children: a dimension mismatch yields null
  // (a filterable malformed row) instead of an ArrayIndexOutOfBounds that
  // kills the whole query — the HOF identity claim below holds for
  // equal-dimension inputs; mixed-dimension inputs are malformed data.
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toDoubleArray()
    val b = r.asInstanceOf[ArrayData].toDoubleArray()
    if (a.length != b.length) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var j = 0
    while (j < a.length) {
      dot += a(j) * b(j)
      na += a(j) * a(j)
      nb += b(j) * b(j)
      j += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val j = ctx.freshName("j")
      s"""
         |double[] $a = $l.toDoubleArray();
         |double[] $b = $r.toDoubleArray();
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $j = 0; $j < $a.length; $j++) {
         |    $dot += $a[$j] * $b[$j];
         |    $na += $a[$j] * $a[$j];
         |    $nb += $b[$j] * $b[$j];
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Cosine-similarity column of two array<double> vector columns. */
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSim(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
