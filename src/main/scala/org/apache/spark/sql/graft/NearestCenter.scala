package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for the K-Means hot path: distance from a
  * point column to every center of a broadcast-sized literal center matrix,
  * returning struct(cid, dist) of the argmin (ties → lowest cid, matching
  * the struct-ordering argmin it replaces; an all-NaN distance row — i.e. a
  * NaN coordinate in the point — deterministically claims cid=0 rather
  * than emitting an out-of-range cid).
  *
  * Why a custom `Expression`: the composable form — k per-center `aggregate(
  * zip_with(...))` subtrees — builds on higher-order functions, which are
  * CodegenFallback in Spark: every row pays k interpreted lambda walks plus
  * k zip-array allocations. This expression participates in whole-stage
  * codegen (`doGenCode` emits two tight scalar loops over a referenced
  * `double[][]`; the centers never serialize per row) and allocates nothing
  * but the output struct. Same floating-point fold order (sequential
  * left-to-right per dimension), so results are bit-identical to the HOF
  * form and all oracles are unaffected.
  *
  * Lives under org.apache.spark.sql because the Column↔Expression lift
  * (`ExpressionUtils`) and `AbstractDataType` are private[sql] — the
  * standard packaging for third-party native expressions.
  *
  * `metric`: 0 = squared Euclidean (the reference's default paradigm),
  * 1 = Manhattan/L1 (`--paradigm 1`,
  * `/root/reference/SparKMeansGroupBy.java:44`).
  */
case class NearestCenter(child: Expression, centers: Array[Array[Double]],
    metric: Int) extends UnaryExpression with ExpectsInputTypes {

  require(centers.nonEmpty, "centers must be non-empty")
  require(metric == 0 || metric == 1, "metric: 0=sqEuclidean, 1=manhattan")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))

  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    var bestC = -1
    var best = Double.PositiveInfinity
    var c = 0
    while (c < centers.length) {
      val ct = centers(c)
      var s = 0.0
      var j = 0
      while (j < ct.length) {
        val diff = v(j) - ct(j)
        s += (if (metric == 1) math.abs(diff) else diff * diff)
        j += 1
      }
      // `bestC < 0` guard: a NaN coordinate in the point makes EVERY
      // distance NaN, and `s < best` alone would then return cid=-1 /
      // dist=+Inf — a phantom cluster downstream. Claiming center 0 keeps
      // the cid in-range deterministically (NaN *centers* cannot occur:
      // the matrix is driver-built from finite literals). For finite
      // distances the extra clause only fires at c=0 where s < +Inf
      // already held, so results are unchanged.
      if (bestC < 0 || s < best) { best = s; bestC = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestC, best))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centersRef = ctx.addReferenceObj("centers", centers, "double[][]")
    val term = if (metric == 1) "Math.abs(diff)" else "diff * diff"
    nullSafeCodeGen(ctx, ev, arr => {
      val v = ctx.freshName("v")
      val bestC = ctx.freshName("bestC")
      val best = ctx.freshName("best")
      val c = ctx.freshName("c")
      val ct = ctx.freshName("ct")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val diff = ctx.freshName("diff")
      val termJ = term.replace("diff", diff)
      s"""
         |double[] $v = $arr.toDoubleArray();
         |int $bestC = -1;
         |double $best = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $centersRef.length; $c++) {
         |  double[] $ct = $centersRef[$c];
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $ct.length; $j++) {
         |    double $diff = $v[$j] - $ct[$j];
         |    $s += $termJ;
         |  }
         |  if ($bestC < 0 || $s < $best) { $best = $s; $bestC = $c; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{$bestC, $best});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCenter = copy(child = newChild)
}

object NearestCenter {
  /** struct(cid, dist) column of the nearest center. */
  def struct(v: Column, centers: Array[(Int, Array[Double])],
      manhattan: Boolean = false): Column = {
    // cids are positional (collectCenters assigns index order); assert so a
    // future non-positional caller fails loudly instead of mis-assigning
    centers.zipWithIndex.foreach { case ((cid, _), i) =>
      require(cid == i, s"centers must be positional, got cid=$cid at $i")
    }
    ExpressionUtils.column(NearestCenter(
      ExpressionUtils.expression(v), centers.map(_._2),
      if (manhattan) 1 else 0))
  }
}
