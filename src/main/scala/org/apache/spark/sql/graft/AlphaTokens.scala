package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for the Gopher alpha-word gate: the number
  * of tokens of an array<string> column containing at least one ASCII
  * letter.
  *
  * Replaces `size(filter(words, w => w.rlike("[a-zA-Z]")))` — a
  * CodegenFallback higher-order function running an interpreted regex
  * per token (measured 2.0 s of gopher_rules' 7.0 s at the 64× fixture).
  * Here each token is one byte scan inside whole-stage codegen: ASCII
  * letters are single bytes in UTF-8, and multi-byte sequences use only
  * bytes ≥ 0x80, so the byte-range test can never false-positive on a
  * non-ASCII codepoint — exactly the `[a-zA-Z]` class the regex (and the
  * DuckDB oracle's regexp_matches) sees. Result-identical to the HOF
  * form (ExpressionSpec pins equality); null tokens are skipped, as the
  * HOF's null-propagating lambda drops them.
  *
  * Reference ancestor: the string-typed scoring projections of SURVEY.md
  * §2.2 — see [[graft.operators.TextOps]].
  */
case class AlphaTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = IntegerType

  /** One-pass counter; public because generated code calls it. */
  def compute(arr: ArrayData): Int = {
    var hits = 0
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var j = 0
        var found = false
        while (j < bytes.length && !found) {
          val b = bytes(j)
          found = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
          j += 1
        }
        if (found) hits += 1
      }
      i += 1
    }
    hits
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("alphaTokens", this,
      classOf[AlphaTokens].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : AlphaTokens = copy(child = newChild)
}

object AlphaTokens {
  /** int column: tokens of `words` containing at least one ASCII letter. */
  def column(words: Column): Column =
    ExpressionUtils.column(AlphaTokens(ExpressionUtils.expression(words)))
}
