package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the shingling hot path of the dedup
  * operators: distinct word n-grams of a text column in ONE pass —
  * tokenize on single spaces, drop empty tokens, join each n consecutive
  * words with a space, keep first occurrences.
  *
  * Replaces the composable form
  * `array_distinct(transform(sequence(...), i => concat_ws(element_at…)))`
  * over `filter(split(text,' '), …)` — a higher-order-function tree that is
  * CodegenFallback in Spark: every document paid an interpreted walk per
  * shingle plus repeated `element_at` traversals (the r3 bench's most
  * expensive query, dedup_ngram, spent its time here). This expression is
  * one `UTF8String`-level loop per document invoked from inside
  * whole-stage codegen, and never decodes to java.lang.String.
  *
  * Result-identical to the HOF form it replaces: same tokenization (split
  * on the literal single-space pattern; empties dropped either way), same
  * `< n words → empty array` guard, same space-joined shingle rendering,
  * and LinkedHashSet preserves the first-occurrence order that
  * `array_distinct` guarantees — so the md5-derived MinHash/Jaccard
  * oracles are unaffected.
  *
  * Reference ancestor: textual-identity grouping
  * (`/root/reference/SparKMeansGroupBy.java:94`) generalized to content
  * n-grams — see [[graft.operators.DedupOps]].
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** One-pass shingler; public because generated code calls it. */
  def compute(text: UTF8String): GenericArrayData = {
    val parts = text.split(WordShingles.SPACE, -1)
    val words = new java.util.ArrayList[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (parts(i).numBytes() > 0) words.add(parts(i))
      i += 1
    }
    val m = words.size
    if (m < n) return WordShingles.EMPTY
    if (n == 1 && !distinct) // plain tokenization: no join, no dedup
      return new GenericArrayData(words.toArray.asInstanceOf[Array[Any]])
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](m - n + 1)
    val slice = new Array[UTF8String](n)
    var j = 0
    while (j <= m - n) {
      var w = 0
      while (w < n) { slice(w) = words.get(j + w); w += 1 }
      out.add(UTF8String.concatWs(WordShingles.SPACE, slice: _*))
      j += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this,
      classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordShingles = copy(child = newChild)
}

object WordShingles {
  private val SPACE = UTF8String.fromString(" ")
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  /** Distinct word n-gram column of a text column. */
  def column(text: Column, n: Int): Column =
    ExpressionUtils.column(
      WordShingles(ExpressionUtils.expression(text), n, distinct = true))

  /** Plain whitespace tokenization (all non-empty tokens, order kept) —
    * result-identical to `filter(split(text, " "), length(_) > 0)` but
    * codegen'd; the native sibling of [[column]] for the explode-heavy
    * token consumers (SimHash, token_topk). */
  def tokens(text: Column): Column =
    ExpressionUtils.column(
      WordShingles(ExpressionUtils.expression(text), 1, distinct = false))

  /** ALL word n-grams (duplicates kept, order kept) — the multiset
    * sibling of [[column]]; `size(all) - size(column)` measures
    * within-document repetition. */
  def all(text: Column, n: Int): Column =
    ExpressionUtils.column(
      WordShingles(ExpressionUtils.expression(text), n, distinct = false))
}
