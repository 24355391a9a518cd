package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for the learned-BPE token counter over a
  * PRE-TOKENIZED document: given the array of GPT-2-style pre-tokens
  * (`regexp_extract_all`'s output), map each pre-token's spaces to the
  * Ġ word-boundary marker (U+0120 — GPT-2's byte-encoder does exactly
  * this for 0x20), apply the learned merge table in rank order with
  * left-to-right non-overlapping `String.replace` semantics (the
  * `token_count_bpe` discipline), and return the total surviving symbol
  * count.
  *
  * Why an expression and not a `replace` fold: the 12- and 64-merge
  * tables fold into a chain of `functions.replace` calls, but a
  * 256-deep chain in one projection blows the generated-method budget
  * (the same reason `bpeMerges` localCheckpoints its rewrite chain).
  * Here the whole chain is ONE generated call into [[compute]] — a flat
  * loop over the merge arrays, inside whole-stage codegen, with no
  * intermediate row materialization. Per-token application equals
  * whole-document application because merge pairs never contain Ġ-free
  * spaces or cross pre-token boundaries (no learned symbol spans two
  * pre-tokens by construction — training counts pairs within histogram
  * words only).
  *
  * Counts are CODEPOINTS, matching DuckDB's `length()`: every symbol in
  * play (ASCII, Ġ, the U+E2xx learned symbols) is BMP, but counting
  * codepoints keeps the contract explicit rather than incidental.
  *
  * Reference ancestor: the tokenizer-induction scope of SURVEY.md §2.6;
  * see [[graft.operators.TextOps]] `bpe_train_regex`.
  */
case class BpeTokens(child: Expression, pats: IndexedSeq[String],
    subs: IndexedSeq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(pats.length == subs.length,
    "merge pattern/replacement tables must align")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = IntegerType

  @transient private lazy val patsArr: Array[String] = pats.toArray
  @transient private lazy val subsArr: Array[String] = subs.toArray

  /** Per-distinct-pre-token memo (r21 optimization): pre-tokens are
    * Zipf-distributed, so the merge fold recomputes the same answer for
    * " the" millions of times \u2014 cache the pure token\u2192count function
    * instead. Concurrent (local mode shares the expression instance
    * across task threads) and CAPPED so a pathological vocabulary can
    * never grow driver/executor state unboundedly: past the cap the
    * fold just runs uncached, bit-identical either way. */
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val MEMO_CAP = 1 << 16

  /** One pass per pre-token; public because generated code calls it. */
  def compute(arr: ArrayData): Int = {
    var total = 0
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val raw = arr.getUTF8String(i).toString
        val cached = memo.get(raw)
        if (cached != null) total += cached.intValue
        else {
          var t = raw.replace(' ', '\u0120')
          var j = 0
          while (j < patsArr.length) {
            t = t.replace(patsArr(j), subsArr(j))
            j += 1
          }
          val c = t.codePointCount(0, t.length)
          if (memo.size < MEMO_CAP) memo.put(raw, Integer.valueOf(c))
          total += c
        }
      }
      i += 1
    }
    total
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTokens", this,
      classOf[BpeTokens].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BpeTokens = copy(child = newChild)
}

object BpeTokens {
  /** int column: total learned-BPE tokens of the pre-token array. */
  def column(pretoks: Column, pats: Seq[String], subs: Seq[String]): Column =
    ExpressionUtils.column(BpeTokens(ExpressionUtils.expression(pretoks),
      pats.toIndexedSeq, subs.toIndexedSeq))
}
