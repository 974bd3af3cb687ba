package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Span removal as ONE compiled walk — the round-15 fusion of
  * [[graft.operators.SpanDedup.removeSpans]]' cut stage, which used to
  * run an interpreted `transform(filter(sequence(...), i -> NOT
  * exists(spans, ...)), i -> toks[i])`: O(toks × spans) lambda
  * evaluations per document, on exactly the corpora span-dedup targets
  * (heavily duplicated docs are the ones that carry spans).
  *
  * Semantics replayed exactly (SpanDedupSpec pins value identity
  * against the HOF spelling): token index i survives iff NO span
  * covers it (`i >= s AND i < e`). The kernel sorts the doc's spans by
  * start (span count is bounded by len/k post-merge; insertion sort)
  * and makes one pass over positions carrying the running max end of
  * all spans whose start ≤ i — position i is covered iff that max end
  * exceeds i. O(toks + spans²ᵂᵒʳˢᵗ) with tiny constants, correct even
  * for overlapping/unsorted span frames (the contract admits any
  * (doc_id, span_start, span_end) input, not just merged output).
  */
object SpanCut {

  /** Cut covered positions out of `toks`. Span struct fields are
    * (s: long, e: long), non-null — the [[graft.operators.SpanDedup]]
    * mergeMarks output contract (min/max aggregates over non-null
    * marks can't produce null bounds).
    */
  def cut(toks: ArrayData, spans: ArrayData): ArrayData = {
    val size = toks.numElements()
    val nSpans = spans.numElements()
    if (size == 0 || nSpans == 0) return toks
    val ss = new Array[Long](nSpans)
    val es = new Array[Long](nSpans)
    var i = 0
    while (i < nSpans) {
      val row = spans.getStruct(i, 2)
      ss(i) = row.getLong(0)
      es(i) = row.getLong(1)
      i += 1
    }
    // Insertion sort by start — spans per doc are few (≤ len/k after
    // the interval merge) and usually already ordered.
    i = 1
    while (i < nSpans) {
      val s = ss(i); val e = es(i)
      var j = i - 1
      while (j >= 0 && ss(j) > s) { ss(j + 1) = ss(j); es(j + 1) = es(j); j -= 1 }
      ss(j + 1) = s; es(j + 1) = e
      i += 1
    }
    val out = new Array[Any](size)
    var o = 0
    var p = 0
    var maxEnd = Long.MinValue
    var idx = 0
    while (idx < size) {
      while (p < nSpans && ss(p) <= idx) {
        if (es(p) > maxEnd) maxEnd = es(p)
        p += 1
      }
      if (idx >= maxEnd) {
        out(o) = if (toks.isNullAt(idx)) null else toks.getUTF8String(idx)
        o += 1
      }
      idx += 1
    }
    if (o == size) toks
    else {
      val trimmed = new Array[Any](o)
      System.arraycopy(out, 0, trimmed, 0, o)
      new GenericArrayData(trimmed)
    }
  }
}

/** `span_cut(toks, spans)`: `toks` minus positions covered by any span
  * — null or absent span list passes the tokens through UNCHANGED
  * (the left-join contract of removeSpans), which is why this is a
  * hand-rolled doGenCode and not a null-safe builtin shape. See
  * [[SpanCut]].
  */
case class SpanCutExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = left.nullable
  override def dataType: DataType = left.dataType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _),
            ArrayType(StructType(Array(
              StructField(_, LongType, _, _),
              StructField(_, LongType, _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"span_cut expects (array<string>, array<struct<s:bigint,e:bigint>>), got ($l, $r)")
    }

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) return null
    val sp = right.eval(input)
    if (sp == null) t
    else SpanCut.cut(t.asInstanceOf[ArrayData], sp.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = code"""
      ${l.code}
      boolean ${ev.isNull} = ${l.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${r.code}
        if (${r.isNull}) {
          ${ev.value} = ${l.value};
        } else {
          ${ev.value} = graft.functions.SpanCut.cut(${l.value}, ${r.value});
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "span_cut"
}

/** Column builder. */
object SpanCutFunctions {
  import org.apache.spark.sql.GraftSqlBridge

  def spanCut(toks: Column, spans: Column): Column =
    GraftSqlBridge.column(SpanCutExpr(
      GraftSqlBridge.expression(toks), GraftSqlBridge.expression(spans)))
}
