package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Gopher repetition numerators (A1.2, all nine bands) as ONE
  * compiled pass per document — the round-15 fusion of
  * [[graft.operators.QualityRules.ngramRepetition]]'s aggregation
  * tree.
  *
  * The insight: every aggregation in that tree is keyed by doc_id —
  * nothing is corpus-wide — so the two corpus explodes (band rows),
  * the two (doc, n, key) hash-aggregate exchanges, the (doc, n)
  * re-aggregation, the union, and the 9-way pivot all reconstruct
  * per-document state that one local pass over the token array
  * already has. After this fusion q153's plan is a narrow projection
  * + the output sort: ZERO data exchanges at any corpus size. (The
  * r14 band kernels made the gram stream cheap; this removes the
  * plan around it. q153 was still the suite's #1 key at 31.8 s sf1,
  * 2.4× the #2.)
  *
  * Value identity with the exchange spelling, band by band
  * (QualityRulesSpec pins it against the retained
  * `ngramRepetitionViaExchange`):
  *
  *  - top bands (n = 2..4): per-gram counts over the doc's grams
  *    ([[WordNgrams.grams]] — concat_ws semantics), winner by
  *    (count DESC, gram ASC) exactly like `min(struct(-cnt, gram,
  *    chars))` — UTF8String.compare IS Spark's StringType binary
  *    ordering; numerator = cnt × (numChars(gram) − (n−1));
  *  - dup bands (n = 5..10): groups keyed by the 60-bit h64
  *    ([[WordNgrams.gramH64Chars]] — the q87 hash-group contract the
  *    oracle replays, collision lane included: count sums, chars
  *    takes the min); numerator = Σ cnt × chars over groups with
  *    cnt ≥ 2;
  *  - tot = Σ token chars ([[WordNgrams.tokenLengthSum]]).
  *
  * Memory is per-document (a hash map over the doc's grams per band),
  * bounded by doc length — the same state the partial aggregate held
  * per doc, without the exchange.
  */
object GopherReps {

  def nums(arr: ArrayData): InternalRow = {
    val out = new Array[Any](10)
    val totL = WordNgrams.tokenLengthSum(arr)
    out(9) = if (totL == null) 0L else totL.longValue()
    var n = 2
    while (n <= 4) {
      val grams = WordNgrams.grams(arr, n, minOne = false)
      val m = grams.numElements()
      val cnt = new java.util.HashMap[UTF8String, Array[Long]](
        math.max(16, m * 2))
      var i = 0
      while (i < m) {
        val g = grams.getUTF8String(i)
        val e = cnt.get(g)
        if (e == null) cnt.put(g, Array(1L)) else e(0) += 1
        i += 1
      }
      var bestCnt = 0L
      var bestGram: UTF8String = null
      val it = cnt.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue()(0)
        if (c > bestCnt ||
            (c == bestCnt && bestGram != null && e.getKey.compareTo(bestGram) < 0)) {
          bestCnt = c
          bestGram = e.getKey
        }
      }
      out(n - 2) =
        if (bestGram == null) 0L
        else bestCnt * (bestGram.numChars().toLong - (n - 1))
      n += 1
    }
    n = 5
    while (n <= 10) {
      val pairs = WordNgrams.gramH64Chars(arr, n)
      val m = pairs.numElements()
      val map = new java.util.HashMap[java.lang.Long, Array[Long]](
        math.max(16, m * 2))
      var i = 0
      while (i < m) {
        val row = pairs.getStruct(i, 2)
        val gh = java.lang.Long.valueOf(row.getLong(0))
        val ch = row.getLong(1)
        val e = map.get(gh)
        if (e == null) map.put(gh, Array(1L, ch))
        else { e(0) += 1; if (ch < e(1)) e(1) = ch }
        i += 1
      }
      var num = 0L
      val it = map.values().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e(0) >= 2) num += e(0) * e(1)
      }
      out(n - 2) = num
      n += 1
    }
    new GenericInternalRow(out)
  }
}

/** `gopher_repetition_nums(toks)`: struct(num2..num10, tot) — the nine
  * Gopher repetition numerators + the character total, one compiled
  * pass. See [[GopherReps]].
  */
case class GopherRepetitionExpr(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = StructType(
    (2 to 10).map(n => StructField(s"num$n", LongType, nullable = false)) :+
      StructField("tot", LongType, nullable = false))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_repetition_nums expects array<string> input, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    GopherReps.nums(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GopherReps.nums($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gopher_repetition_nums"
}

/** Column builder. */
object GopherFunctions {
  import org.apache.spark.sql.GraftSqlBridge

  def gopherRepetitionNums(toks: Column): Column =
    GraftSqlBridge.column(
      GopherRepetitionExpr(GraftSqlBridge.expression(toks)))
}
