package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing window selection as ONE compiled sliding-minimum pass —
  * the round-14 fusion of [[graft.operators.Winnow.fingerprints]]'
  * selection stage, which used to run an interpreted `aggregate` fold
  * per window over an interpreted `transform` of window starts:
  * O(n·w) lambda evaluations per document on the corpus scan.
  *
  * Semantics replayed exactly (the SQL spelling stays in WinnowSpec's
  * pins and the q164 oracle): windows j = 1 .. max(1, size − w + 1),
  * each selecting its minimum hash with the RIGHTMOST occurrence on
  * ties (the paper's rule — the fold's `<=` update), adjacent windows
  * selecting the same (pos, fp) collapse to one row (array_distinct —
  * a given position sits in a contiguous window range, so duplicates
  * are only ever consecutive and a consecutive-dedup is equivalent).
  *
  * The kernel is the classic monotonic-deque sliding minimum — O(n)
  * instead of O(n·w), and compiled: pop the back while the incoming
  * hash is ≤ it (rightmost-tie preference IS the non-strict pop), pop
  * the front when it leaves the window, emit the front per window.
  */
object WinnowSelect {

  def select(gh: ArrayData, w: Int): ArrayData = {
    val n = gh.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val windows = if (n <= w) 1 else n - w + 1
    // Deque of 0-based indices, values ascending front→back; ring-free
    // (head/tail into a flat array sized n).
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val out = new scala.collection.mutable.ArrayBuffer[Any](windows)
    var lastPos = -1
    var i = 0
    while (i < n) {
      val v = gh.getLong(i)
      while (tail > head && gh.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i; tail += 1
      // Window ending at i starts at i - w + 1 (0-based); emit once the
      // first full window exists — or, for n <= w, only at the end.
      val windowStart = i - w + 1
      if (tail > head && dq(head) < windowStart) head += 1
      val emitNow = if (n <= w) i == n - 1 else i >= w - 1
      if (emitNow) {
        val sel = dq(head)
        if (sel != lastPos) {
          // 1-based pos, matching the SQL spelling's sequence(j, …).
          out += new GenericInternalRow(Array[Any](sel + 1, gh.getLong(sel)))
          lastPos = sel
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `winnow_select(gh)`: array&lt;struct&lt;pos, fp&gt;&gt; of selected
  * (1-based position, hash) fingerprints. See [[WinnowSelect]].
  */
case class WinnowSelectExpr(child: Expression, w: Int)
    extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ if w < 1 => TypeCheckResult.TypeCheckFailure(
      s"winnow_select window must be >= 1, got $w")
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_select expects array<bigint> input, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    WinnowSelect.select(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.WinnowSelect.select($a, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_select"
}

/** Column builder. */
object WinnowFunctions {
  import org.apache.spark.sql.GraftSqlBridge

  def winnowSelect(gh: Column, w: Int): Column = {
    require(w >= 1, s"window size must be >= 1, got $w")
    GraftSqlBridge.column(
      WinnowSelectExpr(GraftSqlBridge.expression(gh), w))
  }
}
