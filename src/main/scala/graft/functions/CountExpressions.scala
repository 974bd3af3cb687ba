package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled element-count kernels — the round-15 closure of the last
  * interpreted per-ELEMENT lambdas on corpus scans. The
  * `size(filter(arr, x -> <pred>))` spelling evaluates its lambda
  * INTERPRETED per element (the round-14 lesson) and materializes the
  * filtered array only to take its size; these kernels run the same
  * predicate compiled and count in place.
  *
  * Exact-replay notes (the predicates are hash-gated through their
  * callers, so the semantics must be the builtin's, bit for bit):
  *
  *  - [[CountMatchingExpr]] replays `x RLIKE 'p'` via the identical
  *    java.util.regex call Spark's RLike makes —
  *    `pattern.matcher(s.toString).find(0)` — with the optional
  *    ltrim/rtrim replayed as `UTF8String.trimLeft/trimRight` (what
  *    the builtin trims compile to). Null elements count as the
  *    filter's null-predicate drop.
  *  - [[CountInSetExpr]] replays `x IN ('a', 'b', ...)` over literal
  *    strings: equality against a prebuilt set; a null element's IN
  *    is null → dropped, same as the filter.
  */
object CountKernels {

  final val TrimNone = 0
  final val TrimLeft = 1
  final val TrimRight = 2

  def countMatching(arr: ArrayData, p: Pattern, trim: Int): Int = {
    val size = arr.numElements()
    var n = 0
    var i = 0
    while (i < size) {
      if (!arr.isNullAt(i)) {
        var s = arr.getUTF8String(i)
        if (trim == TrimLeft) s = s.trimLeft()
        else if (trim == TrimRight) s = s.trimRight()
        // the exact RLike call: partial match over the java String
        if (p.matcher(s.toString).find(0)) n += 1
      }
      i += 1
    }
    n
  }

  def countInSet(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val size = arr.numElements()
    var n = 0
    var i = 0
    while (i < size) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}

/** `count_matching(arr)`: elements whose (optionally trimmed) value
  * RLIKE-matches `regex`. See [[CountKernels.countMatching]].
  */
case class CountMatchingExpr(child: Expression, regex: String, trim: Int)
    extends UnaryExpression {

  @transient private lazy val pattern: Pattern = Pattern.compile(regex)

  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_matching expects array<string> input, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    CountKernels.countMatching(a.asInstanceOf[ArrayData], pattern, trim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("countMatchingPattern", pattern,
      classOf[Pattern].getName)
    defineCodeGen(ctx, ev,
      a => s"graft.functions.CountKernels.countMatching($a, $pRef, $trim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "count_matching"
}

/** `count_in_set(arr)`: elements equal to any of the literal
  * `values`. See [[CountKernels.countInSet]].
  */
case class CountInSetExpr(child: Expression, values: Seq[String])
    extends UnaryExpression {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](values.size * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if values.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case _ if values.isEmpty => TypeCheckResult.TypeCheckFailure(
      "count_in_set needs at least one value")
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_in_set expects array<string> input, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    CountKernels.countInSet(a.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("countInSetValues", set,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.CountKernels.countInSet($a, $sRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "count_in_set"
}

/** Column builders. */
object CountFunctions {
  import org.apache.spark.sql.GraftSqlBridge

  /** Count of elements RLIKE-matching `regex`, with the element
    * optionally ltrim/rtrim'd first (builtin trim semantics).
    */
  def countMatching(arr: Column, regex: String,
      trim: Int = CountKernels.TrimNone): Column =
    GraftSqlBridge.column(
      CountMatchingExpr(GraftSqlBridge.expression(arr), regex, trim))

  /** Count of elements equal to any literal in `values`. */
  def countInSet(arr: Column, values: Seq[String]): Column = {
    require(values.nonEmpty, "count_in_set needs at least one value")
    GraftSqlBridge.column(
      CountInSetExpr(GraftSqlBridge.expression(arr), values))
  }
}
