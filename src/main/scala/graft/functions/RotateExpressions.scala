package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd OPQ rotation/permutation kernels — the
  * [[graft.operators.Opq]] corpus transforms as Catalyst expressions
  * instead of typed `Dataset.map` passes (which deserialize every
  * embedding into a Scala array and re-serialize the result, per row,
  * over the whole corpus each time a rotated family builds or
  * searches). Same [[AnnEncode]] rationale: read the ArrayData in
  * place inside whole-stage codegen, ship the (tiny) transform as plan
  * reference objects.
  *
  * ARITHMETIC PARITY with the typed-map forms they replace (which the
  * SQL oracles replay): ascending-dimension double folds, float32 cast
  * at the end of each output component. Null INPUT → null output; a
  * null ELEMENT → null output (the [[DotProductF]] contract — the map
  * form NPE'd); dimension violations fail LOUD exactly as before.
  */
object RotateKernels {

  private def nullElement(v: ArrayData): Boolean = {
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Householder reflection y = x − 2·u·(u·x), float32 output.
    * Vectors shorter than `u` rotate in their leading subspace (fold
    * stops at v's length); longer ones fail loud.
    */
  def householder(u: Array[Double], v: ArrayData): ArrayData = {
    if (nullElement(v)) return null
    val n = v.numElements()
    if (n > u.length) throw new IllegalArgumentException(
      s"Opq.rotate: vec has dim $n > rotation dim ${u.length}")
    var s = 0.0
    var i = 0
    while (i < n) { s += u(i) * v.getFloat(i).toDouble; i += 1 }
    val out = new Array[Float](n)
    i = 0
    while (i < n) {
      out(i) = (v.getFloat(i).toDouble - 2.0 * u(i) * s).toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Dimension allocation out(slot) = in(perm(slot)); exact-width. */
  def permute(perm: Array[Int], v: ArrayData): ArrayData = {
    if (nullElement(v)) return null
    val n = v.numElements()
    if (n != perm.length) throw new IllegalArgumentException(
      s"Opq.permute: vec has dim $n, allocation expects ${perm.length}")
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = v.getFloat(perm(i)); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Dense rotation y(i) = Σ_j m(i)(j)·x(j), float32 output; exact-width. */
  def dense(m: Array[Array[Double]], v: ArrayData): ArrayData = {
    if (nullElement(v)) return null
    val n = v.numElements()
    if (n != m.length) throw new IllegalArgumentException(
      s"Opq.rotateDense: vec has dim $n, rotation is ${m.length}x${m.length}")
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val row = m(i)
      var s = 0.0
      var j = 0
      while (j < n) { s += row(j) * v.getFloat(j).toDouble; j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Shared shape for the three rotation expressions: array&lt;float&gt; →
  * array&lt;float&gt; (containsNull=false), nullable, kernel dispatched
  * through a single reference object + static call.
  */
sealed abstract class RotateExprBase extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> input, got $other")
  }

  /** (reference object, its Java type, kernel call site) */
  protected def refObj: AnyRef
  protected def refType: String
  protected def kernel: String

  override def nullSafeEval(a: Any): Any = evalKernel(a.asInstanceOf[ArrayData])
  protected def evalKernel(v: ArrayData): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj(prettyName + "Ref", refObj, refType)
      val r = ctx.freshName("rotRes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.RotateKernels.$kernel($ref, $a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
}

case class HouseholderRotateExpr(child: Expression, u: Array[Double])
    extends RotateExprBase {
  override protected def refObj: AnyRef = u
  override protected def refType: String = "double[]"
  override protected def kernel: String = "householder"
  override protected def evalKernel(v: ArrayData): Any = RotateKernels.householder(u, v)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "opq_rotate"
}

case class PermuteExpr(child: Expression, perm: Array[Int])
    extends RotateExprBase {
  override protected def refObj: AnyRef = perm
  override protected def refType: String = "int[]"
  override protected def kernel: String = "permute"
  override protected def evalKernel(v: ArrayData): Any = RotateKernels.permute(perm, v)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "opq_permute"
}

case class DenseRotateExpr(child: Expression, m: Array[Array[Double]])
    extends RotateExprBase {
  override protected def refObj: AnyRef = m
  override protected def refType: String = "double[][]"
  override protected def kernel: String = "dense"
  override protected def evalKernel(v: ArrayData): Any = RotateKernels.dense(m, v)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "opq_rotate_dense"
}

/** Column builders for the rotation expressions. */
object RotateFunctions {
  import org.apache.spark.sql.GraftSqlBridge

  def opq_rotate(c: Column, u: Array[Double]): Column =
    GraftSqlBridge.column(HouseholderRotateExpr(GraftSqlBridge.expression(c), u))

  def opq_permute(c: Column, perm: Array[Int]): Column =
    GraftSqlBridge.column(PermuteExpr(GraftSqlBridge.expression(c), perm))

  def opq_rotate_dense(c: Column, m: Array[Array[Double]]): Column =
    GraftSqlBridge.column(DenseRotateExpr(GraftSqlBridge.expression(c), m))
}
