package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a string column — the
  * scan-side prefilter of [[graft.operators.Decontaminate]], previously
  * a Scala UDF. The UDF paid, per corpus gram, a ScalaUDF call boundary
  * plus a UTF8String → java.lang.String conversion before hashing; this
  * expression probes the filter directly on the value's UTF-8 BYTES
  * (`mightContainBinary` — the exact bytes `putString`/the string-column
  * `stat.bloomFilter` builder hash, so the answer is identical), inside
  * whole-stage codegen, with zero per-row allocation. On a 100 TB
  * decontamination pass this predicate runs once per corpus token — the
  * narrow-filter hot loop IS the operator.
  *
  * NULL input probes to FALSE (a null gram matches nothing) — same
  * contract as the `g != null && mightContain(g)` UDF it replaces, and
  * it keeps the expression non-nullable so the filter condition never
  * needs a null branch.
  *
  * The filter rides the expression as a referenced object: serialized
  * once per stage with the task binary (the same shipping cost the UDF
  * closure paid), deserialized once per executor, shared by all tasks.
  */
case class BloomMightContainStr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects a string input, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = false;
        if (!${c.isNull}) {
          ${ev.value} = $bf.mightContainBinary(${c.value}.getBytes());
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

/** [[BloomMightContainStr]]'s sibling over a LONG column — the probe
  * for digest-keyed gram pipelines (round-15: q66's corpus grams
  * travel as 60-bit h64s, so the prefilter must hash the LONG exactly
  * as the string-side builder would not — `putLong`/`mightContainLong`
  * pair with the long-column `stat.bloomFilter` builder, which feeds
  * the aggregate the same long). NULL probes to FALSE like the string
  * form (h64 of a null gram is null and matches nothing).
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain_long expects a bigint input, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = false;
        if (!${c.isNull}) {
          ${ev.value} = $bf.mightContainLong(${c.value});
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain_long"
}

object BloomFunctions {
  import org.apache.spark.sql.GraftSqlBridge

  /** Membership probe of a string column against a prebuilt filter. */
  def bloomMightContain(bloom: BloomFilter, c: Column): Column =
    GraftSqlBridge.column(BloomMightContainStr(GraftSqlBridge.expression(c), bloom))

  /** Membership probe of a bigint column against a prebuilt filter. */
  def bloomMightContainLong(bloom: BloomFilter, c: Column): Column =
    GraftSqlBridge.column(BloomMightContainLong(GraftSqlBridge.expression(c), bloom))
}
