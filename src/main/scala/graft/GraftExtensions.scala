package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductF, DotProductL, Int8CodesExpr}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for SQL use.
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT dot_f(a.embedding, b.embedding) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_f"),
      (exprs: Seq[Expression]) => {
        // Explicit arity check: extra args would otherwise be silently
        // IGNORED (wrong results, no diagnostic) and one arg would throw
        // an index error instead of an analysis error.
        require(exprs.length == 2,
          s"dot_f expects exactly 2 arguments, got ${exprs.length}")
        DotProductF(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("dot_l"),
      new ExpressionInfo(classOf[DotProductL].getName, "dot_l"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"dot_l expects exactly 2 arguments, got ${exprs.length}")
        DotProductL(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("quantize_i8"),
      new ExpressionInfo(classOf[Int8CodesExpr].getName, "quantize_i8"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"quantize_i8 expects exactly 1 argument, got ${exprs.length}")
        Int8CodesExpr(exprs.head)
      }))
    e.injectOptimizerRule(_ => graft.plans.BucketedIntervalJoin)
  }
}

object GraftExtensions {
  /** Same registrations for an already-built session: the SQL function
    * via the registry, the optimizer rule via experimental
    * extraOptimizations (both session-scoped).
    */
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "dot_f",
      exprs => {
        require(exprs.length == 2,
          s"dot_f expects exactly 2 arguments, got ${exprs.length}")
        DotProductF(exprs.head, exprs(1))
      })
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "dot_l",
      exprs => {
        require(exprs.length == 2,
          s"dot_l expects exactly 2 arguments, got ${exprs.length}")
        DotProductL(exprs.head, exprs(1))
      })
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "quantize_i8",
      exprs => {
        require(exprs.length == 1,
          s"quantize_i8 expects exactly 1 argument, got ${exprs.length}")
        Int8CodesExpr(exprs.head)
      })
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BucketedIntervalJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BucketedIntervalJoin
  }
}
