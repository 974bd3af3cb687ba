package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast-model Naive Bayes scoring as ONE compiled pass per
  * document — the q153-fusion observation applied to
  * [[graft.operators.NaiveBayes.scoreMulti]]: every aggregation in the
  * score plan is doc_id-keyed (the (doc, term) tf agg, the (doc, cls)
  * evidence agg, the class pivot — nothing corpus-wide), so when the
  * V×K weight table is broadcast-sized BY CONSTRUCTION (char-n-gram
  * features: the langid rung), the whole plan is per-document state a
  * single local pass over the token array already has. Scoring becomes
  * a narrow projection: zero exchanges at any corpus size — which is
  * exactly how a fastText-style langid model deploys against a 100 TB
  * crawl (model broadcast once, scoring embarrassingly parallel).
  *
  * The DataFrame spelling ([[graft.operators.NaiveBayes.scoreMulti]])
  * remains the general-vocabulary scale path (word-feature models whose
  * V×K outgrows a broadcast score through the term-keyed join) and the
  * value cross-check (NbLocalSpec pins this kernel against it on the
  * emitted ROUNDED scores — the oracle-parity contract; raw doubles
  * differ only in summation order, the same equivalence class the
  * Spark-vs-DuckDB gate already accepts).
  *
  * Exact-replay contract, clause by clause against the exchange
  * spelling:
  *  - tf is the count of each DISTINCT vocab term in the doc; terms
  *    absent from the model carry no evidence (the inner join's skip),
  *    and null elements never match a join key — skipped;
  *  - evidence(c) = Σ_t tf(t)·w(t,c) accumulated per class THEN the
  *    prior is added once (`ev + prior` — same float op order);
  *  - a document with no vocab term at all yields NULL (the exchange
  *    spelling's absent row; callers filter, matching the inner-join
  *    drop).
  */
object NbScoreKernel {

  /** A collected K-class model: `classes` sorted ascending (the pivot
    * column order every caller uses), `priors(k)` aligned to it,
    * `weights` term → K-vector aligned the same way. Built once per
    * trained model by [[graft.operators.NaiveBayes.localize]];
    * serializable, shipped with the plan like any literal reference
    * (one task-binary broadcast per stage — the same wire cost class
    * as the broadcast join it replaces).
    */
  final case class LocalMultiModel(
      classes: Array[String],
      priors: Array[Double],
      weights: java.util.HashMap[UTF8String, Array[Double]])
    extends Serializable {
    require(classes.length == priors.length,
      "classes/priors length mismatch")
    def k: Int = classes.length
    // Expressions stringify their args into every explain/UI plan —
    // summarize instead of dumping the vocabulary.
    override def toString: String =
      s"LocalMultiModel(K=$k, V=${weights.size()})"
  }

  /** Σ tf·w per class + prior, over one token array. Returns null when
    * no token is a vocab term. Terms accumulate in first-occurrence
    * order — a fixed order in the same equivalence class as the
    * exchange spelling's shuffle order (both round before emission).
    */
  def score(arr: ArrayData, model: LocalMultiModel): ArrayData = {
    val k = model.k
    val size = arr.numElements()
    // term -> [tf, w1..wk] slot; insertion-ordered so the float sum
    // has one deterministic order per document.
    val tf = new java.util.LinkedHashMap[UTF8String, Array[Long]](16)
    var i = 0
    while (i < size) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (model.weights.containsKey(t)) {
          val c = tf.get(t)
          if (c == null) tf.put(t, Array(1L)) else c(0) += 1L
        }
      }
      i += 1
    }
    if (tf.isEmpty) return null
    val acc = new Array[Double](k)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val n = e.getValue()(0)
      val w = model.weights.get(e.getKey)
      var c = 0
      while (c < k) { acc(c) += n * w(c); c += 1 }
    }
    var c = 0
    while (c < k) { acc(c) += model.priors(c); c += 1 }
    new GenericArrayData(acc)
  }
}

/** `nb_score_multi(toks)`: array of K class scores (model class order,
  * ascending) or NULL for a document with no vocab term. See
  * [[NbScoreKernel.score]].
  */
case class NbScoreMultiExpr(child: Expression,
    model: NbScoreKernel.LocalMultiModel) extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nb_score_multi expects array<string> input, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    NbScoreKernel.score(a.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("nbLocalModel", model,
      classOf[NbScoreKernel.LocalMultiModel].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("nbScores")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.NbScoreKernel.score($a, $mRef);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nb_score_multi"
}

object NbFunctions {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column facade for [[NbScoreMultiExpr]]. */
  def nbScoreMulti(toks: Column, model: NbScoreKernel.LocalMultiModel): Column =
    GraftSqlBridge.column(
      NbScoreMultiExpr(GraftSqlBridge.expression(toks), model))
}
