package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd ANN index-build encoders — the streaming-epoch encode path
  * of [[graft.operators.Ivf.withCell]] / [[graft.operators.IvfPq.withCellCodes]]
  * as Catalyst expressions instead of Scala UDFs. The UDF boundary pays
  * a Catalyst→Scala conversion (ArrayData → Seq[Float], one box per
  * element) per ROW, over the heaviest scan in the ANN pipeline (every
  * delivered vector is encoded exactly once); here the kernel reads the
  * ArrayData in place inside whole-stage codegen — the
  * [[DotProductF]] pattern, with the frozen model attached as plan
  * reference objects (serialized once per plan, like a broadcast).
  *
  * ARITHMETIC CONTRACT (bit-parity with [[graft.operators.Ivf.nearest]],
  * which the SQL oracles replay): per dimension a FLOAT subtract and a
  * FLOAT square, widened to double only at accumulation; distances fold
  * over min(centroid dim, vector dim); ties break to the smaller cell
  * id via ascending scan + strict less-than. A non-finite component
  * (NaN distance everywhere) fails LOUD, exactly like `Ivf.nearest` —
  * a silent sentinel would become a phantom cell. A null ELEMENT yields
  * a null result (the [[DotProductF]] null contract); a null vector
  * yields null (absent from every probe's equi-join, present in the
  * table).
  */
object AnnEncode {

  /** Nearest-centroid id over an in-place ArrayData vector, or null
    * when the vector carries a null element. Shared by interpreted
    * eval and the generated code (the loop is JVM-compiled either way;
    * what codegen removes is the per-row conversion, not this call).
    */
  def nearestCell(ids: Array[Int], vecs: Array[Array[Float]],
      v: ArrayData): java.lang.Integer = {
    val vn = v.numElements()
    var i = 0
    while (i < vn) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    var best = -1
    var bestId = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < vecs.length) {
      val cv = vecs(c)
      val n = math.min(cv.length, vn)
      var d = 0.0
      var k = 0
      while (k < n) {
        val t = cv(k) - v.getFloat(k) // float subtract + float square,
        d += t * t                    // widened at the += (Ivf.nearest)
        k += 1
      }
      // Explicit smallest-ID tie-break (Ivf.nearest's exact test):
      // Ivf.train emits ascending ids so scan order used to coincide,
      // but Model is a public case class — an externally built model
      // with unordered ids must still match the interpreted path.
      if (d < bestD || (d == bestD && ids(c) < bestId)) {
        bestD = d; best = c; bestId = ids(c)
      }
      c += 1
    }
    if (best < 0) throw new IllegalArgumentException(
      s"AnnEncode: no nearest centroid for a dim-$vn vector — empty " +
        "centroid set, or a non-finite component made every distance NaN")
    ids(best)
  }

  /** Plain PQ codes of one vector (no coarse stage): per-subspace
    * nearest centroid over the direct slices — [[graft.operators.Pq.encode]]'s
    * arithmetic. Null element → null; wrong width fails loud.
    */
  def encodePq(subIds: Array[Array[Int]], subVecs: Array[Array[Array[Float]]],
      subDim: Int, v: ArrayData): ArrayData = {
    val vn = v.numElements()
    var i = 0
    while (i < vn) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    if (vn != subIds.length * subDim) throw new IllegalArgumentException(
      s"Pq encode: vec has dim $vn, expected ${subIds.length * subDim}")
    val codes = new Array[Int](subIds.length)
    var j = 0
    while (j < subIds.length) {
      val sv = subVecs(j)
      val sid = subIds(j)
      var best = -1
      var bestId = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < sv.length) {
        val scv = sv(c)
        val n = math.min(scv.length, subDim)
        var d = 0.0
        var k = 0
        while (k < n) {
          val t = scv(k) - v.getFloat(j * subDim + k)
          d += t * t
          k += 1
        }
        // Smallest-ID tie-break — see nearestCell.
        if (d < bestD || (d == bestD && sid(c) < bestId)) {
          bestD = d; best = c; bestId = sid(c)
        }
        c += 1
      }
      if (best < 0) throw new IllegalArgumentException(
        s"Pq encode: no nearest centroid in subspace $j")
      codes(j) = sid(best)
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** IVFADC encode of one vector: (cell, residual PQ codes) as an
    * InternalRow, or null when the vector carries a null element.
    * Identical arithmetic to [[graft.operators.IvfPq.encode]]: coarse
    * nearest, float per-dim residual, per-subspace nearest on the
    * residual slice. Wrong-width vectors fail loud (they would encode
    * truncated slices silently).
    */
  def encodeIvfPq(coarseIds: Array[Int], coarseVecs: Array[Array[Float]],
      subIds: Array[Array[Int]], subVecs: Array[Array[Array[Float]]],
      subDim: Int, v: ArrayData): InternalRow = {
    val vn = v.numElements()
    var i = 0
    while (i < vn) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    if (vn != subIds.length * subDim) throw new IllegalArgumentException(
      s"IvfPq encode: vec has dim $vn, expected ${subIds.length * subDim}")
    val cell = nearestCell(coarseIds, coarseVecs, v)
    // cell is the centroid ID; index its vector positionally.
    var cIdx = 0
    while (coarseIds(cIdx) != cell.intValue()) cIdx += 1
    val cv = coarseVecs(cIdx)
    // The residual needs every vector dimension; nearestCell tolerates
    // a narrower centroid (min-length distance fold), so enforce the
    // documented fail-loud contract HERE instead of letting the loop
    // below throw a context-free ArrayIndexOutOfBoundsException.
    if (cv.length < vn) throw new IllegalArgumentException(
      s"IvfPq encode: coarse centroid ${cell.intValue()} has dim " +
        s"${cv.length}, vector has dim $vn — cannot form the residual")
    val r = new Array[Float](vn)
    i = 0
    while (i < vn) { r(i) = v.getFloat(i) - cv(i); i += 1 }
    val codes = new Array[Int](subIds.length)
    var j = 0
    while (j < subIds.length) {
      val sv = subVecs(j)
      val sid = subIds(j)
      var best = -1
      var bestId = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < sv.length) {
        val scv = sv(c)
        val n = math.min(scv.length, subDim)
        var d = 0.0
        var k = 0
        while (k < n) {
          val t = scv(k) - r(j * subDim + k)
          d += t * t
          k += 1
        }
        // Smallest-ID tie-break — see nearestCell.
        if (d < bestD || (d == bestD && sid(c) < bestId)) {
          bestD = d; best = c; bestId = sid(c)
        }
        c += 1
      }
      if (best < 0) throw new IllegalArgumentException(
        s"IvfPq encode: no nearest residual centroid in subspace $j")
      codes(j) = sid(best)
      j += 1
    }
    new GenericInternalRow(Array[Any](cell.intValue(), new GenericArrayData(codes)))
  }
}

/** `ivf_cell(embedding)` against a frozen coarse-quantizer model:
  * IntegerType cell id, null-in/null-element → null out. See
  * [[AnnEncode]] for the arithmetic contract.
  */
case class IvfCellExpr(child: Expression, ids: Array[Int],
    vecs: Array[Array[Float]]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_cell expects array<float> input, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    AnnEncode.nearestCell(ids, vecs, a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val idsRef = ctx.addReferenceObj("ivfCellIds", ids, "int[]")
      val vecsRef = ctx.addReferenceObj("ivfCellCents", vecs, "float[][]")
      val r = ctx.freshName("cellRes")
      s"""
         |java.lang.Integer $r =
         |  graft.functions.AnnEncode.nearestCell($idsRef, $vecsRef, $a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ivf_cell"
}

/** `pq_codes(embedding)` against frozen per-subspace codebooks:
  * array&lt;int&gt; of nearest-centroid codes over the direct slices,
  * null-in/null-element → null out, wrong-width → loud failure. See
  * [[AnnEncode.encodePq]].
  */
case class PqCodesExpr(child: Expression, subIds: Array[Array[Int]],
    subVecs: Array[Array[Array[Float]]], subDim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes expects array<float> input, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    AnnEncode.encodePq(subIds, subVecs, subDim, a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val siRef = ctx.addReferenceObj("pqSubIds", subIds, "int[][]")
      val svRef = ctx.addReferenceObj("pqSubCents", subVecs, "float[][][]")
      val r = ctx.freshName("pqRes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.AnnEncode.encodePq($siRef, $svRef, $subDim, $a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_codes"
}

/** `ivfpq_encode(embedding)` against a frozen IVFADC model: a
  * struct(cell int, codes array&lt;int&gt;), null-in/null-element →
  * null out, wrong-width → loud failure. See [[AnnEncode]].
  */
case class IvfPqEncodeExpr(child: Expression, coarseIds: Array[Int],
    coarseVecs: Array[Array[Float]], subIds: Array[Array[Int]],
    subVecs: Array[Array[Array[Float]]], subDim: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivfpq_encode expects array<float> input, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    AnnEncode.encodeIvfPq(coarseIds, coarseVecs, subIds, subVecs, subDim,
      a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ciRef = ctx.addReferenceObj("ivfpqCoarseIds", coarseIds, "int[]")
      val cvRef = ctx.addReferenceObj("ivfpqCoarseCents", coarseVecs, "float[][]")
      val siRef = ctx.addReferenceObj("ivfpqSubIds", subIds, "int[][]")
      val svRef = ctx.addReferenceObj("ivfpqSubCents", subVecs, "float[][][]")
      val r = ctx.freshName("encRes")
      s"""
         |InternalRow $r = graft.functions.AnnEncode.encodeIvfPq(
         |  $ciRef, $cvRef, $siRef, $svRef, $subDim, $a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ivfpq_encode"
}

/** Column builders for the ANN encode expressions. */
object AnnFunctions {
  import org.apache.spark.sql.GraftSqlBridge

  /** Nearest-cell id of an `array<float>` column under a frozen
    * [[graft.operators.Ivf.Model]].
    */
  def ivf_cell(c: Column, centroids: Array[(Int, Array[Float])]): Column =
    GraftSqlBridge.column(IvfCellExpr(GraftSqlBridge.expression(c),
      centroids.map(_._1), centroids.map(_._2)))

  /** IVFADC (cell, codes) struct of an `array<float>` column under a
    * frozen [[graft.operators.IvfPq.Model]].
    */
  def ivfpq_encode(c: Column, coarse: Array[(Int, Array[Float])],
      sub: Array[Array[(Int, Array[Float])]], subDim: Int): Column =
    GraftSqlBridge.column(IvfPqEncodeExpr(GraftSqlBridge.expression(c),
      coarse.map(_._1), coarse.map(_._2),
      sub.map(_.map(_._1)), sub.map(_.map(_._2)), subDim))

  /** Per-subspace PQ codes of an `array<float>` column under frozen
    * [[graft.operators.Pq.Model]] codebooks.
    */
  def pq_codes(c: Column, sub: Array[Array[(Int, Array[Float])]],
      subDim: Int): Column =
    GraftSqlBridge.column(PqCodesExpr(GraftSqlBridge.expression(c),
      sub.map(_.map(_._1)), sub.map(_.map(_._2)), subDim))
}
