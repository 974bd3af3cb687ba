package graft

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.functions._

/** Every custom Catalyst expression must COMPILE under Janino — a
  * generated-code error would not fail any value test (Spark silently
  * falls back to interpreted eval and logs a warning), it would only
  * silently forfeit the codegen win the expression exists for. This
  * suite forces the code generator directly: `GenerateUnsafeProjection
  * .generate` throws on a Janino compile failure instead of falling
  * back.
  */
class CodegenCompileSpec extends SparkSpec {

  private val vecIn = BoundReference(0, ArrayType(FloatType), nullable = true)

  private def cents = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
  private def ids = Array(0, 1)

  test("ANN encode expressions compile under Janino") {
    GenerateUnsafeProjection.generate(Seq(IvfCellExpr(vecIn, ids, cents)))
    GenerateUnsafeProjection.generate(Seq(PqCodesExpr(vecIn,
      Array(ids), Array(cents), subDim = 2)))
    GenerateUnsafeProjection.generate(Seq(IvfPqEncodeExpr(vecIn,
      ids, cents, Array(ids), Array(cents), subDim = 2)))
  }

  test("rotation expressions compile under Janino") {
    GenerateUnsafeProjection.generate(Seq(
      HouseholderRotateExpr(vecIn, Array(0.5, -0.5))))
    GenerateUnsafeProjection.generate(Seq(PermuteExpr(vecIn, Array(1, 0))))
    GenerateUnsafeProjection.generate(Seq(
      DenseRotateExpr(vecIn, Array(Array(0.0, 1.0), Array(1.0, 0.0)))))
  }

  test("text expressions compile under Janino") {
    val str = BoundReference(0, org.apache.spark.sql.types.StringType,
      nullable = true)
    GenerateUnsafeProjection.generate(Seq(NfcNormalizeExpr(str)))
    GenerateUnsafeProjection.generate(Seq(JsonValidExpr(str)))
  }

  test("word-n-gram expressions compile under Janino") {
    val toks = BoundReference(0,
      ArrayType(org.apache.spark.sql.types.StringType), nullable = true)
    GenerateUnsafeProjection.generate(Seq(WordNgramsExpr(toks, 3, minOne = false)))
    GenerateUnsafeProjection.generate(Seq(WordNgramsExpr(toks, 3, minOne = true)))
    GenerateUnsafeProjection.generate(Seq(
      WordNgramH64Expr(toks, 8, "sd|", minOne = false)))
    GenerateUnsafeProjection.generate(Seq(WordNgramStructsExpr(toks, 2)))
    GenerateUnsafeProjection.generate(Seq(TokenLengthSumExpr(toks)))
    GenerateUnsafeProjection.generate(Seq(WordNgramH64CharsExpr(toks, 5)))
    GenerateUnsafeProjection.generate(Seq(WordNgramBandsExpr(toks, 2, 4)))
    val str2 = BoundReference(0, org.apache.spark.sql.types.StringType,
      nullable = true)
    GenerateUnsafeProjection.generate(Seq(CharNgramsExpr(str2, 3)))
    GenerateUnsafeProjection.generate(Seq(
      WordNgramH64CharsBandsExpr(toks, 5, 10)))
    GenerateUnsafeProjection.generate(Seq(SimHash16Expr(toks)))
    val strRef = BoundReference(0, org.apache.spark.sql.types.StringType,
      nullable = true)
    GenerateUnsafeProjection.generate(Seq(H64Expr(strRef, "cm0|")))
    GenerateUnsafeProjection.generate(Seq(GopherRepetitionExpr(toks)))
    GenerateUnsafeProjection.generate(Seq(
      CountMatchingExpr(toks, "^[-•*]", CountKernels.TrimLeft)))
    GenerateUnsafeProjection.generate(Seq(
      CountInSetExpr(toks, Seq("the", "a"))))
    val spansRef = BoundReference(1, ArrayType(
      StructType(Seq(StructField("s", LongType), StructField("e", LongType)))),
      nullable = true)
    GenerateUnsafeProjection.generate(Seq(SpanCutExpr(toks, spansRef)))
    val longRef = BoundReference(2, LongType, nullable = true)
    GenerateUnsafeProjection.generate(Seq(BloomMightContainLong(longRef,
      org.apache.spark.util.sketch.BloomFilter.create(100, 0.01))))
    val longs = BoundReference(0,
      ArrayType(org.apache.spark.sql.types.LongType), nullable = true)
    GenerateUnsafeProjection.generate(Seq(WinnowSelectExpr(longs, 4)))
    GenerateUnsafeProjection.generate(Seq(
      BpeEncodedLenSumExpr(toks, Seq("a" -> "b", "ab" -> "c"))))
    val nbW = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
      Array[Double]]()
    nbW.put(org.apache.spark.unsafe.types.UTF8String.fromString("abc"),
      Array(0.1, 0.2))
    GenerateUnsafeProjection.generate(Seq(NbScoreMultiExpr(toks,
      NbScoreKernel.LocalMultiModel(Array("de", "en"), Array(-0.5, -0.7), nbW))))
    val lmUni = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]()
    lmUni.put(org.apache.spark.unsafe.types.UTF8String.fromString("a"), 2L)
    val lmInner = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]()
    lmInner.put(org.apache.spark.unsafe.types.UTF8String.fromString("b"), 1L)
    val lmBi = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
      java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]]()
    lmBi.put(org.apache.spark.unsafe.types.UTF8String.fromString("a"), lmInner)
    val lmTri = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
      java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
        java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]]]()
    lmTri.put(org.apache.spark.unsafe.types.UTF8String.fromString("a"), lmBi)
    GenerateUnsafeProjection.generate(Seq(LmScoreBigramExpr(toks,
      LmScoreKernel.LocalBigramModel(lmUni, lmBi, 2L))))
    GenerateUnsafeProjection.generate(Seq(LmScoreBackoffExpr(toks,
      LmScoreKernel.LocalBackoffModel(lmUni, lmBi, lmTri, 5L, 2L))))
  }

  test("vector expressions compile under Janino") {
    val b = BoundReference(1, ArrayType(FloatType), nullable = true)
    GenerateUnsafeProjection.generate(Seq(DotProductF(vecIn, b)))
    GenerateUnsafeProjection.generate(Seq(Int8CodesExpr(vecIn)))
    val l1 = BoundReference(0, ArrayType(org.apache.spark.sql.types.LongType),
      nullable = true)
    val l2 = BoundReference(1, ArrayType(org.apache.spark.sql.types.LongType),
      nullable = true)
    GenerateUnsafeProjection.generate(Seq(DotProductL(l1, l2)))
  }
}
