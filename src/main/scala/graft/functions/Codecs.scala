package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.model.DeliveryStatus

/** Envelope codecs + 3-way status routing as pure Catalyst expressions —
  * the Spark re-expression of the reference's per-record Lambda loop
  * (kds_example/lbd/common.py:12-31, kds_example/kds_helper.py:29-63).
  * The CPython for-loop becomes one codegen'd projection; statuses become
  * a CASE column; the DropIt control-flow exception becomes a predicate.
  */
object Codecs {

  /** base64 wire form → raw bytes (reference common.py:14: b64decode). */
  def decodeBase64(data: Column): Column = unbase64(data)

  /** Name of the corrupt-record marker field (Spark's PERMISSIVE-mode
    * convention): non-null ⇔ the `json.loads` failure path that routes to
    * ProcessingFailed (reference kds_helper.py:49-51).
    */
  val CorruptField = "_corrupt_record"

  /** raw NDJSON bytes → typed payload struct. PERMISSIVE from_json yields
    * an all-null struct (not null) on bad input, so corruption is
    * detected via the dedicated corrupt-record column.
    */
  def decodeJson(data: Column, schema: StructType): Column =
    from_json(data.cast("string"), schema.add(CorruptField, "string"),
      Map("columnNameOfCorruptRecord" -> CorruptField))

  def isCorrupt(decoded: Column): Column =
    decoded.isNull || decoded.getField(CorruptField).isNotNull

  /** payload struct → NDJSON bytes (reference common.py:27-29:
    * `json.dumps(...) + "\n"` then b64encode; base64 applied separately).
    */
  def encodeJson(payload: Column): Column =
    concat(to_json(payload), lit("\n")).cast("binary")

  def encodeBase64(data: Column): Column = base64(data)

  /** 3-way routing column. Decode failure → ProcessingFailed; user drop
    * predicate → Dropped; else Ok. Non-Ok records keep the RAW payload
    * (reference kds_helper.py:47-51,56-61 routes the original bytes).
    */
  def route(decoded: Column, dropIf: Column): Column =
    when(isCorrupt(decoded), DeliveryStatus.ProcessingFailed)
      .when(coalesce(dropIf, lit(false)), DeliveryStatus.Dropped)
      .otherwise(DeliveryStatus.Ok)

  /** Full transform stage over an envelope frame with binary NDJSON
    * `data`: returns recordId, result, data (transformed payload when Ok,
    * raw bytes otherwise) + the decoded payload for downstream sinks.
    *
    * @param transform identity by default — both deployed reference
    *   lambdas are identity (lbd/to_s3.py:6-7, lbd/to_oss.py:6-7).
    */
  def transformEnvelope(
      df: DataFrame,
      payloadSchema: StructType,
      dropIf: Column => Column,
      transform: Column => Column = identity): DataFrame = {
    val decoded = decodeJson(col("data"), payloadSchema)
    df.withColumn("payload", decoded)
      .withColumn("result", route(col("payload"), dropIf(col("payload"))))
      .withColumn("payload", col("payload").dropFields(CorruptField))
      .withColumn("out", transform(col("payload")))
      .withColumn("data",
        when(col("result") === DeliveryStatus.Ok, encodeJson(col("out")))
          .otherwise(col("data")))
      .select("recordId", "result", "data", "payload")
  }
}
