package graft.model

/** Core data model, derived from the reference's envelope/payload shapes.
  *
  * - Firehose input envelope: reference tests/test_lbd_to_s3.py:11-22
  *   (`recordId`, `approximateArrivalTimestamp` epoch-millis, `data`
  *   base64-of-NDJSON). Here `data` is the DECODED bytes — base64 is a
  *   wire-format detail that the codec layer handles.
  * - Output envelope: reference kds_example/lbd/common.py:24-30 adds
  *   `result`; payload is preserved raw on non-Ok.
  * - Status taxonomy: reference kds_example/kds_helper.py:43-51. The
  *   reference spells success both "OK" (kds_helper.py:45) and "Ok"
  *   (common.py:26); we normalize to the Firehose contract spelling.
  * - Payload: the `bank_account` record,
  *   reference data_producer/multi_process_producer.py:31-40.
  */
object DeliveryStatus {
  val Ok = "Ok"
  val Dropped = "Dropped"
  val ProcessingFailed = "ProcessingFailed"
  val all: Seq[String] = Seq(Ok, Dropped, ProcessingFailed)

  /** Audit channel prefixes, reference iac/s2_app.py:804-808 via
    * debug/s2_inspect_data_in_s3.py:11-16.
    */
  val BackupPrefix = "01-backup"
  val BackupFailedPrefix = "02-backup-failed"
  val SuccessPrefix = "03-success"
  val FailedPrefix = "04-failed"
}

final case class FirehoseRecord(
    recordId: String,
    approximateArrivalTimestamp: Long,
    data: Array[Byte])

final case class RoutedRecord(
    recordId: String,
    result: String,
    data: Array[Byte])

final case class BankAccount(
    id: String,
    firstname: String,
    lastname: String,
    description: String,
    balance: Int)
