package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark DataFrame pipeline plus (optionally) the
  * equivalent ANSI SQL the DuckDB oracle runs over the same parquet tables.
  *
  * Conventions (oracle-parity rules, see SURVEY.md §2B / FIXTURES.md §3):
  *  - every query ends in a total ORDER BY (tie-breaks on key columns);
  *  - doubles that result from arithmetic are wrapped in round(x, 2) on
  *    BOTH sides;
  *  - timestamps are never emitted raw: cast to DATE (midnight-aligned
  *    columns) or formatted to a string with an explicit pattern;
  *  - computed integers are coerced to the same width on both sides
  *    (DuckDB year()/length()/ceil() widths differ from Spark's);
  *  - booleans are emitted as INT (0/1).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String]
)(val build: (SparkSession, String) => DataFrame)

object Tables {
  import org.apache.spark.sql.functions._

  /** All testdata tables ship as one parquet file per table. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped as two different parquet types across
    * testdata generations, so the reader adapts to the file's schema
    * instead of assuming one:
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *    outright; legacy long mode reads raw nanos, truncated here to
    *    micros — exactly what DuckDB does when it loads the same file
    *    into its micro-precision TIMESTAMP.
    *  - timestamp[us] with isAdjustedToUTC=false: arrives as
    *    TIMESTAMP_NTZ; cast to the session-zone type every downstream
    *    query expects. All graft sessions pin the session zone to UTC,
    *    so the cast preserves the wall-clock value DuckDB sees in its
    *    naive TIMESTAMP read of the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already the session-zone timestamp type
    }
  }
}

/** Oracle-parity helpers (see QueryDef scaladoc).
  *
  * `r2` is round-half-up-to-2-decimals spelled as explicit double
  * arithmetic: `floor(x*100 + 0.5)/100`. Spark's `round` rounds the
  * shortest decimal repr of the double (BigDecimal.valueOf) while C-family
  * engines round the binary value — e.g. round(1222.745, 2) is 1222.75 in
  * Spark but 1222.74 in DuckDB. Spelling the formula out forces BOTH
  * engines through the same IEEE ops, so results are bit-equal. The SQL
  * oracles inline the same formula.
  */
object Par {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  def r2(c: Column): Column = floor(c * 100 + lit(0.5)) / 100

  /** SQL form of [[r2]] for oracle strings. */
  def r2sql(e: String): String = s"floor(($e) * 100 + 0.5) / 100"

  /** 4-decimal variant for scores whose interesting range sits near
    * zero (e.g. KL divergences), where [[r2]] would collapse every
    * value to 0.00. Same engine-portable construction.
    */
  def r4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000

  /** SQL form of [[r4]] for oracle strings. */
  def r4sql(e: String): String = s"floor(($e) * 10000 + 0.5) / 10000"
}
