package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, LongType}

/** Distributed running total / running max — the scale-correct forms of
  * `sum(x) OVER (ORDER BY k)` and
  * `max(x) OVER (ORDER BY k ROWS ... 1 PRECEDING)`.
  *
  * Spark executes an ORDER-BY window with no PARTITION BY as a single-
  * partition WindowExec: the entire corpus flows through ONE task (the
  * planner even warns). Fine at test scale, a non-starter at 100 TB. The
  * classic fix is the two-phase prefix sum:
  *
  *  1. range-repartition by the sort key + sort within partitions — the
  *     one shuffle ANY global ordering needs;
  *  2. per-partition totals: P tiny (index, sum) rows to the driver,
  *     which exclusive-scans them into per-partition offsets — driver
  *     state is O(partitions), never O(rows);
  *  3. one narrow pass adds offset + local running sum.
  *
  * Frame semantics match SQL's default RANGE frame: rows with EQUAL sort
  * keys (peers) all receive the peer-group-closing total — which also
  * makes the result deterministic under duplicate keys, where a
  * ROWS-style scan would depend on arbitrary tie order. Peers share one
  * range partition (the range partitioner assigns by key), so the final
  * pass buffers at most one peer group at a time.
  *
  * No caching: both passes hang off the SAME shuffle dependency, so the
  * exchange's map output is written once and re-read by the second job —
  * the upstream scan does not rerun, and there is no persisted plan for
  * the caller to leak.
  */
object PrefixSum {

  /** Append `outCol` = running total of `valueCol` (long) in ascending
    * `sortCol` order, peers inclusive (SQL RANGE frame). Output rows
    * keep their sorted order.
    *
    * @param partitions range-partition count; 0 = the session's shuffle
    *                   parallelism
    */
  def withRunningTotal(df: DataFrame, sortCol: String, valueCol: String,
      outCol: String, partitions: Int = 0): DataFrame = {
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be long (cast first); got ${df.schema(valueCol).dataType}")
    require(!df.columns.contains(outCol), s"column $outCol already exists")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // SQL RANGE peers include -0.0 with 0.0; Java-compare-based range
    // boundaries treat them as distinct keys and could split the zero
    // peer group across partitions (breaking the one-partition-per-peer-
    // group invariant the final pass relies on). Partition and sort on a
    // normalized key; rows keep their raw values.
    val keyCol = df.schema(sortCol).dataType match {
      case DoubleType | FloatType =>
        when(col(sortCol) === 0, lit(0).cast(df.schema(sortCol).dataType))
          .otherwise(col(sortCol))
      case _ => col(sortCol)
    }
    val ranged = df
      .repartitionByRange(p, keyCol)
      .sortWithinPartitions(keyCol)
    val kIdx = ranged.schema.fieldIndex(sortCol)
    val vIdx = ranged.schema.fieldIndex(valueCol)

    // Phase 1+2: per-partition (total, sawNonNull) → exclusive offsets.
    // The null flag mirrors SQL: sum() over an all-NULL prefix is NULL,
    // not 0 — a row's running total is NULL until the first non-null
    // value anywhere at or before it.
    val partStats = ranged.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L; var saw = false
        it.foreach { r => if (!r.isNullAt(vIdx)) { s += r.getLong(vIdx); saw = true } }
        Iterator((i, s, saw))
      }
      .collect().sortBy(_._1)
    // Plain closure capture, NOT a broadcast: both arrays are
    // O(partitions) (a few hundred bytes), so shipping them in each task
    // closure costs nothing — and a broadcast here would accumulate
    // executor-side blocks across repeated calls in a long-lived session
    // (the returned DataFrame is lazy, so there is no safe point to
    // destroy it eagerly; ContextCleaner GC timing is unbounded).
    val offsets = partStats.map(_._2).scanLeft(0L)(_ + _) // exclusive, length P+1
    val sawBefore = partStats.map(_._3).scanLeft(false)(_ || _)

    // Phase 3: narrow pass; emit each peer group with its closing total.
    val outRdd = ranged.rdd.mapPartitionsWithIndex { (i, it) =>
      new Iterator[Row] {
        private val in = it.buffered
        private var run = offsets(i)
        private var seen = sawBefore(i)
        private var group: Iterator[Row] = Iterator.empty
        override def hasNext: Boolean = group.hasNext || in.hasNext
        override def next(): Row = {
          if (!group.hasNext) {
            val key = canonKey(in.head.get(kIdx))
            val peers = Vector.newBuilder[Row]
            while (in.hasNext && canonKey(in.head.get(kIdx)) == key) {
              val r = in.next()
              if (!r.isNullAt(vIdx)) { run += r.getLong(vIdx); seen = true }
              peers += r
            }
            val total: Any = if (seen) run else null
            group = peers.result().iterator.map(r => Row.fromSeq(r.toSeq :+ total))
          }
          group.next()
        }
      }
    }
    spark.createDataFrame(outRdd, ranged.schema.add(outCol, LongType))
  }

  /** Append `outCol` = running max of `valueCol` over STRICTLY EARLIER
    * rows in ascending `sortCol` order — the scale-correct form of
    * `max(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND
    * 1 PRECEDING)`, which Spark would otherwise execute as a single-
    * partition WindowExec. q39's watermark contract is the motivating
    * case: each arrival is judged against the high-water mark of
    * everything BEFORE it. The first row gets NULL and null values
    * never advance the max (SQL max ignores nulls).
    *
    * Deterministic iff `sortCol` is unique — the exclusive ROWS frame's
    * own contract (with ties, which row is "previous" is arbitrary in
    * the SQL form too); q39 orders by the unique event_id. Same
    * two-phase shape as [[withRunningTotal]]: one range exchange,
    * O(partitions) driver state, one narrow final pass, and both passes
    * hang off the same shuffle dependency (no recompute, no cache).
    *
    * `outCol` keeps `valueCol`'s type; any orderable atomic type works
    * (numeric, string, timestamp, date, decimal, boolean).
    */
  def withRunningMaxExclusive(df: DataFrame, sortCol: String,
      valueCol: String, outCol: String, partitions: Int = 0): DataFrame = {
    require(!df.columns.contains(outCol), s"column $outCol already exists")
    val vDt = df.schema(valueCol).dataType
    require(orderableAtomic(vDt), s"$valueCol must be an orderable atomic type; got $vDt")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val keyCol = df.schema(sortCol).dataType match {
      case DoubleType | FloatType =>
        when(col(sortCol) === 0, lit(0).cast(df.schema(sortCol).dataType))
          .otherwise(col(sortCol))
      case _ => col(sortCol)
    }
    val ranged = df
      .repartitionByRange(p, keyCol)
      .sortWithinPartitions(keyCol)
    val vIdx = ranged.schema.fieldIndex(valueCol)

    // Phase 1+2: per-partition max → driver-side exclusive max scan
    // (null = no non-null value seen in any earlier partition).
    val partMax = ranged.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var m: Any = null
        it.foreach { r =>
          if (!r.isNullAt(vIdx)) {
            val v = r.get(vIdx)
            if (m == null || sqlCompare(v, m) > 0) m = v
          }
        }
        Iterator((i, m))
      }
      .collect().sortBy(_._1)
    // Closure capture, not broadcast — O(partitions), see withRunningTotal.
    val offsets: Array[Any] = partMax.map(_._2).scanLeft(null: Any) { (acc, m) =>
      if (m != null && (acc == null || sqlCompare(m, acc) > 0)) m else acc
    }

    // Phase 3: narrow pass — emit the pre-row max, then fold the row in.
    val outRdd = ranged.rdd.mapPartitionsWithIndex { (i, it) =>
      var m: Any = offsets(i)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ m)
        if (!r.isNullAt(vIdx)) {
          val v = r.get(vIdx)
          if (m == null || sqlCompare(v, m) > 0) m = v
        }
        out
      }
    }
    spark.createDataFrame(outRdd, ranged.schema.add(outCol, vDt))
  }

  private def orderableAtomic(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case LongType | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.ShortType
         | org.apache.spark.sql.types.ByteType
         | DoubleType | FloatType
         | org.apache.spark.sql.types.StringType
         | org.apache.spark.sql.types.TimestampType
         | org.apache.spark.sql.types.TimestampNTZType
         | org.apache.spark.sql.types.DateType
         | org.apache.spark.sql.types.BooleanType => true
      case _: org.apache.spark.sql.types.DecimalType => true
      case _ => false
    }

  /** All whitelisted external row types implement Comparable with SQL-
    * compatible semantics (java.lang.Double.compareTo even places NaN
    * last, matching Spark's sort order).
    */
  private object ComparableOrd extends Ordering[Any] with Serializable {
    def compare(a: Any, b: Any): Int = a.asInstanceOf[Comparable[Any]].compareTo(b)
  }

  /** Value comparison with SQL zero semantics: compareTo alone orders
    * -0.0 &lt; 0.0, so a running max that has seen -0.0 would "advance"
    * to a later 0.0 and surface the flipped sign bit where the
    * WindowExec form keeps the first-seen zero (SQL treats them equal,
    * max never advances on an equal value). Canonicalizing both sides
    * through [[canonKey]] makes ±0.0 compare as peers for float/double
    * values; all other whitelisted types pass through untouched.
    */
  private def sqlCompare(a: Any, b: Any): Int =
    ComparableOrd.compare(canonKey(a), canonKey(b))

  /** Peer equality must match SQL, not boxed Java equals: -0.0 and 0.0
    * are SQL peers (Double.equals says otherwise); NaN==NaN is already
    * true under boxed equals, matching SQL's all-NaNs-are-peers sort.
    */
  private def canonKey(a: Any): Any = a match {
    case d: java.lang.Double if d.doubleValue == 0.0 => java.lang.Double.valueOf(0.0)
    case f: java.lang.Float if f.floatValue == 0.0f => java.lang.Float.valueOf(0.0f)
    case x => x
  }
}
