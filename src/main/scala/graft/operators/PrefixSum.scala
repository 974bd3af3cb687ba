package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Distributed running total — the scale-correct form of
  * `sum(x) OVER (ORDER BY k)`.
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
  *  3. one narrow mapPartitions pass adds offset + local running sum.
  *
  * The ranged frame is persisted across the two passes: range boundaries
  * come from sampling, so the totals pass and the output pass must see
  * the SAME physical partitioning, not a recomputed one.
  */
object PrefixSum {

  /** Append `outCol` = running total of `valueCol` (long) in ascending
    * `sortCol` order. Output rows keep their sorted order.
    *
    * @param partitions range-partition count; 0 = the session's shuffle
    *                   parallelism
    */
  def withRunningTotal(df: DataFrame, sortCol: String, valueCol: String,
      outCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(p, col(sortCol))
      .sortWithinPartitions(sortCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vIdx = ranged.schema.fieldIndex(valueCol)
    require(ranged.schema(vIdx).dataType == LongType,
      s"$valueCol must be long (cast first); got ${ranged.schema(vIdx).dataType}")

    // Phase 1+2: per-partition totals → exclusive offsets on the driver.
    val partTotals = ranged.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _) // exclusive scan, length P+1
    val bc = spark.sparkContext.broadcast(offsets)

    // Phase 3: narrow pass, offset + local running sum.
    val outRdd = ranged.rdd.mapPartitionsWithIndex { (i, it) =>
      var run = bc.value(i)
      it.map { r =>
        if (!r.isNullAt(vIdx)) run += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    spark.createDataFrame(outRdd, ranged.schema.add(outCol, LongType))
  }
}
