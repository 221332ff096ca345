package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed building blocks for operations that look global but
  * must not funnel through one task.
  */
object Distributed {

  /** Global rank + inclusive running sum over a TOTAL order, computed
    * without a single-partition window:
    *
    *  1. range-partition on the order key (each partition holds a
    *     contiguous slice of the global order) and sort within
    *     partitions;
    *  2. aggregate per-partition row/weight subtotals — one row per
    *     partition to the driver (the same tiny-collect shape as the
    *     IVF probe cells);
    *  3. broadcast the prefix offsets back and run PARTITION-LOCAL
    *     windows: global rank = offset + local row_number, global
    *     running sum = offset + local running sum.
    *
    * Exact for any partition boundaries because the order is total —
    * a naive `Window.orderBy` computes the same thing through one
    * task holding the whole relation. Adds columns `rank` (1-based,
    * long), `cum_w` (inclusive running sum of `weight`, long) and
    * `total_w` (grand total, long — free from the offsets pass, so
    * callers needing a share-of-total never rescan the input).
    *
    * `order` must be a total order (include a tiebreaker column);
    * `weight` must be a non-null integral column; the input must not
    * already contain `rank`/`cum_w`/`total_w` or `_`-prefixed working
    * columns.
    */
  def orderedPrefix(df: DataFrame, order: Seq[Column],
      weight: Column): DataFrame = {
    val reserved = Seq("rank", "cum_w", "total_w", "_w", "_pid",
      "_row_off", "_w_off")
    require(!df.columns.exists(reserved.contains),
      s"orderedPrefix reserves columns ${reserved.mkString(", ")}")
    val spark = df.sparkSession
    // localCheckpoint pins the partition layout: the offsets collect
    // below and the ranking query must see the SAME partitioning —
    // an unpinned plan re-executes the range shuffle per job, and
    // RangePartitioner's sampled boundaries are not stable across
    // executions, which would silently misalign the offsets
    val parts = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_w", weight.cast("long"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val partStats = parts.groupBy(col("_pid"))
      .agg(count(lit(1)).as("rows"), sum(col("_w")).as("wsum"))
      .collect().sortBy(_.getInt(0))
    var rowOff = 0L
    var wOff = 0L
    val offsets = partStats.map { r =>
      val o = (r.getInt(0), rowOff, wOff)
      rowOff += r.getLong(1); wOff += r.getLong(2); o
    }.toSeq
    val offDf = spark.createDataFrame(offsets)
      .toDF("_pid", "_row_off", "_w_off")
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
    parts.join(broadcast(offDf), Seq("_pid"))
      .withColumn("rank",
        row_number().over(w).cast("long") + col("_row_off"))
      .withColumn("cum_w",
        sum(col("_w")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          + col("_w_off"))
      .withColumn("total_w", lit(wOff))
      .drop("_pid", "_row_off", "_w_off", "_w")
  }
}
