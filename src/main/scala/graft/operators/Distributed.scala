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
    * long) and `cum_w` (inclusive running sum of `weight`, long).
    *
    * `order` must be a total order (include a tiebreaker column);
    * `weight` must be a non-null integral column.
    */
  def orderedPrefix(df: DataFrame, order: Seq[Column],
      weight: Column): DataFrame = {
    val spark = df.sparkSession
    val parts = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_w", weight.cast("long"))
      .withColumn("_pid", spark_partition_id())
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
      .drop("_pid", "_row_off", "_w_off", "_w")
  }
}
