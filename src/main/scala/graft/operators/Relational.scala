package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational operators over the TPC-H-ish star schema.
  *
  * Float determinism (see SURVEY.md §4): every SUM over a double column
  * goes through DECIMAL(18,4) — decimal addition is exact and
  * associative, so shuffle/partial-agg order cannot perturb low bits —
  * then back to DOUBLE for a schema that matches the DuckDB oracle.
  */
object Relational {

  /** Exact, order-insensitive sum of a double expression. */
  private def dsum(e: Column): Column =
    sum(e.cast(DecimalType(18, 4))).cast("double")

  /** Decimal views of the lineitem money columns. Raw columns are
    * value-generated at ≤2 decimal places, so a cast with guard digits
    * (scale 4/6) is bit-identical across engines; products of fully
    * computed doubles are NOT (Spark casts via shortest string repr,
    * DuckDB via exact binary), so all arithmetic happens in decimal.
    */
  private def dPrice = col("l_extendedprice").cast(DecimalType(12, 4))
  private def dDisc1 = (lit(1.0) - col("l_discount")).cast(DecimalType(8, 6))
  private def dTax1 = (lit(1.0) + col("l_tax")).cast(DecimalType(8, 6))

  /** q01: pricing summary — multi-aggregate groupBy on the fact table.
    * Scale: partial aggregation map-side; 6 groups total so the final
    * shuffle is negligible at any SF.
    */
  def q01(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dPrice * dDisc1).cast(DecimalType(24, 6)).cast("double")
          .as("sum_disc_price"),
        sum(dPrice * dDisc1 * dTax1).cast(DecimalType(24, 6)).cast("double")
          .as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(8,6))) AS DECIMAL(24,6)) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(8,6)) AS DECIMAL(28,10)) * CAST(1.0 + l_tax AS DECIMAL(8,6))) AS DECIMAL(24,6)) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
