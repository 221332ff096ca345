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

  /** q02: filter + narrow projection — both must reach the parquet scan
    * (PushedFilters + pruned ReadSchema); no shuffle at all.
    */
  def q02(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate").between(
        lit("1997-01-01").cast("timestamp"), lit("1997-03-31").cast("timestamp"))
        && col("l_quantity") >= 45.0 && col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-03-31'
      |  AND l_quantity >= 45.0 AND l_discount > 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q03: fact⋈fact⋈dim revenue rollup. customer is small relative to
    * the facts → broadcast; orders⋈lineitem shuffles on orderkey with
    * map-side partial aggregation above it.
    */
  def q03(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(
        sum(dPrice * dDisc1).cast(DecimalType(24, 6)).cast("double")
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("c_mktsegment"), col("o_orderstatus"))
  }

  val q03Sql: String =
    """SELECT c_mktsegment, o_orderstatus,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(8,6))) AS DECIMAL(24,6)) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderstatus
      |ORDER BY c_mktsegment, o_orderstatus""".stripMargin

  /** q04: pure dimension join chain, all broadcast — zero shuffle joins. */
  def q04(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    s.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum(col("s_acctbal").cast(DecimalType(18, 4))).cast("double")
          .as("total_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q04Sql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_suppliers,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** q05: top-5 orders per priority — row_number window with a total
    * tie-break so results are engine-independent.
    */
  def q05(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  val q05Sql: String =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 5
      |ORDER BY o_orderpriority, rn""".stripMargin

  /** q06: global top-k → Spark plans TakeOrderedAndProject (no full
    * sort at scale, per-partition heaps + single reduce).
    */
  def q06(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
      .limit(100)

  val q06Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 100""".stripMargin

  /** q07: distinct projection (shuffle dedup w/ partial agg). */
  def q07(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey")).distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  val q07Sql: String =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** q08: union-all of tagged branches + re-aggregation. Both branches
    * scan the same table — Spark reuses the exchange under AQE.
    */
  def q08(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    val cheap = p.filter(col("p_retailprice") < 930.0)
      .select(col("p_brand"), lit("cheap").as("bucket"))
    val pricey = p.filter(col("p_retailprice") >= 970.0)
      .select(col("p_brand"), lit("pricey").as("bucket"))
    cheap.unionAll(pricey)
      .groupBy(col("p_brand"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("p_brand"), col("bucket"))
  }

  val q08Sql: String =
    """SELECT p_brand, bucket, COUNT(*) AS n FROM (
      |  SELECT p_brand, 'cheap' AS bucket FROM part WHERE p_retailprice < 930.0
      |  UNION ALL
      |  SELECT p_brand, 'pricey' AS bucket FROM part WHERE p_retailprice >= 970.0)
      |GROUP BY p_brand, bucket
      |ORDER BY p_brand, bucket""".stripMargin

  /** q09: EXISTS — left-semi join (build side is distinct keys only). */
  def q09(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000.0)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q09Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  /** q10: NOT EXISTS — left-anti join. */
  def q10(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > 450000.0)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
      |ORDER BY c_custkey""".stripMargin

  /** q11: hierarchical ROLLUP; grand-total/subtotal keys COALESCEd so
    * the oracle compare never sees NULL grouping keys.
    */
  def q11(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double")
          .as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n_orders"), col("total_price"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  val q11Sql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
      |  COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** q12: pivot-style conditional aggregation (one scan, no joins). */
  def q12(spark: SparkSession, dir: String): DataFrame = {
    def qtyWhere(flag: String): Column =
      sum(when(col("l_returnflag") === flag, col("l_quantity"))
        .otherwise(lit(0.0)).cast(DecimalType(18, 4))).cast("double")
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        qtyWhere("A").as("qty_a"),
        qtyWhere("N").as("qty_n"),
        qtyWhere("R").as("qty_r"),
        count(lit(1)).as("n"))
      .orderBy(col("l_linestatus"))
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS qty_a,
      |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS qty_n,
      |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS qty_r,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** q13: calendar bucketing via date_trunc (codegen'd, no UDF). */
  def q13(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double")
          .as("total_price"))
      .orderBy(col("month"))

  val q13Sql: String =
    """SELECT date_trunc('month', o_orderdate) AS month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY date_trunc('month', o_orderdate)
      |ORDER BY month""".stripMargin

  /** q14: string function pipeline, row-level (whole-stage codegen). */
  def q14(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_pfx"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  val q14Sql: String =
    """SELECT p_partkey, UPPER(p_brand) AS brand_u, LENGTH(p_name) AS name_len,
      |  SUBSTR(p_type, 1, 5) AS type_pfx,
      |  p_brand || '#' || p_type AS brand_type
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** q15: HAVING — filter above the aggregate. */
  def q15(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double")
          .as("total_qty"))
      .filter(col("n_items") > 550)
      .orderBy(col("l_suppkey"))

  val q15Sql: String =
    """SELECT l_suppkey, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
      |FROM lineitem
      |GROUP BY l_suppkey
      |HAVING COUNT(*) > 550
      |ORDER BY l_suppkey""".stripMargin

  /** q16: scalar-subquery filter — the 1-row aggregate is broadcast,
    * not collected to the driver.
    */
  def q16(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    val avgRp = p.agg(
      (sum(col("p_retailprice").cast(DecimalType(18, 4))).cast("double")
        / count(lit(1))).as("avg_rp"))
    p.join(broadcast(avgRp), col("p_retailprice") > col("avg_rp"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  val q16Sql: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |WHERE p_retailprice > (
      |  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      |  FROM part)
      |ORDER BY p_partkey""".stripMargin

  /** q17: cumulative window sum (decimal-exact running totals), bounded
    * to a supplier subset to keep verify output small; the plan is one
    * shuffle on the partition key + in-partition sort.
    */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "lineitem")
      .filter(col("l_suppkey") <= 20)
      .withColumn("running_qty",
        sum(col("l_quantity").cast(DecimalType(18, 4))).over(w)
          .cast("double"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"))
  }

  val q17Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_qty
      |FROM lineitem
      |WHERE l_suppkey <= 20
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin

  /** q18: gap-based sessionization (30-min inactivity) — lag + running
    * flag-sum inside one user_id partition, then per-session rollup.
    * One shuffle on user_id; the streaming twin lives in
    * [[graft.streaming.EventStreams]].
    */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sessions = Tables(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_ts").isNull
          || col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions.groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double")
          .as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val q18Sql: String =
    """WITH lagged AS (
      |  SELECT user_id, event_id, ts, value,
      |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |    OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM lagged),
      |sess AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id_raw
      |  FROM flagged)
      |SELECT user_id, CAST(session_id_raw AS BIGINT) AS session_id,
      |  COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
      |FROM sess
      |GROUP BY user_id, session_id_raw
      |ORDER BY user_id, session_id_raw""".stripMargin

  /** q19: as-of join — for every purchase event, the most recent
    * prior-or-equal view event of the same user. Spark has no native
    * ASOF JOIN; the scalable composition is the tag-union + ignoreNulls
    * last() carry-forward window: one shuffle on user_id, linear scan
    * per partition — the same shape a custom SparkPlan would produce,
    * with no all-pairs or range-join blowup.
    */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        when(col("event_type") === "view", col("ts")).as("view_ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_view_ts", last(col("view_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("last_view_ts"))
      .orderBy(col("user_id"), col("purchase_ts"), col("purchase_id"))
  }

  val q19Sql: String =
    """WITH tagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN event_type = 'view' THEN ts END AS view_ts
      |  FROM events
      |  WHERE event_type IN ('view', 'purchase')),
      |e AS (
      |  SELECT *, LAST_VALUE(view_ts IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts
      |  FROM tagged)
      |SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, last_view_ts
      |FROM e
      |WHERE event_type = 'purchase'
      |ORDER BY user_id, purchase_ts, purchase_id""".stripMargin
}
