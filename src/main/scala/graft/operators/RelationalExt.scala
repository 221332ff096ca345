package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Extended relational coverage beyond the q01–q19 core: CUBE /
  * pivot / exact percentiles / set ops / full-outer join / lateral
  * explode / JSON extraction / range join. Same determinism rules as
  * [[Relational]] (SURVEY.md §4): double sums ride through
  * DECIMAL(18,4); integer counts stay integral; every query ends in a
  * total order.
  */
object RelationalExt {

  private def dsum(e: Column): Column =
    sum(e.cast(DecimalType(18, 4))).cast("double")

  /** q80: CUBE aggregate — all four grouping-set combinations in one
    * pass (Spark expands to a single Expand + hash-agg; partial agg
    * still applies map-side, so the shuffle carries 4× group rows, not
    * 4× input rows).
    */
  def q80(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n_orders"), col("total_price"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  val q80Sql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
      |  COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  private val Priorities = Seq(
    "1-URGENT" -> "p_urgent", "2-HIGH" -> "p_high", "3-MEDIUM" -> "p_medium",
    "4-NOT SPECIFIED" -> "p_notspec", "5-LOW" -> "p_low")

  /** q81: true relational pivot via `RelationalGroupedDataset.pivot`
    * with an explicit value list (no extra distinct-values job, which
    * at 100 TB would be a full extra scan). Missing cells coalesce to
    * 0 to match SQL's FILTER-count semantics; pivot columns are
    * re-aliased to parquet-safe names.
    */
  def q81(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", Priorities.map(_._1))
      .agg(count(lit(1)))
      .select(col("o_orderstatus") +:
        Priorities.map { case (v, a) =>
          coalesce(col(s"`$v`"), lit(0L)).as(a)
        }: _*)
      .orderBy(col("o_orderstatus"))

  val q81Sql: String = {
    val cols = Priorities.map { case (v, a) =>
      s"COUNT(*) FILTER (WHERE o_orderpriority = '$v') AS $a"
    }.mkString(",\n  ")
    s"""SELECT o_orderstatus,
       |  $cols
       |FROM orders
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin
  }

  /** q82: exact percentiles (linear interpolation) per group — Spark's
    * `percentile` aggregate against DuckDB's `quantile_cont`; both use
    * the type-7 (n−1)·p rule, and IEEE interpolation arithmetic is
    * correctly rounded, so the doubles match bit-for-bit. At 100 TB
    * exact percentiles need a per-group sort; switch to
    * `percentile_approx` (t-digest, mergeable map-side) when groups
    * get huge — kept exact here because the oracle must hash-match.
    */
  def q82(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        min(col("l_quantity")).as("qmin"),
        max(col("l_quantity")).as("qmax"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val q82Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.9) AS p90,
      |  MIN(l_quantity) AS qmin,
      |  MAX(l_quantity) AS qmax,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q83: INTERSECT / EXCEPT (distinct set semantics). Spark plans
    * both as aggregated semi/anti joins over distinct inputs — the
    * same shuffle shape as q09/q10 plus a pre-distinct.
    */
  def q83(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_nationkey").as("nationkey"))
    val sn = Tables(spark, dir, "supplier")
      .filter(col("s_acctbal") > 8000.0)
      .select(col("s_nationkey").as("nationkey"))
    val both = cn.intersect(sn).withColumn("membership", lit("both"))
    val custOnly = cn.except(sn).withColumn("membership", lit("cust_only"))
    both.unionAll(custOnly)
      .select(col("membership"), col("nationkey"))
      .orderBy(col("membership"), col("nationkey"))
  }

  val q83Sql: String =
    """SELECT 'both' AS membership, nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  INTERSECT
      |  SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000.0)
      |UNION ALL
      |SELECT 'cust_only', nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  EXCEPT
      |  SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000.0)
      |ORDER BY membership, nationkey""".stripMargin

  /** q84: FULL OUTER join of two pre-aggregated sides — aggregate
    * first (tiny per-key outputs), join after; never full-outer the
    * raw facts. Unmatched sides surface as 0 via COALESCE.
    */
  def q84(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
      .filter(col("c_acctbal") > 9000.0)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val s = Tables(spark, dir, "supplier")
      .filter(col("s_acctbal") > 9000.0)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  val q84Sql: String =
    """WITH c AS (
      |  SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer
      |  WHERE c_acctbal > 9000.0 GROUP BY 1),
      |s AS (
      |  SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier
      |  WHERE s_acctbal > 9000.0 GROUP BY 1)
      |SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
      |  COALESCE(n_cust, 0) AS n_cust,
      |  COALESCE(n_supp, 0) AS n_supp
      |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
      |ORDER BY nationkey""".stripMargin

  /** q85: lateral explode — unnest `p_name` into words and aggregate
    * per word. The explode happens after a 2-column projection so the
    * row fan-out never carries the wide part row.
    */
  def q85(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("p_partkey")).as("n_parts"))
      .orderBy(col("word"))

  val q85Sql: String =
    """SELECT word, COUNT(*) AS n, COUNT(DISTINCT p_partkey) AS n_parts
      |FROM (
      |  SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
      |  FROM part)
      |WHERE word <> ''
      |GROUP BY word
      |ORDER BY word""".stripMargin

  /** q86: JSON extraction from the `events.props` payload column —
    * `get_json_object` path evaluation in codegen, no UDF, aggregated
    * by event type. Integer sums stay exact; avg is one double
    * division at the end.
    */
  def q86(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables(spark, dir, "events")
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .withColumn("avg_k", col("sum_k").cast("double") / col("n"))
      .orderBy(col("event_type"))
  }

  val q86Sql: String =
    """SELECT event_type,
      |  COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
      |  CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k
      |FROM (
      |  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |  FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q87: range join with an equi-key prefix — for every `error`
    * event, the same user's `click` activity in the preceding 30
    * minutes. The user_id equi-condition keeps this a hash join
    * (range predicate applied post-match inside the join), so per-key
    * fan-out is bounded by per-user event counts — no cross product.
    * For keyless range joins, bucket both sides by
    * `floor(ts / range)` and join on adjacent buckets (same shape as
    * the LSH band join in [[Dedup.q32]]).
    */
  def q87(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    // explicit renames on the probe side — a self-join on the same
    // source DataFrame must not lean on Spark's attribute
    // auto-disambiguation
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"),
        col("ts").as("error_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    errors.join(clicks,
      col("user_id") === col("click_user")
        && col("click_ts") >= col("error_ts") - expr("INTERVAL 30 MINUTES")
        && col("click_ts") <= col("error_ts"),
      "left")
      .groupBy(col("user_id"), col("error_id"), col("error_ts"))
      .agg(
        count(col("click_ts")).as("n_clicks"),
        coalesce(
          sum(col("click_value").cast(DecimalType(18, 4))).cast("double"),
          lit(0.0)).as("click_value"))
      .orderBy(col("user_id"), col("error_id"))
  }

  val q87Sql: String =
    """SELECT e.user_id, e.event_id AS error_id, e.ts AS error_ts,
      |  COUNT(c.ts) AS n_clicks,
      |  COALESCE(CAST(SUM(CAST(c.value AS DECIMAL(18,4))) AS DOUBLE), 0.0)
      |    AS click_value
      |FROM events e
      |LEFT JOIN events c ON c.user_id = e.user_id AND c.event_type = 'click'
      |  AND c.ts >= e.ts - INTERVAL 30 MINUTE AND c.ts <= e.ts
      |WHERE e.event_type = 'error'
      |GROUP BY e.user_id, e.event_id, e.ts
      |ORDER BY e.user_id, error_id""".stripMargin
}
