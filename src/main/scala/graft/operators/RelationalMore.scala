package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Third relational tranche: sliding window frames, collection
  * aggregation, three-valued-logic semantics, datetime extraction.
  * Determinism per SURVEY.md §4 (decimal sums, total orders).
  */
object RelationalMore {

  /** q62: sliding-frame moving aggregate — 4-row trailing sum/average
    * per customer. The frame sum rides through DECIMAL so the oracle
    * hash-matches; the average is one double division by the frame
    * row count. One sort per partition, single Window operator.
    */
  def q62(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-3, Window.currentRow)
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
          .cast("double").as("mov_sum"),
        count(lit(1)).over(w).as("frame_n"))
      .withColumn("mov_avg", col("mov_sum") / col("frame_n"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q62Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
      |    AS mov_sum,
      |  COUNT(*) OVER w AS frame_n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
      |    / COUNT(*) OVER w AS mov_avg
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q63: order-basket aggregation — per order, the item multiset as a
    * canonical (numerically sorted, '|'-joined) string plus counts.
    * `collect_list` arrives in arbitrary shuffle order; `sort_array`
    * canonicalizes BEFORE the string join, which is what makes the
    * result deterministic and cross-engine comparable. Baskets stay
    * bounded (items per order), so the collected state is O(basket).
    */
  def q63(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double")
          .as("total_qty"),
        concat_ws("|",
          expr("transform(sort_array(collect_list(l_partkey)), x -> CAST(x AS STRING))"))
          .as("basket"))
      .orderBy(col("l_orderkey"))

  val q63Sql: String =
    """SELECT l_orderkey,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
      |  array_to_string(list_sort(list(l_partkey)), '|') AS basket
      |FROM lineitem
      |GROUP BY l_orderkey
      |ORDER BY l_orderkey""".stripMargin

  /** q64: string kitchen-sink beyond q14 — split_part / lpad /
    * translate / reverse / left / right, all codegen built-ins,
    * map-only (no shuffle; the ORDER BY is the verify-canonicalizer).
    */
  def q64(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"),
        expr("split_part(o_orderpriority, '-', 2)").as("pri_name"),
        lpad(col("o_orderstatus"), 3, "*").as("status_pad"),
        translate(col("o_orderpriority"), "-", " ").as("pri_spaced"),
        reverse(col("o_orderstatus")).as("status_rev"),
        expr("left(o_orderpriority, 3)").as("pri_left"),
        expr("right(o_orderpriority, 3)").as("pri_right"))
      .orderBy(col("o_orderkey"))

  val q64Sql: String =
    """SELECT o_orderkey,
      |  split_part(o_orderpriority, '-', 2) AS pri_name,
      |  lpad(o_orderstatus, 3, '*') AS status_pad,
      |  translate(o_orderpriority, '-', ' ') AS pri_spaced,
      |  reverse(o_orderstatus) AS status_rev,
      |  left(o_orderpriority, 3) AS pri_left,
      |  right(o_orderpriority, 3) AS pri_right
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** q67: UNPIVOT/melt — the wide conditional-count row set folded
    * back to long form with `Dataset.unpivot` (Spark's melt; an Expand
    * under the hood, no shuffle beyond the feeding aggregate).
    */
  def q67(spark: SparkSession, dir: String): DataFrame = {
    def cnt(p: String) =
      sum(when(col("o_orderpriority") === p, 1L).otherwise(0L))
    val wide = Tables(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        cnt("1-URGENT").as("n_urgent"),
        cnt("2-HIGH").as("n_high"),
        cnt("5-LOW").as("n_low"))
    wide.unpivot(
      Array(col("o_orderstatus")),
      Array(col("n_urgent"), col("n_high"), col("n_low")),
      "priority_bucket", "n")
      .orderBy(col("o_orderstatus"), col("priority_bucket"))
  }

  val q67Sql: String =
    """WITH wide AS (
      |  SELECT o_orderstatus,
      |    COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      |    COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
      |    COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low
      |  FROM orders GROUP BY 1)
      |SELECT o_orderstatus, priority_bucket, n
      |FROM wide UNPIVOT (n FOR priority_bucket IN (n_urgent, n_high, n_low))
      |ORDER BY o_orderstatus, priority_bucket""".stripMargin

  /** q88: INTERSECT ALL / EXCEPT ALL — multiset semantics (duplicate
    * counts preserved), complementing q83's distinct set ops. Spark
    * plans these as count-compare aggregates over a single shuffle.
    */
  def q88(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_nationkey").as("nationkey"))
    val sn = Tables(spark, dir, "supplier")
      .filter(col("s_acctbal") > 5000.0)
      .select(col("s_nationkey").as("nationkey"))
    cn.intersectAll(sn).withColumn("op", lit("inter_all"))
      .unionAll(cn.exceptAll(sn).withColumn("op", lit("except_all")))
      .select(col("op"), col("nationkey"))
      .orderBy(col("op"), col("nationkey"))
  }

  val q88Sql: String =
    """SELECT 'inter_all' AS op, nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  WHERE c_mktsegment = 'BUILDING'
      |  INTERSECT ALL
      |  SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000.0)
      |UNION ALL
      |SELECT 'except_all', nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  WHERE c_mktsegment = 'BUILDING'
      |  EXCEPT ALL
      |  SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000.0)
      |ORDER BY op, nationkey""".stripMargin

  /** q68: array algebra over collected baskets — intersect / except /
    * contains / slice against a reference set, all codegen array
    * built-ins evaluated AFTER the aggregate (so the per-row work
    * scales with basket size, not table size).
    */
  def q68(spark: SparkSession, dir: String): DataFrame = {
    val probe = array((1 to 50).map(i => lit(i.toLong)): _*)
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_partkey"))).as("basket"))
      .select(col("l_orderkey"),
        size(col("basket")).cast("long").as("n_items"),
        size(array_distinct(array_intersect(col("basket"), probe)))
          .cast("long").as("n_in_probe"),
        size(array_except(col("basket"), probe)).cast("long")
          .as("n_outside_probe"),
        array_contains(col("basket"), 42L).as("has_42"),
        concat_ws("|", expr(
          "transform(slice(basket, 1, 2), x -> CAST(x AS STRING))"))
          .as("first2"))
      .orderBy(col("l_orderkey"))
  }

  val q68Sql: String =
    """WITH b AS (
      |  SELECT l_orderkey, list_sort(list(l_partkey)) AS basket
      |  FROM lineitem GROUP BY 1)
      |SELECT l_orderkey,
      |  len(basket) AS n_items,
      |  CAST(len(list_distinct(list_filter(basket,
      |    x -> list_contains(range(1, 51), x)))) AS BIGINT) AS n_in_probe,
      |  CAST(len(list_distinct(list_filter(basket,
      |    x -> NOT list_contains(range(1, 51), x)))) AS BIGINT)
      |    AS n_outside_probe,
      |  list_contains(basket, 42) AS has_42,
      |  array_to_string(basket[1:2], '|') AS first2
      |FROM b
      |ORDER BY l_orderkey""".stripMargin

  /** q89: correlated scalar subquery — each order compared against
    * its OWN customer's average (decimal-exact, so the threshold is
    * bit-identical cross-engine). Not expressible in the DataFrame
    * DSL; goes through graft's SQL surface and exercises Catalyst's
    * decorrelation: the optimizer rewrites the per-row subquery into
    * one aggregate + join (one shuffle), not a nested loop — verify
    * with `.explain`: no per-row subplan survives.
    */
  def q89(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders").createOrReplaceTempView("orders_g")
    spark.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM orders_g o
        |WHERE o_totalprice > 2 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |         / COUNT(*)
        |  FROM orders_g o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  val q89Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > 2 * (
      |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
      |         / COUNT(*)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q65: three-valued-logic semantics — NULLIF-manufactured nulls,
    * strict vs null-safe equality (`<=>` / IS NOT DISTINCT FROM),
    * COALESCE recovery. Counts are conditional sums (no extra
    * shuffle beyond the one aggregate); this op exists to pin down
    * NULL comparison semantics against a second engine.
    */
  def q65(spark: SparkSession, dir: String): DataFrame = {
    val x = nullif(col("l_discount"), lit(0.0))
    val y = nullif(col("l_tax"), lit(0.0))
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        cnt(x.isNull).as("n_x_null"),
        cnt(y.isNull).as("n_y_null"),
        cnt(x === y).as("n_eq_strict"),
        cnt(x <=> y).as("n_eq_nullsafe"),
        sum(coalesce(x, lit(0.0)).cast(DecimalType(18, 4))).cast("double")
          .as("sum_x_coalesced"))
      .orderBy(col("l_returnflag"))
  }

  val q65Sql: String =
    """SELECT l_returnflag,
      |  COUNT(*) AS n,
      |  COUNT(*) FILTER (WHERE NULLIF(l_discount, 0.0) IS NULL) AS n_x_null,
      |  COUNT(*) FILTER (WHERE NULLIF(l_tax, 0.0) IS NULL) AS n_y_null,
      |  COUNT(*) FILTER (WHERE NULLIF(l_discount, 0.0) = NULLIF(l_tax, 0.0))
      |    AS n_eq_strict,
      |  COUNT(*) FILTER (WHERE NULLIF(l_discount, 0.0)
      |    IS NOT DISTINCT FROM NULLIF(l_tax, 0.0)) AS n_eq_nullsafe,
      |  CAST(SUM(CAST(COALESCE(NULLIF(l_discount, 0.0), 0.0)
      |    AS DECIMAL(18,4))) AS DOUBLE) AS sum_x_coalesced
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q66: datetime extraction — year/quarter/month grouping with
    * weekend counts (Spark's dayofweek is 1=Sunday; DuckDB's is
    * 0=Sunday, aligned by +1 in the oracle), ISO week and day-of-year
    * bounds. All pure extraction in codegen; the group-by is the only
    * shuffle.
    */
  def q66(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofweek(col("o_orderdate")).as("dow"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        weekofyear(col("o_orderdate")).cast("long").as("wk"))
      .groupBy(col("y"), col("q"), col("m"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("dow") === 1 || col("dow") === 7, 1L).otherwise(0L))
          .as("n_weekend"),
        min(col("doy")).as("min_doy"),
        max(col("doy")).as("max_doy"),
        max(col("wk")).as("max_wk"))
      .orderBy(col("y"), col("q"), col("m"))

  val q66Sql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
      |  CAST(month(o_orderdate) AS BIGINT) AS m,
      |  COUNT(*) AS n,
      |  COUNT(*) FILTER (WHERE dayofweek(o_orderdate) + 1 IN (1, 7))
      |    AS n_weekend,
      |  CAST(MIN(dayofyear(o_orderdate)) AS BIGINT) AS min_doy,
      |  CAST(MAX(dayofyear(o_orderdate)) AS BIGINT) AS max_doy,
      |  CAST(MAX(weekofyear(o_orderdate)) AS BIGINT) AS max_wk
      |FROM orders
      |GROUP BY 1, 2, 3
      |ORDER BY y, q, m""".stripMargin

  /** q92: latest-wins CDC merge — fold a change batch (updates +
    * inserts, each row versioned) into a keyed snapshot and classify
    * every surviving key as unchanged / updated / inserted. The change
    * batch is derived deterministically from `orders` (key%10=3 →
    * v1 reprice, key%20=3 → v2 status flip, key%37=5 → new-key
    * insert), standing in for a day's CDC feed.
    *
    * Scale shape: ONE hash shuffle on the merge key. Latest-wins is a
    * typed `reduceGroups` argmax (per-key versions are distinct, so
    * the reduction is associative and commutative) carrying running
    * min/max version for the verdict. `max(struct(version, …))` would
    * express the same thing declaratively, but struct aggregation
    * buffers are not hash-aggregable and Spark silently plans a
    * per-partition SortAggregate; the typed reduction plans as
    * ObjectHashAggregate. The load-bearing property is the MAP-SIDE
    * PARTIAL COMBINE: at most one candidate row per key per partition
    * crosses the shuffle, never the feed — that holds even when the
    * object agg's in-memory map exceeds
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * (default 128 groups) and it degrades to a sorted merge within
    * the partition. No window over the raw feed, no join back.
    *
    * Insert keys are the NEGATIVE mirror `-(k+1)` — disjoint from
    * the snapshot's positive keys at any scale factor (an additive
    * offset would collide once max(o_orderkey) crossed it).
    */
  def q92(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val snap = orders.withColumn("version", lit(0L))
    val upd1 = orders.filter(col("o_orderkey") % 10 === 3)
      .select(col("o_orderkey"), lit("P").as("o_orderstatus"),
        (col("o_totalprice") * 1.05).as("o_totalprice"),
        lit(1L).as("version"))
    val upd2 = orders.filter(col("o_orderkey") % 20 === 3)
      .select(col("o_orderkey"), lit("F").as("o_orderstatus"),
        (col("o_totalprice") * 1.10).as("o_totalprice"),
        lit(2L).as("version"))
    val ins = orders.filter(col("o_orderkey") % 37 === 5)
      .select((-(col("o_orderkey") + 1L)).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"),
        lit(1L).as("version"))
    snap.unionAll(upd1).unionAll(upd2).unionAll(ins)
      .as[(Long, String, Double, Long)]
      .map { case (k, st, pr, v) => (k, st, pr, v, v, v) }
      .groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val w = if (a._4 > b._4) a else b
        (w._1, w._2, w._3, w._4,
          math.min(a._5, b._5), math.max(a._6, b._6))
      }
      .map(_._2)
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice", "version",
        "minv", "maxv")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("version"),
        when(col("minv") > 0, lit("inserted"))
          .when(col("maxv") > 0, lit("updated"))
          .otherwise(lit("unchanged")).as("op"))
      .orderBy(col("o_orderkey"))
  }

  val q92Sql: String =
    """WITH snap AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice,
      |    CAST(0 AS BIGINT) AS version
      |  FROM orders),
      |u1 AS (
      |  SELECT o_orderkey, 'P' AS o_orderstatus,
      |    o_totalprice * 1.05 AS o_totalprice, CAST(1 AS BIGINT)
      |  FROM orders WHERE o_orderkey % 10 = 3),
      |u2 AS (
      |  SELECT o_orderkey, 'F', o_totalprice * 1.10, CAST(2 AS BIGINT)
      |  FROM orders WHERE o_orderkey % 20 = 3),
      |ins AS (
      |  SELECT -(o_orderkey + 1), 'N', o_totalprice, CAST(1 AS BIGINT)
      |  FROM orders WHERE o_orderkey % 37 = 5),
      |feed AS (
      |  SELECT * FROM snap UNION ALL SELECT * FROM u1
      |  UNION ALL SELECT * FROM u2 UNION ALL SELECT * FROM ins),
      |ranked AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, version,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderkey
      |      ORDER BY version DESC) AS rn,
      |    MIN(version) OVER (PARTITION BY o_orderkey) AS minv,
      |    MAX(version) OVER (PARTITION BY o_orderkey) AS maxv
      |  FROM feed)
      |SELECT o_orderkey, o_orderstatus, o_totalprice, version,
      |  CASE WHEN minv > 0 THEN 'inserted'
      |       WHEN maxv > 0 THEN 'updated'
      |       ELSE 'unchanged' END AS op
      |FROM ranked WHERE rn = 1
      |ORDER BY o_orderkey""".stripMargin
}
