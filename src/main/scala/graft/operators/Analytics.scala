package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Product-analytics + statistics operators over `events` / `orders` /
  * `lineitem`: funnel, cohort retention, explicit grouping sets,
  * the full window-function suite, approximate sketches, and
  * bit-deterministic correlation. Determinism rules per SURVEY.md §4.
  */
object Analytics {

  /** q51: conversion funnel signup → view → purchase. Each stage is a
    * per-user min-timestamp aggregate joined against the previous
    * stage (strictly-later semantics). Three narrow shuffles on
    * user_id — at 100 TB each stage input is pre-filtered by event
    * type before the shuffle, and AQE coalesces the tiny stage-2/3
    * partitions.
    */
  def q51(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val s = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("st"))
    val v = ev.filter(col("event_type") === "view")
      .join(s, Seq("user_id")).filter(col("ts") > col("st"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("vt"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(v, Seq("user_id")).filter(col("ts") > col("vt"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("pt"))
    def stage(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("users")).select(lit(name).as("stage"), col("users"))
    stage(s, "1_signup").unionAll(stage(v, "2_view"))
      .unionAll(stage(p, "3_purchase"))
      .orderBy(col("stage"))
  }

  val q51Sql: String =
    """WITH s AS (
      |  SELECT user_id, MIN(ts) AS st FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |v AS (
      |  SELECT e.user_id, MIN(e.ts) AS vt FROM events e
      |  JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'view' AND e.ts > s.st GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS pt FROM events e
      |  JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > v.vt GROUP BY 1)
      |SELECT '1_signup' AS stage, COUNT(*) AS users FROM s
      |UNION ALL SELECT '2_view', COUNT(*) FROM v
      |UNION ALL SELECT '3_purchase', COUNT(*) FROM p
      |ORDER BY stage""".stripMargin

  /** q52: weekly cohort retention — cohort = week of a user's first
    * event; cell (cohort, offset) counts users active `offset` weeks
    * later. Week offsets come from epoch arithmetic on week-truncated
    * timestamps (exact integer division both engines). Two shuffles:
    * first-event agg and distinct activity, joined on user_id.
    */
  def q52(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events").select(col("user_id"), col("ts"))
    val first = ev.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val active = ev.select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    active.join(first, Seq("user_id"))
      .select(col("cohort_week"),
        ((unix_timestamp(col("wk")) - unix_timestamp(col("cohort_week"))) / 604800)
          .cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q52Sql: String =
    """WITH first AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      |  FROM events GROUP BY 1),
      |act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
      |SELECT f.cohort_week,
      |  CAST((epoch(a.wk) - epoch(f.cohort_week)) / 604800 AS BIGINT)
      |    AS week_offset,
      |  COUNT(*) AS users
      |FROM act a JOIN first f ON a.user_id = f.user_id
      |GROUP BY 1, 2
      |ORDER BY cohort_week, week_offset""".stripMargin

  private def dsum(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(e.cast(DecimalType(18, 4))).cast("double")

  /** q53: explicit GROUPING SETS — ((flag,status),(flag),()) in one
    * Expand + hash-agg pass (no per-set rescan), with the standard
    * `grouping_id` bitmask distinguishing set provenance. Unlike q80's
    * CUBE this skips the (status) set entirely — at 100 TB that's 25%
    * less shuffled agg state.
    */
  def q53(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  val q53Sql: String =
    """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  COALESCE(l_returnflag, 'ALL') AS l_returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  /** q54: the window-function suite — lag/lead/ntile/percent_rank/
    * cume_dist/first_value over one (partition, order) spec, so Spark
    * plans a single sort + single Window operator. The order key
    * includes the unique o_orderkey so every rank function is
    * deterministic; percent_rank/cume_dist are exact small-integer
    * divisions (bit-equal across engines).
    */
  def q54(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("long").as("rn"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        first(col("o_totalprice")).over(w).as("first_price"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q54Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  ROW_NUMBER() OVER w AS rn,
      |  LAG(o_totalprice, 1) OVER w AS prev_price,
      |  LEAD(o_totalprice, 1) OVER w AS next_price,
      |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      |  PERCENT_RANK() OVER w AS pr,
      |  CUME_DIST() OVER w AS cd,
      |  FIRST_VALUE(o_totalprice) OVER w AS first_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, rn""".stripMargin

  /** q55: approximate sketches next to their exact counterparts —
    * HyperLogLog++ distinct counts and a quantile sketch. These are
    * THE 100 TB substitutes for countDistinct / percentile (mergeable
    * map-side, O(1) state vs a full shuffle of distinct keys).
    * Sketch internals are engine-specific ⇒ rows-only; AnalyticsSpec
    * bounds the relative error against the exact columns.
    */
  def q55(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        expr("approx_percentile(value, 0.5, 1000)").as("approx_median"),
        expr("percentile(value, 0.5)").as("exact_median"))
      .orderBy(col("event_type"))

  /** q57: Pearson correlation + population covariance, recomposed from
    * decimal-exact moment sums so the result is bit-deterministic
    * across engines and shuffle orders (built-in streaming `corr`
    * is order-sensitive in the last ulp). Factors are cast to
    * DECIMAL(9,2) BEFORE multiplying — the product stays exact decimal
    * arithmetic; every decimal→double conversion is ≤15 significant
    * digits, hence exact. One partial-agg shuffle, same as any sum.
    */
  def q57(spark: SparkSession, dir: String): DataFrame = {
    val d2 = DecimalType(9, 2)
    val x = col("l_quantity").cast(d2)
    val y = col("l_discount").cast(d2)
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"),
        sum(x * y).cast("double").as("sxy"))
      .select(col("l_returnflag"),
        col("n").cast("long").as("n"),
        (col("sx") / col("n")).as("mean_qty"),
        (col("sy") / col("n")).as("mean_disc"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"))
          .as("covar_pop"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))))
          .as("corr_qty_disc"))
      .orderBy(col("l_returnflag"))
  }

  /** q56: hourly resample with gap fill — the time grid is generated
    * (`sequence` over the global hour bounds, exploded per event
    * type), then LEFT-joined against the actual hourly aggregate so
    * silent hours surface as explicit zero rows. The grid side is
    * (types × hours) — tiny — and broadcasts; the fact side shuffles
    * once for the aggregate. This is the missing-bucket repair every
    * downstream window/trend computation needs.
    */
  def q56(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        col("value"))
    val hourly = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    val bounds = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val grid = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, INTERVAL 1 HOUR)")).as("h"))
    grid.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy(col("event_type"), col("h"))
  }

  val q56Sql: String =
    """WITH b AS (
      |  SELECT date_trunc('hour', MIN(ts)) AS h0,
      |         date_trunc('hour', MAX(ts)) AS h1 FROM events),
      |t AS (SELECT DISTINCT event_type FROM events),
      |g AS (
      |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
      |    AS h FROM t, b),
      |a AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |  FROM events GROUP BY 1, 2)
      |SELECT g.event_type, g.h,
      |  COALESCE(a.n, 0) AS n,
      |  COALESCE(a.total_value, 0.0) AS total_value
      |FROM g LEFT JOIN a ON a.event_type = g.event_type AND a.h = g.h
      |ORDER BY g.event_type, g.h""".stripMargin

  private val ProfNumCols = Seq("l_quantity", "l_extendedprice", "l_discount")
  private val ProfStrCols = Seq("l_returnflag", "l_linestatus")

  /** q61: column profiling — per-column row/null/distinct counts and
    * min/max, one independent aggregate PER COLUMN, unioned. On
    * columnar storage this reads exactly one column's chunks per
    * aggregate — the same total I/O as a fused multi-distinct pass,
    * WITHOUT the ×K Expand row blowup Catalyst plans for multiple
    * `COUNT(DISTINCT)`s in one aggregate (profiled 5× slower at
    * sf0.1). Each single-distinct aggregate gets clean map-side
    * partial distinct; the K jobs run back-to-back (or concurrently
    * from a multi-threaded driver at scale).
    */
  def q61(spark: SparkSession, dir: String): DataFrame = {
    def prof(c: String, isNum: Boolean): DataFrame = {
      val src = Tables.spread(Tables(spark, dir, "lineitem").select(col(c)))
      val (minNum, maxNum, minStr, maxStr) =
        if (isNum) (min(col(c)).cast("double"), max(col(c)).cast("double"),
          lit(null).cast("string"), lit(null).cast("string"))
        else (lit(null).cast("double"), lit(null).cast("double"),
          min(col(c)), max(col(c)))
      src.agg(
        count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        minNum.as("min_num"), maxNum.as("max_num"),
        minStr.as("min_str"), maxStr.as("max_str"))
        .select(lit(c).as("col_name"), col("n"), col("n_null"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }
    (ProfNumCols.map(prof(_, isNum = true)) ++
      ProfStrCols.map(prof(_, isNum = false)))
      .reduce(_.unionAll(_))
      .orderBy(col("col_name"))
  }

  val q61Sql: String = {
    val num = ProfNumCols.map(c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS DOUBLE) AS min_num, CAST(MAX($c) AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM lineitem""".stripMargin)
    val str = ProfStrCols.map(c =>
      s"""SELECT '$c', COUNT(*), COUNT(*) - COUNT($c), COUNT(DISTINCT $c),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), MIN($c), MAX($c)
         |FROM lineitem""".stripMargin)
    (num ++ str).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  val q57Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(9,2)) *
      |             CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(9,2)) *
      |             CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(9,2)) *
      |             CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag,
      |  CAST(n AS BIGINT) AS n,
      |  sx / n AS mean_qty,
      |  sy / n AS mean_disc,
      |  (sxy - sx * sy / n) / n AS covar_pop,
      |  (n * sxy - sx * sy) /
      |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qty_disc
      |FROM m
      |ORDER BY l_returnflag""".stripMargin

  /** q94: incremental sketch rollup — the production pattern for
    * distinct-count analytics that never re-scans history: per-day
    * Datasketches HLL sketches of active users are built ONCE (in
    * production: persisted as a binary column in a daily "sketch
    * table"), and any coarser rollup — here monthly — MERGES the
    * daily sketches instead of touching raw events again. HLL union
    * is exact over sketch state (insertion-order independent), so the
    * merged estimate is identical to sketching the month directly —
    * asserted by the spec, along with the error bound vs exact
    * distinct counts. Estimates are engine-specific ⇒ rows-only.
    *
    * Scale shape: raw events are read once; the daily relation is
    * O(days) rows of O(KB) sketches; every further rollup
    * (month/quarter/year/all-time) is an aggregation over sketches
    * only. countDistinct here is spec ballast, not the operator.
    */
  /** q95: trailing-window anomaly detection — per event type, each
    * hour's event count z-scored against the trailing 24 WALL-CLOCK
    * hours (a RANGE frame over epoch-hours that excludes the current
    * row, so an anomaly can't mask itself and gap hours don't
    * stretch the baseline back in time the way a rows-frame would),
    * flagged at |z| > 3 once ≥12 of the trailing hours are observed.
    * The monitoring query every event pipeline runs against its own
    * volume. Hours with ZERO events produce no row — to flag total
    * outages, gap-fill first (q56) so empty hours exist as count-0
    * rows.
    *
    * Determinism: the windowed sums (Σn, Σn²) are exact BIGINTs;
    * mean/variance/z are recomposed from them with the SAME double
    * expression tree in Spark and DuckDB, so results are bit-equal —
    * built-in windowed STDDEV would differ in the last ulp between
    * engines (order-sensitive streaming algorithms). One shuffle on
    * event_type for the hourly rollup; the window sorts only the
    * tiny per-type hourly relation, never raw events.
    */
  def q95(spark: SparkSession, dir: String): DataFrame =
    zScoreHourly(Tables(spark, dir, "events")
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n_events")))

  /** Shared z-score stage over an (event_type, hour_start, n_events)
    * hourly relation — q95 feeds it the raw rollup, q96 the
    * gap-filled grid.
    */
  private def zScoreHourly(hourly: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_epoch"))
      .rangeBetween(-24, -1)
    val withStats = hourly
      .withColumn("hour_epoch", expr("unix_timestamp(hour_start) DIV 3600"))
      .withColumn("win_cnt", count(col("n_events")).over(w))
      .withColumn("s", sum(col("n_events")).over(w))
      .withColumn("sq", sum(col("n_events") * col("n_events")).over(w))
    val cntD = col("win_cnt").cast("double")
    val mean = col("s").cast("double") / cntD
    val variance = ((col("sq").cast("double")
      - col("s").cast("double") * col("s").cast("double") / cntD)
      / (cntD - 1.0))
    withStats
      .withColumn("trailing_mean",
        when(col("win_cnt") >= 12, mean).otherwise(lit(null)))
      .withColumn("z",
        when(col("win_cnt") >= 12 && variance > 0.0,
          (col("n_events").cast("double") - mean) / sqrt(variance))
          .otherwise(lit(null)))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > 3.0, lit(false)))
      .select(col("event_type"), col("hour_start"), col("n_events"),
        col("win_cnt"), col("trailing_mean"), col("z"), col("is_anomaly"))
      .orderBy(col("event_type"), col("hour_start"))
  }

  /** q96: gap-filled anomaly detection — the q56 ∘ q95 composition.
    * The hourly grid is generated per event type and LEFT-joined
    * against the rollup so silent hours exist as count-0 rows, then
    * the same trailing-24h z-score runs over the filled series. This
    * closes q95's documented blind spot: a TOTAL OUTAGE hour now
    * z-scores hard negative and is flagged, and with a contiguous
    * grid the warm-up gate counts real wall-clock hours. Grid side is
    * (types × hours) — tiny, broadcast; facts shuffle once.
    */
  def q96(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour_start"))
    val agg = ev.groupBy(col("event_type"), col("hour_start"))
      .agg(count(lit(1)).as("n_events"))
    val bounds = ev.agg(min(col("hour_start")).as("h0"),
      max(col("hour_start")).as("h1"))
    val grid = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, INTERVAL 1 HOUR)")).as("hour_start"))
    val filled = grid.join(agg, Seq("event_type", "hour_start"), "left")
      .select(col("event_type"), col("hour_start"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
    zScoreHourly(filled)
  }

  /** Shared z-score SQL suffix over a `hourly` CTE producing
    * (event_type, hour_start, n_events, hour_epoch) — mirrors
    * [[zScoreHourly]] exactly so q95/q96 stay bit-equal.
    */
  private def zScoreSql(hourlyCte: String): String =
    s"""WITH $hourlyCte,
      |st AS (
      |  SELECT event_type, hour_start, n_events,
      |    CAST(COUNT(n_events) OVER w AS BIGINT) AS win_cnt,
      |    CAST(SUM(n_events) OVER w AS BIGINT) AS s,
      |    CAST(SUM(n_events * n_events) OVER w AS BIGINT) AS sq
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour_epoch
      |    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      |mv AS (
      |  SELECT event_type, hour_start, n_events, win_cnt,
      |    CAST(s AS DOUBLE) / CAST(win_cnt AS DOUBLE) AS mean,
      |    (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |      / CAST(win_cnt AS DOUBLE)) / (CAST(win_cnt AS DOUBLE) - 1.0) AS var
      |  FROM st),
      |zz AS (
      |  SELECT event_type, hour_start, n_events, win_cnt,
      |    CASE WHEN win_cnt >= 12 THEN mean ELSE NULL END AS trailing_mean,
      |    CASE WHEN win_cnt >= 12 AND var > 0.0
      |      THEN (CAST(n_events AS DOUBLE) - mean) / sqrt(var)
      |      ELSE NULL END AS z
      |  FROM mv)
      |SELECT event_type, hour_start, n_events, win_cnt, trailing_mean, z,
      |  COALESCE(abs(z) > 3.0, FALSE) AS is_anomaly
      |FROM zz
      |ORDER BY event_type, hour_start""".stripMargin

  val q95Sql: String = zScoreSql(
    """hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour_start,
      |    COUNT(*) AS n_events,
      |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hour_epoch
      |  FROM events GROUP BY 1, 2)""".stripMargin)

  val q96Sql: String = zScoreSql(
    """b AS (
      |  SELECT date_trunc('hour', MIN(ts)) AS h0,
      |         date_trunc('hour', MAX(ts)) AS h1 FROM events),
      |t AS (SELECT DISTINCT event_type FROM events),
      |g AS (
      |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
      |    AS hour_start FROM t, b),
      |a AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour_start,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |hourly AS (
      |  SELECT g.event_type, g.hour_start,
      |    COALESCE(a.n_events, 0) AS n_events,
      |    CAST(epoch(g.hour_start) AS BIGINT) // 3600 AS hour_epoch
      |  FROM g LEFT JOIN a
      |    ON a.event_type = g.event_type AND a.hour_start = g.hour_start)""".stripMargin)

  def q94(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("day"),
        date_trunc("month", col("ts")).cast("date").as("month"),
        col("user_id"))
    val daily = events.groupBy(col("month"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val monthly = daily.groupBy(col("month"))
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
    val exact = events.groupBy(col("month"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    monthly.join(exact, Seq("month"))
      .select(col("month"), col("n_days"), col("approx_users"),
        col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double")
          / col("exact_users").cast("double")).as("rel_err"))
      .orderBy(col("month"))
  }

  /** q74: Tukey-fence outlier profile — per event type, exact
    * quartiles of `value`, the 1.5×IQR fences, and how many events
    * fall outside them. The data-quality screen run before a metric
    * pipeline trusts a value column.
    *
    * Two passes by construction (fences depend on the full
    * distribution): pass 1 is a per-type exact `percentile` aggregate
    * (at 100 TB swap in `approx_percentile` — q55's documented
    * trade), pass 2 re-scans with the FENCES BROADCAST (types ≪
    * partitions, so the fact side never shuffles for the join) and
    * conditionally counts. Fences are derived with the same double
    * expression tree in both engines (p25 − 1.5·(p75−p25)), so the
    * doubles hash-match.
    */
  def q74(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
      .select(col("event_type"), col("value"))
    val fences = events.groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.75)").as("p75"))
      .withColumn("lo_fence",
        col("p25") - lit(1.5) * (col("p75") - col("p25")))
      .withColumn("hi_fence",
        col("p75") + lit(1.5) * (col("p75") - col("p25")))
    events.join(broadcast(fences), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        first(col("p25")).as("p25"),
        first(col("p75")).as("p75"),
        first(col("lo_fence")).as("lo_fence"),
        first(col("hi_fence")).as("hi_fence"),
        sum(when(col("value") < col("lo_fence")
          || col("value") > col("hi_fence"), 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_frac",
        col("n_outliers").cast("double") / col("n").cast("double"))
      .orderBy(col("event_type"))
  }

  /** q77: multi-column Tukey/z hybrid profiler (§7b) — every numeric
    * lineitem column profiled for outliers under BOTH rules (Tukey
    * 1.5×IQR fences and |z| > 3) in TWO corpus scans total, however
    * many columns: pass 1 is ONE aggregate computing every column's
    * count / decimal-exact Σx, Σx² / exact quartiles side by side
    * (columnar scan still prunes to exactly the profiled columns);
    * pass 2 re-scans once with the one-row derived-stats relation
    * broadcast and counts each column's rule violations. Contrast
    * with q61's one-job-per-column shape, which is right for
    * multi-DISTINCT but wasteful here where every aggregate is
    * hash-combinable in a single pass. Mean/std/fences are recomposed
    * from exact decimal sums with the same double expression tree in
    * both engines, so the doubles hash-match (q57's contract).
    */
  /** NDV threshold for q77's quantile dispatch: at or below it a
    * column's quartiles come from the value-count `percentile`
    * aggregate (per-partition maps bounded by NDV — the right plan
    * for codes, grades, discounts); above it they come from
    * [[sortQuantilesExact]] (range-sort + global-rank pick). The
    * hashmap aggregate on a mostly-distinct column is the 100×
    * failure mode this dispatch removes: its final merge receives
    * every distinct value in ONE task.
    */
  val PercentileNdvLimit = 4096L

  /** Exact interpolated quantiles of one numeric column, computed the
    * way a 100 TB engine must: range-partition the values (TeraSort
    * shape — every partition a contiguous slice), attach global ranks
    * via [[Distributed.orderedPrefix]]'s broadcast prefix offsets,
    * and fetch ONLY the two boundary rows per requested quantile.
    * Interpolation (v_lo + (v_hi − v_lo)·frac at h = (n−1)q) matches
    * Spark's `percentile` and DuckDB's `quantile_cont` bit-for-bit on
    * doubles. `nNonNull` comes from the caller's stats pass — nulls
    * are excluded exactly as the aggregate form excludes them.
    */
  private[graft] def sortQuantilesExact(values: DataFrame, c: String,
      qs: Seq[Double], nNonNull: Long): Seq[Double] = {
    require(nNonNull > 0, s"no non-null values in $c")
    val vals = values.select(col(c).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val hs = qs.map(q => (nNonNull - 1) * q)
    val targets = hs.flatMap(h =>
      Seq(math.floor(h).toLong + 1, math.ceil(h).toLong + 1)).distinct
    val picked = Distributed.orderedPrefix(vals, Seq(col("v")), lit(1L))
      .filter(col("rank").isin(targets: _*))
      .select(col("rank"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    hs.map { h =>
      val lo = picked(math.floor(h).toLong + 1)
      val hi = picked(math.ceil(h).toLong + 1)
      lo + (hi - lo) * (h - math.floor(h))
    }
  }

  def q77(spark: SparkSession, dir: String): DataFrame = {
    val cols = ProfNumCols
    val dt = DecimalType(18, 2)
    val li = Tables(spark, dir, "lineitem").select(cols.map(col): _*)
    // pass 1: ONE scan — counts, decimal-exact Σx/Σx², and an approx
    // NDV per column that drives the quantile dispatch below (the
    // estimate only picks a plan, never touches a result)
    val statAggs = count(lit(1)).as("n") +: cols.flatMap { c => Seq(
      sum(col(c).cast(dt)).cast("double").as(s"${c}__sx"),
      sum(col(c).cast(dt) * col(c).cast(dt)).cast("double").as(s"${c}__sxx"),
      count(col(c)).as(s"${c}__nn"),
      approx_count_distinct(col(c)).as(s"${c}__ndv"))
    }
    val s1 = li.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val n = s1.getLong(0)
    def d(name: String): Double = s1.getDouble(s1.fieldIndex(name))
    def l(name: String): Long = s1.getLong(s1.fieldIndex(name))
    // quartiles: value-count aggregate for low-NDV columns (one scan
    // for all of them), rank-pick sort for the rest (one range-sort
    // job per column, no value-count map anywhere)
    val (lowC, highC) = cols.partition(c => l(s"${c}__ndv") <= PercentileNdvLimit)
    val lowQ: Map[String, (Double, Double)] = if (lowC.isEmpty) Map.empty else {
      val aggs = lowC.flatMap(c => Seq(
        expr(s"percentile($c, 0.25)").as(s"${c}__p25"),
        expr(s"percentile($c, 0.75)").as(s"${c}__p75")))
      val r = li.agg(aggs.head, aggs.tail: _*).collect()(0)
      lowC.map(c => c -> (r.getDouble(r.fieldIndex(s"${c}__p25")),
        r.getDouble(r.fieldIndex(s"${c}__p75")))).toMap
    }
    val highQ: Map[String, (Double, Double)] = highC.map { c =>
      val Seq(p25, p75) =
        sortQuantilesExact(li, c, Seq(0.25, 0.75), l(s"${c}__nn"))
      c -> (p25, p75)
    }.toMap
    val quart = lowQ ++ highQ
    // derived stats as driver scalars — the fences enter pass 2 as
    // LITERALS, so the old broadcast crossJoins disappear entirely
    val stats = cols.map { c =>
      val mean = d(s"${c}__sx") / n.toDouble
      val std = math.sqrt(math.max(
        d(s"${c}__sxx") / n.toDouble - mean * mean, 0.0))
      val (p25, p75) = quart(c)
      val loF = p25 - 1.5 * (p75 - p25)
      val hiF = p75 + 1.5 * (p75 - p25)
      c -> (mean, std, p25, p75, loF, hiF)
    }.toMap
    val outAggs = cols.flatMap { c =>
      val (mean, std, _, _, loF, hiF) = stats(c)
      Seq(
        sum(when(col(c) < lit(loF) || col(c) > lit(hiF), 1L)
          .otherwise(0L)).as(s"${c}__ntk"),
        sum(when(abs(col(c) - lit(mean)) > lit(3.0) * lit(std), 1L)
          .otherwise(0L)).as(s"${c}__nz"))
    }
    // 1-row barrier: the per-column union branches below each
    // reference the outlier counts — without it Catalyst re-runs the
    // pass-2 aggregate once per branch (the q75 lesson)
    val both = li.agg(outAggs.head, outAggs.tail: _*).localCheckpoint()
    cols.map { c =>
      val (mean, std, p25, p75, loF, hiF) = stats(c)
      both.select(lit(c).as("col_name"), lit(n).as("n"),
        lit(mean).as("mean"), lit(std).as("std"),
        lit(p25).as("p25"), lit(p75).as("p75"),
        lit(loF).as("lo_fence"), lit(hiF).as("hi_fence"),
        col(s"${c}__ntk").as("n_tukey_outliers"),
        col(s"${c}__nz").as("n_z_outliers"))
    }.reduce(_.unionAll(_)).orderBy(col("col_name"))
  }

  val q77Sql: String = {
    val base = ProfNumCols.map { c =>
      s"""CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS ${c}__sx,
         |    CAST(SUM(CAST($c AS DECIMAL(18,2)) * CAST($c AS DECIMAL(18,2)))
         |      AS DOUBLE) AS ${c}__sxx,
         |    quantile_cont($c, 0.25) AS ${c}__p25,
         |    quantile_cont($c, 0.75) AS ${c}__p75""".stripMargin
    }.mkString(",\n    ")
    val d1 = ProfNumCols.map { c =>
      s"${c}__sx / CAST(n AS DOUBLE) AS ${c}__mean"
    }.mkString(",\n    ")
    val d2 = ProfNumCols.map { c =>
      s"""sqrt(greatest(${c}__sxx / CAST(n AS DOUBLE)
         |      - ${c}__mean * ${c}__mean, 0.0)) AS ${c}__std,
         |    ${c}__p25 - 1.5 * (${c}__p75 - ${c}__p25) AS ${c}__lo,
         |    ${c}__p75 + 1.5 * (${c}__p75 - ${c}__p25) AS ${c}__hi""".stripMargin
    }.mkString(",\n    ")
    val oc = ProfNumCols.map { c =>
      s"""CAST(SUM(CASE WHEN l.$c < d.${c}__lo OR l.$c > d.${c}__hi
         |      THEN 1 ELSE 0 END) AS BIGINT) AS ${c}__ntk,
         |    CAST(SUM(CASE WHEN ABS(l.$c - d.${c}__mean) > 3.0 * d.${c}__std
         |      THEN 1 ELSE 0 END) AS BIGINT) AS ${c}__nz""".stripMargin
    }.mkString(",\n    ")
    val rows = ProfNumCols.map { c =>
      s"""SELECT '$c' AS col_name, d.n, d.${c}__mean AS mean,
         |  d.${c}__std AS std, d.${c}__p25 AS p25, d.${c}__p75 AS p75,
         |  d.${c}__lo AS lo_fence, d.${c}__hi AS hi_fence,
         |  o.${c}__ntk AS n_tukey_outliers, o.${c}__nz AS n_z_outliers
         |FROM d CROSS JOIN o""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH s AS (
       |  SELECT COUNT(*) AS n,
       |    $base
       |  FROM lineitem),
       |m AS (
       |  SELECT *,
       |    $d1
       |  FROM s),
       |d AS (
       |  SELECT *,
       |    $d2
       |  FROM m),
       |o AS (
       |  SELECT
       |    $oc
       |  FROM lineitem l CROSS JOIN d)
       |$rows
       |ORDER BY col_name""".stripMargin
  }

  /** q114: declarative data-quality constraint suite — the Deequ
    * pattern (Schelter et al., VLDB '18: "Automating Large-Scale Data
    * Quality Verification"): a CHECK LIST (completeness, uniqueness,
    * containment, non-negativity, bounds, size) is compiled into ONE
    * aggregate pass over the table, and the single stats row is then
    * unpivoted into one verdict row per check. The shape that matters
    * at 100 TB: adding a constraint adds one aggregate expression to
    * the same scan, never another pass — K checks cost exactly one
    * table read (plus the one distinct-aggregate for uniqueness,
    * which Catalyst plans as its own clean two-stage hash aggregate;
    * a SINGLE distinct set avoids the multi-distinct Expand blowup,
    * q61's lesson). The unpivot is driver-free: `explode` over an
    * array of check structs built from the 1-row aggregate.
    *
    * Determinism: every `observed` is either an exact int64 count
    * ratio (one IEEE division, bit-stable across engines) or an exact
    * column min — no floating aggregation anywhere, so the DuckDB
    * twin hash-matches.
    */
  def q114(spark: SparkSession, dir: String): DataFrame =
    dataChecksOn(Tables.spread(Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_tax"), col("l_returnflag"))))

  /** [[q114]]'s suite over an arbitrary lineitem-shaped relation —
    * the spec runs it against planted-violation rows.
    */
  def dataChecksOn(li: DataFrame): DataFrame = {
    val stats = li.agg(
      count(lit(1)).as("n"),
      count(col("l_orderkey")).as("nn_orderkey"),
      count(col("l_returnflag")).as("nn_returnflag"),
      countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_key"),
      min(col("l_quantity")).cast("double").as("min_qty"),
      min(col("l_tax")).cast("double").as("min_tax"),
      sum(when(col("l_discount") >= 0.0 && col("l_discount") <= 1.0, 1L)
        .otherwise(0L)).as("n_disc_in"),
      sum(when(col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L))
        .as("n_rf_in"))
    def ratio(num: Column): Column =
      num.cast("double") / col("n").cast("double")
    def verdict(ok: Column): Column = when(ok, "pass").otherwise("fail")
    def check(name: String, c: String, observed: Column, ok: Column): Column =
      struct(lit(name).as("check_name"), lit(c).as("col_name"),
        observed.as("observed"), verdict(ok).as("passed"))
    stats.select(explode(array(
        check("completeness", "l_orderkey", ratio(col("nn_orderkey")),
          col("nn_orderkey") === col("n")),
        check("completeness", "l_returnflag", ratio(col("nn_returnflag")),
          col("nn_returnflag") === col("n")),
        check("uniqueness", "l_orderkey,l_linenumber", ratio(col("n_key")),
          col("n_key") === col("n")),
        check("non_negative", "l_quantity", col("min_qty"),
          col("min_qty") >= 0.0),
        check("non_negative", "l_tax", col("min_tax"), col("min_tax") >= 0.0),
        check("containment", "l_discount", ratio(col("n_disc_in")),
          col("n_disc_in") === col("n")),
        check("containment", "l_returnflag", ratio(col("n_rf_in")),
          col("n_rf_in") === col("n")),
        check("size", "*", col("n").cast("double"), col("n") > 0L)))
        .as("c"))
      .select(col("c.check_name"), col("c.col_name"), col("c.observed"),
        col("c.passed"))
      .orderBy(col("check_name"), col("col_name"))
  }

  val q114Sql: String =
    """WITH a AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(l_orderkey) AS nn_orderkey,
      |    COUNT(l_returnflag) AS nn_returnflag,
      |    CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
      |    CAST(MIN(l_tax) AS DOUBLE) AS min_tax,
      |    SUM(CASE WHEN l_discount >= 0.0 AND l_discount <= 1.0
      |      THEN 1 ELSE 0 END) AS n_disc_in,
      |    SUM(CASE WHEN l_returnflag IN ('A','N','R')
      |      THEN 1 ELSE 0 END) AS n_rf_in
      |  FROM lineitem),
      |k AS (
      |  -- the null filter matches Spark COUNT(DISTINCT a, b) semantics
      |  -- (null-containing tuples don't count) so the twins agree even
      |  -- on corrupt inputs, not just on the clean table
      |  SELECT COUNT(*) AS n_key FROM
      |    (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem
      |     WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL)),
      |s AS (SELECT * FROM a CROSS JOIN k)
      |SELECT check_name, col_name, observed, passed FROM (
      |  SELECT 'completeness' AS check_name, 'l_orderkey' AS col_name,
      |    CAST(nn_orderkey AS DOUBLE) / CAST(n AS DOUBLE) AS observed,
      |    CASE WHEN nn_orderkey = n THEN 'pass' ELSE 'fail' END AS passed
      |  FROM s
      |  UNION ALL SELECT 'completeness', 'l_returnflag',
      |    CAST(nn_returnflag AS DOUBLE) / CAST(n AS DOUBLE),
      |    CASE WHEN nn_returnflag = n THEN 'pass' ELSE 'fail' END FROM s
      |  UNION ALL SELECT 'uniqueness', 'l_orderkey,l_linenumber',
      |    CAST(n_key AS DOUBLE) / CAST(n AS DOUBLE),
      |    CASE WHEN n_key = n THEN 'pass' ELSE 'fail' END FROM s
      |  UNION ALL SELECT 'non_negative', 'l_quantity', min_qty,
      |    CASE WHEN min_qty >= 0.0 THEN 'pass' ELSE 'fail' END FROM s
      |  UNION ALL SELECT 'non_negative', 'l_tax', min_tax,
      |    CASE WHEN min_tax >= 0.0 THEN 'pass' ELSE 'fail' END FROM s
      |  UNION ALL SELECT 'containment', 'l_discount',
      |    CAST(n_disc_in AS DOUBLE) / CAST(n AS DOUBLE),
      |    CASE WHEN n_disc_in = n THEN 'pass' ELSE 'fail' END FROM s
      |  UNION ALL SELECT 'containment', 'l_returnflag',
      |    CAST(n_rf_in AS DOUBLE) / CAST(n AS DOUBLE),
      |    CASE WHEN n_rf_in = n THEN 'pass' ELSE 'fail' END FROM s
      |  UNION ALL SELECT 'size', '*', CAST(n AS DOUBLE),
      |    CASE WHEN n > 0 THEN 'pass' ELSE 'fail' END FROM s)
      |ORDER BY check_name, col_name""".stripMargin

  val q74Sql: String =
    """WITH f AS (
      |  SELECT event_type,
      |    quantile_cont(value, 0.25) AS p25,
      |    quantile_cont(value, 0.75) AS p75
      |  FROM events GROUP BY event_type),
      |g AS (
      |  SELECT event_type, p25, p75,
      |    p25 - 1.5 * (p75 - p25) AS lo_fence,
      |    p75 + 1.5 * (p75 - p25) AS hi_fence
      |  FROM f)
      |SELECT e.event_type, COUNT(*) AS n,
      |  ANY_VALUE(g.p25) AS p25, ANY_VALUE(g.p75) AS p75,
      |  ANY_VALUE(g.lo_fence) AS lo_fence, ANY_VALUE(g.hi_fence) AS hi_fence,
      |  CAST(SUM(CASE WHEN e.value < g.lo_fence OR e.value > g.hi_fence
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST(SUM(CASE WHEN e.value < g.lo_fence OR e.value > g.hi_fence
      |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS outlier_frac
      |FROM events e JOIN g USING (event_type)
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin
}
