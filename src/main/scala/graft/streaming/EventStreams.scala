package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming operators over the events stream.
  *
  * The stream source is the same parquet directory read with
  * `readStream` (schema pinned from a batch peek) — in production this
  * would be Kafka/files landing continuously; locally
  * `processAllAvailable()` drives the whole directory through the
  * streaming engine so specs can compare against the batch twin.
  */
object EventStreams {

  /** ts_us is event time in epoch MICROseconds — java.sql.Timestamp
    * getters truncate to millis, which would corrupt session bounds.
    */
  case class Event(event_id: Long, ts: java.sql.Timestamp, ts_us: Long,
    user_id: Long, event_type: String, value: Double)

  case class Session(user_id: Long, n_events: Long,
    start_us: Long, end_us: Long)

  /** Streaming source over the events table (nanos → micros like the
    * batch path).
    */
  def source(spark: SparkSession, dir: String): DataFrame =
    sourceFrom(spark, s"$dir/events.parquet", s"$dir/events*.parquet")

  /** Streaming source over an arbitrary events-shaped parquet glob —
    * `schemaPath` pins the schema (streaming sources cannot infer).
    * Restart/recovery specs point this at a directory they append
    * files to between runs; the checkpointed FileStreamSource log
    * ensures each file is processed exactly once across restarts.
    */
  def sourceFrom(spark: SparkSession, schemaPath: String,
      glob: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(schemaPath).schema
    // glob, not bare file: FileStreamSource requires a directory/glob
    spark.readStream.schema(schema).parquet(glob)
      .withColumn("ts",
        if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
          timestamp_micros(expr("ts DIV 1000")) else col("ts"))
  }

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark —
    * the streaming twin of [[graft.operators.Events.q50]]. Append mode
    * emits each window once its watermark passes; state is bounded by
    * (windows in flight × event types).
    */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame =
    source(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double")
          .as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exactly-once ingestion dedup — drop replayed events by
    * id, with state that EXPIRES at the watermark
    * (`dropDuplicatesWithinWatermark`, not plain `dropDuplicates`,
    * whose state grows forever on an unbounded stream). This is the
    * at-least-once → exactly-once repair stage of an ingest pipeline.
    */
  def dedupedEvents(spark: SparkSession, dir: String): DataFrame =
    dedupOn(source(spark, dir))

  /** Same dedup over any events-shaped streaming source. */
  def dedupOn(src: DataFrame): DataFrame =
    src
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks in the preceding 30 minutes (streaming twin of the
    * q87 range-join shape). Both sides carry watermarks + the time
    * bound, so join state is provably evictable — Spark drops buffered
    * rows once the watermark passes the interval.
    */
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val clicks = source(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val purchases = source(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    purchases.join(clicks,
      col("user_id") === col("click_user")
        && col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES")
        && col("click_ts") <= col("purchase_ts"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Stream-static broadcast enrichment: the live event stream joined
    * to a STATIC dimension (per-user lifetime purchase stats computed
    * from the batch table) — the dimension-lookup stage every event
    * pipeline has. The static side is re-resolved per micro-batch and
    * BROADCAST, so the stream side never shuffles and the join keeps
    * no state at all (nothing to watermark or evict, unlike
    * stream-stream joins); at scale the dimension is the small side
    * by construction. Left join: events from users with no purchase
    * history pass through with zeroed stats.
    */
  def enrichedEvents(spark: SparkSession, dir: String): DataFrame = {
    val userDim = graft.Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("lifetime_purchases"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double")
          .as("lifetime_value"))
    source(spark, dir)
      .join(broadcast(userDim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"),
        coalesce(col("lifetime_purchases"), lit(0L))
          .as("lifetime_purchases"),
        coalesce(col("lifetime_value"), lit(0.0)).as("lifetime_value"))
  }

  /** Static per-type baseline for [[anomalyFlags]]: mean/std of the
    * HISTORICAL hourly event counts, recomposed from exact integer
    * sums (Σn, Σn²) exactly like q95 — deterministic at any
    * parallelism. In production this is the nightly batch job whose
    * output the live detector broadcasts.
    */
  def hourlyBaseline(spark: SparkSession, dir: String): DataFrame =
    graft.Tables(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("s1"),
        sum(col("n") * col("n")).as("s2"))
      .select(col("event_type"),
        (col("s1").cast("double") / col("k").cast("double")).as("mean"),
        sqrt(greatest(
          (col("s2").cast("double") / col("k").cast("double")) -
            (col("s1").cast("double") / col("k").cast("double")) *
            (col("s1").cast("double") / col("k").cast("double")),
          lit(0.0))).as("std"))

  /** Streaming anomaly detection — the LIVE twin of the q95 batch
    * detector: the watermarked hourly windowed counts stream joins a
    * broadcast static baseline ([[hourlyBaseline]]) and every sealed
    * window carries its z-score and an `anomaly` verdict at |z| > 3.
    *
    * Scale shape: the only stateful operator is the windowed count
    * (state = types × windows-in-flight, watermark-evicted); the
    * baseline join is stream-static broadcast — no join state, the
    * stream side never shuffles for it. A type with no history (or
    * zero variance) passes through unflagged rather than dividing by
    * zero.
    */
  def anomalyFlags(spark: SparkSession, dir: String): DataFrame =
    source(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"))
      .join(broadcast(hourlyBaseline(spark, dir)), Seq("event_type"), "left")
      .withColumn("z",
        when(col("std") > 0,
          (col("n_events").cast("double") - col("mean")) / col("std"))
          .otherwise(lit(0.0)))
      .select(col("hour_start"), col("event_type"), col("n_events"),
        col("z"), (abs(col("z")) > 3).as("anomaly"))

  /** Static per-type Tukey fences for [[outlierFlags]] — q74's pass-1
    * artifact (exact quartiles → 1.5×IQR fences; at 100 TB the nightly
    * job would swap in `approx_percentile`, q55's documented trade).
    */
  def tukeyFences(spark: SparkSession, dir: String): DataFrame =
    graft.Tables(spark, dir, "events")
      .select(col("event_type"), col("value"))
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.75)").as("p75"))
      .withColumn("lo_fence",
        col("p25") - lit(1.5) * (col("p75") - col("p25")))
      .withColumn("hi_fence",
        col("p75") + lit(1.5) * (col("p75") - col("p25")))
      .select(col("event_type"), col("lo_fence"), col("hi_fence"))

  /** Streaming outlier guardrail — the LIVE twin of the q74 batch
    * profile (§7b): every arriving event is checked against the
    * BROADCAST static fences and flagged per row. Even lighter than
    * [[anomalyFlags]]: no window, no watermark, NO state of any kind —
    * the fence join is stream-static broadcast and the verdict is
    * per-row, so the stream side never shuffles and latency is one
    * map. A type with no fence history passes through unflagged.
    */
  def outlierFlags(spark: SparkSession, dir: String): DataFrame =
    outlierFlagsOn(source(spark, dir), tukeyFences(spark, dir))

  /** Same guardrail over any events-shaped streaming source and any
    * precomputed fence relation (specs plant both).
    */
  def outlierFlagsOn(src: DataFrame, fences: DataFrame): DataFrame =
    src
      .join(broadcast(fences), Seq("event_type"), "left")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"),
        coalesce(col("value") < col("lo_fence")
          || col("value") > col("hi_fence"), lit(false)).as("is_outlier"))

  /** Stateful gap-based sessionization (30-min inactivity) via
    * flatMapGroupsWithState — the streaming twin of q18. Sessions are
    * emitted when the event-time timeout fires (gap elapsed past the
    * watermark); per-user state is one (count, start, last) triple.
    */
  def sessionize(spark: SparkSession, dir: String): Dataset[Session] =
    sessionizeOn(spark, source(spark, dir))

  /** Same sessionizer over any events-shaped streaming source. */
  def sessionizeOn(spark: SparkSession, src: DataFrame): Dataset[Session] = {
    import spark.implicits._
    val gapUs = 30L * 60 * 1000 * 1000
    src
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("event_id"), col("ts"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"))
      .withWatermark("ts", "1 hour")
      .as[Event]
      .groupByKey(_.user_id)
      // state tuple: (nEvents, sessionStartMs, lastEventMs)
      .flatMapGroupsWithState[(Long, Long, Long), Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, events: Iterator[Event],
         state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (n, start, last) = state.get
            state.remove()
            Iterator.single(Session(userId, n, start, last))
          } else {
            val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts_us
              cur match {
                case Some((n, start, last)) if t - last <= gapUs =>
                  cur = Some((n + 1, start, t))
                case Some((n, start, last)) =>
                  closed ::= Session(userId, n, start, last)
                  cur = Some((1L, t, t))
                case None =>
                  cur = Some((1L, t, t))
              }
            }
            cur.foreach { case s @ (_, _, last) =>
              state.update(s)
              // timeout is in event-time millis
              state.setTimeoutTimestamp((last + gapUs) / 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
