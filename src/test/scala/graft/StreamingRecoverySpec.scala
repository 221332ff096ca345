package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.streaming.EventStreams

/** Kill-and-restart resilience for the stateful streaming operators:
  * the query runs over a first batch of files with a RocksDB-backed
  * state store + checkpoint, is stopped, more files land, and a NEW
  * query object resumes from the checkpoint. Correct recovery means
  * (a) nothing already emitted is emitted again (exactly-once across
  * the restart), and (b) state written before the kill keeps working
  * after it — a session whose events straddle the restart boundary is
  * stitched into ONE session, and duplicate ids replayed after the
  * restart are still suppressed.
  */
class StreamingRecoverySpec extends SparkSpec {

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Write `df` as a single parquet FILE at `dest` (FileStreamSource
    * treats each new file as an arrival).
    */
  private def writeOne(df: DataFrame, dest: Path): Unit = {
    val stage = Files.createTempDirectory("graft_stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).toArray.map(_.asInstanceOf[Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, dest)
  }

  /** Events with ts normalized to TIMESTAMP (whatever the on-disk
    * physical type — [[Tables]] owns that mapping). Re-written splits
    * then carry TIMESTAMP, which [[EventStreams.sourceFrom]] passes
    * through unchanged.
    */
  private def rawEvents: DataFrame = Tables(spark, sf, "events")

  /** Run a streaming DF to parquet-out via foreachBatch until drained,
    * then stop. Returns the rows landed in `out` by THIS run.
    */
  private def runOnce(stream: DataFrame, ckpt: String, out: String,
      cols: Seq[String]): Set[Seq[Any]] = {
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }
      .start()
    try { q.processAllAvailable() } finally q.stop()
    if (!Files.exists(Paths.get(out)) ||
        Files.list(Paths.get(out)).toArray.isEmpty) Set.empty
    else spark.read.parquet(out).select(cols.head, cols.tail: _*)
      .collect().map(_.toSeq).toSet
  }

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def stateFiles(ckpt: String): Seq[String] = {
    val state = Paths.get(ckpt, "state")
    if (!Files.exists(state)) Seq.empty
    else {
      val w = Files.walk(state)
      try w.toArray.map(_.toString).toSeq finally w.close()
    }
  }

  test("sessionize survives kill+restart on RocksDB: boundary session stitched, no re-emits") {
    withRocksDb {
      val tmp = Files.createTempDirectory("graft_recov_sess")
      val srcDir = Files.createDirectory(tmp.resolve("src"))
      val ckpt = tmp.resolve("ckpt").toString
      val ev = rawEvents // ts: epoch nanos

      // Split INSIDE the longest closed batch session so recovery has
      // to stitch its two halves from checkpointed state.
      val longest = Relational.q18(spark, sf)
        .selectExpr("user_id", "n_events",
          "unix_micros(session_start) AS s", "unix_micros(session_end) AS e")
        .orderBy(col("n_events").desc, col("user_id")).limit(1)
        .collect().head
      val splitUs = (longest.getAs[Long]("s") + longest.getAs[Long]("e")) / 2
      writeOne(ev.filter(unix_micros(col("ts")) <= splitUs),
        srcDir.resolve("events_1.parquet"))

      def stream(schemaFile: Path) = EventStreams.sessionizeOn(spark,
        EventStreams.sourceFrom(spark, schemaFile.toString,
          s"$srcDir/events*.parquet")).toDF()
      val out1 = tmp.resolve("out1").toString
      val cols = Seq("user_id", "n_events", "start_us", "end_us")
      val run1 = runOnce(stream(srcDir.resolve("events_1.parquet")),
        ckpt, out1, cols)

      // the state the restart must recover really is RocksDB-format
      val sf1 = stateFiles(ckpt)
      assert(sf1.exists(_.endsWith(".zip")),
        s"no RocksDB zip snapshots under $ckpt/state")
      assert(!sf1.exists(_.endsWith(".delta")),
        "HDFS-provider .delta files present — RocksDB provider not in effect")

      // second half lands; a NEW query resumes from the checkpoint
      writeOne(ev.filter(unix_micros(col("ts")) > splitUs),
        srcDir.resolve("events_2.parquet"))
      val out2 = tmp.resolve("out2").toString
      val run2 = runOnce(stream(srcDir.resolve("events_1.parquet")),
        ckpt, out2, cols)

      assert(run1.nonEmpty, "run 1 emitted no sessions")
      assert(run2.nonEmpty, "run 2 emitted no sessions")
      assert(run1.intersect(run2).isEmpty,
        s"re-emitted after restart: ${run1.intersect(run2).take(3)}")
      // every emitted session exists in the batch answer (no state
      // corruption: counts/bounds of stitched sessions are exact)
      val want = Relational.q18(spark, sf)
        .selectExpr("user_id", "n_events", "unix_micros(session_start)",
          "unix_micros(session_end)")
        .collect().map(_.toSeq).toSet
      val union = run1 ++ run2
      assert(union.subsetOf(want),
        s"sessions not in batch answer: ${union.diff(want).take(3)}")
      // the split session itself: emitted after restart as ONE session
      // with the pre-kill start — only possible if state was recovered
      assert(run2.contains(longest.toSeq),
        s"boundary session ${longest.toSeq} not stitched across restart")
    }
  }

  test("dedup-within-watermark survives kill+restart: replayed ids still suppressed") {
    withRocksDb {
      val tmp = Files.createTempDirectory("graft_recov_dedup")
      val srcDir = Files.createDirectory(tmp.resolve("src"))
      val ckpt = tmp.resolve("ckpt").toString
      val ev = rawEvents

      val splitUs = ev
        .selectExpr("percentile_approx(unix_micros(ts), 0.5) AS m")
        .collect().head.getLong(0)
      val half1 = ev.filter(unix_micros(col("ts")) <= splitUs)
      writeOne(half1, srcDir.resolve("events_1.parquet"))

      def stream(schemaFile: Path) = EventStreams.dedupOn(
        EventStreams.sourceFrom(spark, schemaFile.toString,
          s"$srcDir/events*.parquet"))
      val out1 = tmp.resolve("out1").toString
      val run1 = runOnce(stream(srcDir.resolve("events_1.parquet")),
        ckpt, out1, Seq("event_id"))

      // second half + replays of the NEWEST pre-kill events (their ids
      // are inside the 2h dedup watermark at the kill point — splitUs
      // is half1's max ts — so only recovered state can suppress them)
      val replays = half1
        .filter(unix_micros(col("ts")) > splitUs - 2L * 3600 * 1000000L)
        .limit(50)
      writeOne(ev.filter(unix_micros(col("ts")) > splitUs).unionAll(replays),
        srcDir.resolve("events_2.parquet"))
      val out2 = tmp.resolve("out2").toString
      val run2 = runOnce(stream(srcDir.resolve("events_1.parquet")),
        ckpt, out2, Seq("event_id"))

      val ids1 = run1.map(_.head.asInstanceOf[Long])
      val ids2 = run2.map(_.head.asInstanceOf[Long])
      assert(replays.count() > 0, "no replay candidates inside the watermark")
      assert(ids1.intersect(ids2).isEmpty,
        s"replayed ids re-emitted after restart: ${ids1.intersect(ids2).take(5)}")
      val want = ev.select("event_id").collect().map(_.getLong(0)).toSet
      assert(ids1 ++ ids2 === want, "union of runs != unique event ids")
    }
  }

  test("rate-source soak: sustained windowed agg keeps state bounded by the watermark") {
    // the built-in rate source generates rowsPerSecond forever — the
    // soak asserts the watermarked agg keeps up AND its state stays
    // O(windows-in-flight × keys), i.e. eviction works under load
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", 5000).load()
      .withColumn("user_id", col("value") % 100)
      .withWatermark("timestamp", "4 seconds")
      .groupBy(window(col("timestamp"), "2 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = events.writeStream
      .outputMode("append").format("memory").queryName("soak_out").start()
    try {
      // run until ≥5 fed batches AND the watermark has sealed at least
      // one window into the sink (or the 40 s deadline)
      val deadline = System.nanoTime + 40L * 1000 * 1000 * 1000
      while (System.nanoTime < deadline &&
        (q.recentProgress.count(_.numInputRows > 0) < 5 ||
          spark.sql("SELECT 1 FROM soak_out LIMIT 1").isEmpty))
        Thread.sleep(500)
    } finally q.stop()
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    assert(progress.length >= 5, s"only ${progress.length} non-empty batches")
    assert(q.exception.isEmpty, s"query failed: ${q.exception}")
    val in = progress.map(_.numInputRows).sum
    assert(in > 10000, s"soak processed only $in rows")
    // state rows ≤ keys × windows alive inside watermark+window span
    // (100 users × ~4 windows, with slack) — without eviction 20 s of
    // 2 s windows × 100 users would exceed this
    val lastState = progress.last.stateOperators.head.numRowsTotal
    assert(lastState < 1500, s"state grew to $lastState rows — not evicting")
    // emitted (sealed) windows are complete: every (window,user) row
    // carries the full count for that slot, so no count exceeds the
    // slot's theoretical max of rowsPerSecond × 2 s / 100 users + slack
    val emitted = spark.sql("SELECT n FROM soak_out").collect()
    assert(emitted.nonEmpty, "watermark sealed no windows during soak")
    emitted.foreach(r => assert(r.getLong(0) <= 150))
  }
}
