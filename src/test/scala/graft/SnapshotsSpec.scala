package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** Versioned dataset store: time-travel stability, copy-on-write
  * delete granularity, rollback, crash-state invisibility, GC
  * precision.
  */
class SnapshotsSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft-snap").toString

  private def docs(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"doc $i", s"src${i % 3}")).toDF(
      "doc_id", "text", "source")
  }

  test("appends create versions; readAt is stable under later commits") {
    val root = freshRoot()
    val v1 = Snapshots.commitAppend(spark, root, docs(0 until 10))
    val v2 = Snapshots.commitAppend(spark, root, docs(10 until 25))
    val v3 = Snapshots.commitAppend(spark, root, docs(25 until 30))
    assert((v1, v2, v3) == (1L, 2L, 3L))
    assert(Snapshots.readAt(spark, root, 1).count() == 10)
    assert(Snapshots.readAt(spark, root, 2).count() == 25)
    assert(Snapshots.readAt(spark, root, 3).count() == 30)
    // v1's CONTENT, not just count, is frozen
    assert(Snapshots.readAt(spark, root, 1)
      .agg(sum(col("doc_id"))).head.getLong(0) == (0 until 10).sum)
    assert(Snapshots.latestVersion(spark, root) == 3)
  }

  test("delete is copy-on-write at batch granularity and null-safe") {
    val root = freshRoot()
    Snapshots.commitAppend(spark, root, docs(0 until 10))   // b1
    Snapshots.commitAppend(spark, root, docs(10 until 20))  // b2
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def mtime(b: String) =
      fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$root/data/$b"))
        .getModificationTime
    val b1Before = mtime("b1")
    // matches only batch 2 → batch 1 must carry over UNTOUCHED
    val v3 = Snapshots.commitDelete(spark, root, col("doc_id") >= 15)
    assert(Snapshots.readAt(spark, root, v3).count() == 15)
    assert(mtime("b1") == b1Before)
    // prior version still sees the deleted rows
    assert(Snapshots.readAt(spark, root, 2).count() == 20)
    // null pred rows survive (SQL DELETE semantics)
    val v4 = Snapshots.commitDelete(spark, root,
      when(col("doc_id") < 5, lit(null).cast("boolean"))
        .otherwise(col("doc_id") === 7))
    val left = Snapshots.readAt(spark, root, v4)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!left.contains(7L) && left.contains(3L))
  }

  test("rollback rolls forward; history is an audit log") {
    val root = freshRoot()
    Snapshots.commitAppend(spark, root, docs(0 until 10))
    Snapshots.commitAppend(spark, root, docs(10 until 20))
    Snapshots.commitDelete(spark, root, col("doc_id") < 5)
    val v4 = Snapshots.rollback(spark, root, 1)
    assert(Snapshots.readAt(spark, root, v4).count() == 10)
    // nothing erased: every prior version still reads
    assert(Snapshots.readAt(spark, root, 3).count() == 15)
    val hist = Snapshots.history(spark, root)
    assert(hist.map(h => (h._1, h._2)) ==
      Seq((1L, "append"), (2L, "append"), (3L, "delete"), (4L, "rollback")))
    assert(hist.last._3 == 1L) // rollback's parent is its target
  }

  test("crashed commits are invisible; expire reclaims exactly the orphans") {
    val root = freshRoot()
    Snapshots.commitAppend(spark, root, docs(0 until 10))
    Snapshots.commitAppend(spark, root, docs(10 until 20))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // simulate a crash mid-commit: orphan data dir + tmp manifest,
    // no completed manifest
    docs(90 until 95).write.parquet(s"$root/data/b99")
    docs(0 until 1).write.parquet(s"$root/_v/_tmp_99")
    assert(Snapshots.latestVersion(spark, root) == 2)
    assert(Snapshots.read(spark, root).count() == 20)
    // expire keeping v2: v1's manifest goes, b99 + tmp go, b1 SURVIVES
    // because v2 still references it
    Snapshots.expire(spark, root, keepFrom = 2L)
    assert(Snapshots.versions(spark, root) == Seq(2L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/data/b99")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/_v/_tmp_99")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/data/b1")))
    assert(Snapshots.read(spark, root).count() == 20)
    // a delete then expire drops the rewritten batch's predecessor
    // only once no kept version references it
    val v3 = Snapshots.commitDelete(spark, root, col("doc_id") >= 10)
    Snapshots.expire(spark, root, keepFrom = v3)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/data/b2")))
    assert(Snapshots.read(spark, root).count() == 10)
  }

  test("corpusDiff over two snapshot versions yields exactly the edits") {
    // the q112 delta consumers take (added/removed/changed) straight
    // off two store versions — the composition a nightly pipeline runs
    val root = freshRoot()
    val v1 = Snapshots.commitAppend(spark, root, docs(0 until 20))
    Snapshots.commitDelete(spark, root, col("doc_id") < 3) // 0,1,2 removed
    val v3 = Snapshots.commitAppend(spark, root, docs(20 until 23))
    val diff = graft.operators.Versioning.corpusDiff(
        Snapshots.readAt(spark, root, v1),
        Snapshots.readAt(spark, root, v3))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(0L -> "removed", 1L -> "removed", 2L -> "removed",
      20L -> "added", 21L -> "added", 22L -> "added"))
  }

  test("compaction: one batch, identical content, old versions intact") {
    val root = freshRoot()
    (0 until 6).foreach(d =>
      Snapshots.commitAppend(spark, root, docs(d * 5 until (d + 1) * 5)))
    val before = Snapshots.read(spark, root)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val v7 = Snapshots.commitCompact(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val rows = Snapshots.history(spark, root).last
    assert(rows._2 == "compact" && rows._4 == 1L) // one batch referenced
    val after = Snapshots.readAt(spark, root, v7)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(after.toSeq == before.toSeq)
    // pre-compaction version still reads from the old batches
    assert(Snapshots.readAt(spark, root, 6).count() == 30)
    // expire to the compacted version reclaims all six day-batches
    Snapshots.expire(spark, root, keepFrom = v7)
    (1 to 6).foreach(i =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/data/b$i"))))
    assert(Snapshots.read(spark, root).count() == 30)
  }

  test("streaming ingest drives the store: one commit per micro-batch") {
    // the ingest_loop composition for the snapshot layer — a live
    // stream's foreachBatch is a legal store writer, and readAt
    // reconstructs every intermediate corpus state (drop-dir file
    // source, the production shape, as in IngestLoopSpec)
    import org.apache.spark.sql.types._
    val root = freshRoot()
    val dropDir = s"${freshRoot()}/arrivals"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dropDir))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("source", StringType)))
    val q = spark.readStream.schema(schema).parquet(dropDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Snapshots.commitAppend(spark, root, batch.localCheckpoint())
        ()
      }
      .start()
    try {
      docs(0 until 2).coalesce(1).write.mode("append").parquet(dropDir)
      q.processAllAvailable()
      docs(2 until 5).coalesce(1).write.mode("append").parquet(dropDir)
      q.processAllAvailable()
      assert(Snapshots.latestVersion(spark, root) == 2)
      assert(Snapshots.readAt(spark, root, 1).count() == 2)
      assert(Snapshots.read(spark, root).count() == 5)
    } finally q.stop()
  }

  test("a crashed commit's colliding data dir never wedges the writer") {
    // the round-9 advice bug: a crash AFTER writing data/b3 but BEFORE
    // the manifest rename left b3 on disk, and the next commit (of the
    // same version number) died forever on errorifexists. b3 is
    // provably orphaned (only commit 3 writes b3, and no _v/3 exists),
    // so the retry must clear it and proceed.
    val root = freshRoot()
    Snapshots.commitAppend(spark, root, docs(0 until 10))
    Snapshots.commitAppend(spark, root, docs(10 until 20))
    // crashed commit 3: data written, manifest never renamed
    docs(50 until 60).write.parquet(s"$root/data/b3")
    val v3 = Snapshots.commitAppend(spark, root, docs(20 until 25))
    assert(v3 == 3L)
    assert(Snapshots.readAt(spark, root, 3).count() == 25)
    // the orphan's rows are GONE, not merged
    assert(Snapshots.readAt(spark, root, 3)
      .filter(col("doc_id") >= 50).count() == 0)
    // a crashed DELETE retried as a delete also proceeds
    docs(70 until 75).write.parquet(s"$root/data/b4")
    val v4 = Snapshots.commitDelete(spark, root, col("doc_id") < 5)
    assert(v4 == 4L)
    assert(Snapshots.readAt(spark, root, v4).count() == 20)
  }

  private def jobsDuring[A](body: => A): (A, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val out = body
      // listener bus is async: wait until the count stops moving
      var last = -1
      var same = 0
      while (same < 3) {
        Thread.sleep(150)
        val cur = n.get()
        if (cur == last) same += 1 else { same = 0; last = cur }
      }
      (out, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("delete prunes batches by manifest stats and probes in ONE job") {
    def buildAndDelete(nBatches: Int): (String, Long, Int) = {
      val root = freshRoot()
      (0 until nBatches).foreach(d => Snapshots.commitAppend(spark, root,
        docs(d * 10 until (d + 1) * 10),
        statsCols = Seq("doc_id", "source")))
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      // destroy a batch the stats PROVE can't match (doc_id 0..9): if
      // the probe or rewrite ever touched it, the read would throw —
      // the read-path assertion the advice asked for
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/data/b1"), true)
      val (v, jobs) = jobsDuring {
        Snapshots.commitDelete(spark, root,
          col("doc_id") >= (nBatches * 10 - 8))
      }
      (root, v, jobs)
    }
    // the claim: job count is O(1) in the batch count — one manifest
    // pass + ONE union probe + survivor rewrite + manifest write (the
    // old per-batch isEmpty loop paid ≥ one job per batch, so 12
    // batches would cost ≥ 8 MORE jobs than 4)
    val (_, v4, jobs4) = buildAndDelete(4)
    val (root12, v12, jobs12) = buildAndDelete(12)
    assert(v4 == 5L && v12 == 13L)
    assert(math.abs(jobs12 - jobs4) <= 1,
      s"delete jobs grew with batch count: $jobs4 @4 vs $jobs12 @12")
    assert(jobs12 <= 14, s"delete launched $jobs12 jobs")
    // survivors correct (b1 is gone from disk but carried by
    // reference; read the still-present batches via readWhere)
    val left = Snapshots.readWhere(spark, root12, v12,
        col("doc_id") >= 100)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(left == (100 until 112).map(_.toLong).toSet)
  }

  test("readWhere prunes by stats; stringy and null-safe predicates stay sound") {
    val root = freshRoot()
    import spark.implicits._
    // three batches with DISJOINT source tags and doc_id ranges
    Snapshots.commitAppend(spark, root,
      (0 until 10).map(i => (i.toLong, s"doc $i", "alpha"))
        .toDF("doc_id", "text", "source"),
      statsCols = Seq("doc_id", "source"))
    Snapshots.commitAppend(spark, root,
      (10 until 20).map(i => (i.toLong, s"doc $i", "beta"))
        .toDF("doc_id", "text", "source"),
      statsCols = Seq("doc_id", "source"))
    Snapshots.commitAppend(spark, root,
      (20 until 30).map(i =>
          (i.toLong, s"doc $i", if (i == 25) null else "gamma"))
        .toDF("doc_id", "text", "source"),
      statsCols = Seq("doc_id", "source"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // b1 destroyed: any non-pruned read of it throws
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/data/b1"), true)
    // string equality prunes to b2 only
    assert(Snapshots.readWhere(spark, root, 3, col("source") === "beta")
      .count() == 10)
    // IS NULL prunes to b3 (only batch with a null source)
    assert(Snapshots.readWhere(spark, root, 3, col("source").isNull)
      .select("doc_id").head().getLong(0) == 25L)
    // IN list, disjunction, range — all prune past the dead batch
    // (the null-source row matches neither IN nor =!=)
    assert(Snapshots.readWhere(spark, root, 3,
      col("source").isin("beta", "gamma")).count() == 19)
    assert(Snapshots.readWhere(spark, root, 3,
      col("doc_id") > 14 && col("source") =!= "alpha").count() == 14)
    // prunes-to-nothing: empty relation, schema intact
    val none = Snapshots.readWhere(spark, root, 3, col("source") === "zzz")
    assert(none.count() == 0 &&
      none.columns.toSeq == Seq("doc_id", "text", "source"))
  }

  test("readWhere: the filter reaches the parquet scan (PushedFilters) and the scan holds only surviving batches") {
    val root = freshRoot()
    (0 until 3).foreach(d => Snapshots.commitAppend(spark, root,
      docs(d * 10 until (d + 1) * 10), statsCols = Seq("doc_id")))
    val df = Snapshots.readWhere(spark, root, 3, col("doc_id") >= 25)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // manifest-stats pruning above, parquet row-group pruning below:
    // the same predicate must be pushed INTO the surviving scan
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(doc_id,25)"),
      s"filter not pushed: ${scan.metadata("PushedFilters")}")
    val files = scan.relation.location.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/data/b3/")),
      s"scan touches pruned batches: ${files.mkString(", ")}")
    assert(df.count() == 5)
  }

  test("epoch ids make commits exactly-once under foreachBatch replay") {
    val root = freshRoot()
    val v1 = Snapshots.commitAppend(spark, root, docs(0 until 10),
      Seq("doc_id"), epochId = Some(0L))
    // the restart replay: same epoch again → same version, no new data
    val v1b = Snapshots.commitAppend(spark, root, docs(0 until 10),
      Seq("doc_id"), epochId = Some(0L))
    assert(v1 == 1L && v1b == 1L)
    assert(Snapshots.latestVersion(spark, root) == 1L)
    assert(Snapshots.read(spark, root).count() == 10)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dataDirs() = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/data"))
      .map(_.getPath.getName).toSet
    assert(dataDirs() == Set("b1"))
    val v2 = Snapshots.commitAppend(spark, root, docs(10 until 20),
      Seq("doc_id"), epochId = Some(1L))
    assert(v2 == 2L)
    // delete replay is idempotent too
    val v3 = Snapshots.commitDelete(spark, root, col("doc_id") >= 15,
      epochId = Some(2L))
    val v3b = Snapshots.commitDelete(spark, root, col("doc_id") >= 15,
      epochId = Some(2L))
    assert(v3 == 3L && v3b == 3L)
    assert(Snapshots.read(spark, root).count() == 15)
    assert(dataDirs() == Set("b1", "b2", "b3"))
  }

  test("rollback validates its target version") {
    val root = freshRoot()
    Snapshots.commitAppend(spark, root, docs(0 until 5))
    intercept[IllegalArgumentException] {
      Snapshots.rollback(spark, root, 0L)
    }
    intercept[IllegalArgumentException] {
      Snapshots.rollback(spark, root, 99L)
    }
    assert(Snapshots.latestVersion(spark, root) == 1L) // nothing committed
  }

  test("version discovery ignores tmp and non-numeric entries") {
    val root = freshRoot()
    Snapshots.commitAppend(spark, root, docs(0 until 5))
    docs(0 until 1).write.parquet(s"$root/_v/_tmp_7")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/_v/notes"))
    assert(Snapshots.versions(spark, root) == Seq(1L))
    assert(Snapshots.read(spark, root).count() == 5)
  }
}
