package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One referenced batch of a snapshot version: the data dir name, its
  * row count, and per-column min/max stats ([[ColStat]]) for the
  * columns the commit declared — the metadata `commitDelete` and
  * [[Snapshots.readWhere]] prune by.
  */
case class BatchRef(batch: String, n_rows: Long,
    stats: Map[String, ColStat])

/** Versioned parquet dataset — the snapshot/time-travel layer a
  * training-data release needs on top of raw parquet (the Iceberg/
  * Delta table-format idea, reduced to its load-bearing core): every
  * COMMIT is a new immutable manifest naming the data directories
  * that make up that version, swapped into place atomically, so
  * readers are never torn, history is queryable (`readAt`), mistakes
  * roll back without data movement, and storage is reclaimed only by
  * an explicit `expire`.
  *
  * Layout under `root/`:
  *   - `data/b<N>/…parquet`   — immutable batch dirs, one per commit
  *                              that wrote data; never rewritten
  *   - `_v/<N>/…parquet`      — manifest N: one row per referenced
  *                              batch `(batch, n_rows, op, parent,
  *                              epoch, stats)`
  *   - `_v/_tmp_<N>/`         — in-flight manifest (ignored by reads)
  *
  * Commit protocol (crash-safe on any Hadoop FS with atomic dir
  * rename, the bm_index discipline): data dirs are fully written
  * FIRST, then the manifest is written to `_v/_tmp_<N>` and RENAMED
  * to `_v/<N>`. A crash before the rename leaves only invisible
  * garbage — and because commit v is the ONLY writer that ever
  * creates `data/b<v>`, a `data/b<v>` present while `_v/<v>` is not
  * is PROVABLY a crashed attempt's orphan: the next commit of the
  * same version deletes it and proceeds (so a crash never wedges the
  * writer), and `expire` reclaims whatever never gets retried.
  * Version discovery is one listing of `_v` (max numeric name), so
  * there is no mutable "current" pointer to corrupt. Single-writer,
  * like the index stores; concurrent READERS are always safe.
  *
  * Exactly-once streaming: `commitAppend`/`commitDelete` take an
  * optional `epochId` (the foreachBatch batch id), recorded in the
  * manifest. A retry of the epoch the LATEST version already carries
  * — the only epoch Structured Streaming ever replays after a crash,
  * since its checkpoint advances past a batch only once the sink
  * call returned — is a no-op returning that version, so restart
  * replays leave every artifact byte-identical.
  *
  * Scale notes: a manifest is batch-count-sized (KB), never
  * data-sized; `readAt` hands Spark the batch dirs as plain parquet
  * paths, so scan pruning/pushdown work exactly as on raw parquet.
  * `commitDelete` is copy-on-write at BATCH granularity, and finds
  * the batches to rewrite by (1) pruning on the per-batch column
  * stats the manifest carries ([[SnapshotStats.mayMatch]] — batches
  * whose min/max envelope can't satisfy the predicate are skipped
  * without touching their files) and (2) ONE Spark probe job over
  * the remaining candidates (union read grouped by source batch),
  * never a per-batch job loop — so a right-to-be-forgotten delete
  * touching one day's batch rewrites that batch, not 100 TB, and a
  * 100-batch store pays O(1) job launches, not O(batches).
  */
object Snapshots {

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(root: String) = s"$root/_v"

  /** No-epoch marker in the manifest's `epoch` column. */
  private val NoEpoch = -1L

  /** Versions present, ascending (completed manifests only). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val d = new Path(manifestDir(root))
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong).sorted
  }

  def latestVersion(spark: SparkSession, root: String): Long =
    versions(spark, root).lastOption.getOrElse(0L)

  /** The manifest relation of one version. */
  private def manifest(spark: SparkSession, root: String,
      version: Long): DataFrame =
    spark.read.parquet(s"${manifestDir(root)}/$version")

  /** Read the table as of `version` (0 = empty table is an error —
    * version numbers start at 1 with the first commit).
    */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame = {
    val batches = manifest(spark, root, version)
      .select(col("batch")).filter(col("batch").isNotNull)
      .collect().map(_.getString(0))
    require(batches.nonEmpty,
      s"version $version references no data (fully-deleted table)")
    spark.read.parquet(batches.map(b => s"$root/data/$b"): _*)
  }

  /** Read the latest version. */
  def read(spark: SparkSession, root: String): DataFrame =
    readAt(spark, root, latestVersion(spark, root))

  /** [[readAt]] with manifest-stats pruning: batches whose min/max
    * envelope can't satisfy `filter` are never handed to the scan
    * (their files aren't even footer-read), the survivors get the
    * filter applied as usual — metadata pruning ABOVE parquet's
    * row-group pruning, the same two-level structure Iceberg gives
    * Spark. Prunes-to-nothing returns an empty relation with the
    * store's schema.
    */
  def readWhere(spark: SparkSession, root: String, version: Long,
      filter: Column): DataFrame = {
    val st = loadManifest(spark, root, version)
    val refs = st.refs
    require(refs.nonEmpty,
      s"version $version references no data (fully-deleted table)")
    val schema = st.schema.getOrElse(
      spark.read.parquet(s"$root/data/${refs.last.batch}").schema)
    val pe = SnapshotStats.resolve(spark, schema, filter)
    val live = refs.filter(r =>
      r.stats.isEmpty || SnapshotStats.mayMatch(pe, r.stats))
    if (live.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read
      .parquet(live.map(r => s"$root/data/${r.batch}"): _*)
      .filter(filter)
  }

  /** One lineage row per version: (version, op, parent, n_batches,
    * n_rows) — the audit log, from manifests only (no data scan).
    */
  def history(spark: SparkSession, root: String): Seq[(Long, String, Long, Long, Long)] =
    versions(spark, root).map { v =>
      val rows = manifest(spark, root, v)
        .agg(count(col("batch")), sum(col("n_rows")), // sentinel: 0 batches
          first(col("op")), first(col("parent")))
        .head()
      (v,
        if (rows.isNullAt(2)) "empty" else rows.getString(2),
        if (rows.isNullAt(3)) 0L else rows.getLong(3),
        rows.getLong(0),
        if (rows.isNullAt(1)) 0L else rows.getLong(1))
    }

  private def writeManifest(spark: SparkSession, root: String, version: Long,
      rows: Seq[BatchRef], op: String, parent: Long,
      epoch: Long = NoEpoch, schemaJson: String = ""): Unit = {
    import spark.implicits._
    val fs = fsOf(spark, root)
    val tmp = s"${manifestDir(root)}/_tmp_$version"
    // a zero-batch manifest (full delete / audit no-op) still carries
    // its epoch+schema via a batch=null sentinel row — otherwise a
    // foreachBatch replay of that epoch would read back NoEpoch and
    // re-run, breaking the byte-identical-replay contract
    val data =
      if (rows.nonEmpty)
        rows.map(r =>
          (r.batch, r.n_rows, op, parent, epoch, schemaJson, r.stats))
      else
        Seq((null: String, 0L, op, parent, epoch, schemaJson,
          Map.empty[String, ColStat]))
    data
      .toDF("batch", "n_rows", "op", "parent", "epoch", "schema_json",
        "stats")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val dst = new Path(s"${manifestDir(root)}/$version")
    if (fs.exists(dst))
      throw new IllegalStateException(
        s"version $version already committed — concurrent writer?")
    if (!fs.rename(new Path(tmp), dst))
      throw new IllegalStateException(s"manifest rename failed for v$version")
  }

  /** One version's manifest, decoded: batch refs, the commit's epoch
    * ([[NoEpoch]] if none / empty manifest) and recorded table
    * schema (None likewise). ONE read + ONE collect — every commit
    * path needs all three, and a commit should pay one manifest pass,
    * not three.
    */
  private case class ManifestState(refs: Seq[BatchRef], epoch: Long,
      schema: Option[org.apache.spark.sql.types.StructType],
      op: String = "")

  private def loadManifest(spark: SparkSession, root: String,
      version: Long): ManifestState = {
    import spark.implicits._
    if (version == 0) return ManifestState(Seq.empty, NoEpoch, None)
    val m = manifest(spark, root, version)
    val cols = m.columns.toSet
    if (cols("stats") && cols("epoch") && cols("schema_json")) {
      val rows = m.select(col("batch"), col("n_rows"), col("stats"),
          col("epoch"), col("schema_json"), col("op"))
        .as[(String, Long, Map[String, ColStat], Long, String, String)]
        .collect()
      ManifestState(
        rows.filter(_._1 != null) // drop the zero-batch sentinel row
          .map { case (b, n, s, _, _, _) =>
            BatchRef(b, n, Option(s).getOrElse(Map.empty)) }.toSeq,
        rows.headOption.map(_._4).getOrElse(NoEpoch),
        rows.headOption.map(_._5).filter(_.nonEmpty)
          .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
            .asInstanceOf[org.apache.spark.sql.types.StructType]),
        rows.headOption.map(_._6).getOrElse(""))
    } else // pre-stats manifest: readable, just unprunable
      ManifestState(
        m.select(col("batch"), col("n_rows")).collect()
          .map(r => BatchRef(r.getString(0), r.getLong(1), Map.empty)).toSeq,
        NoEpoch, None)
  }

  /** The appended batches with epoch > `afterEpoch`, ascending: each
    * is `(epoch, the batch relation)` — version v's own `data/b<v>`,
    * batch-sized, never the whole table. This is the restart replay
    * source for driver-held incremental state
    * ([[graft.streaming.EpochedState]]): a driver that checkpointed
    * its state at epoch C re-folds exactly these instead of
    * re-scanning the standing corpus. Reads one KB-sized manifest per
    * version — no data is touched until a returned relation is acted
    * on.
    */
  def appendsSince(spark: SparkSession, root: String,
      afterEpoch: Long): Seq[(Long, DataFrame)] =
    versions(spark, root).flatMap { v =>
      val st = loadManifest(spark, root, v)
      if (st.op == "append" && st.epoch != NoEpoch && st.epoch > afterEpoch)
        Some((st.epoch, spark.read.parquet(s"$root/data/b$v")))
      else None
    }

  private def currentRows(spark: SparkSession, root: String,
      version: Long): Seq[BatchRef] =
    loadManifest(spark, root, version).refs

  /** Delete a provably-orphaned `data/b<v>` left by a crashed commit
    * of this same version (commit v is the only writer that creates
    * b<v>, and v > latest means no manifest references it), so a
    * crash after the data write but before the manifest rename never
    * wedges the next commit.
    */
  private def clearOrphan(spark: SparkSession, root: String,
      batch: String): Unit = {
    val fs = fsOf(spark, root)
    val p = new Path(s"$root/data/$batch")
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Append `df` as a new version; returns the committed version.
    *
    * `statsCols` declares the columns whose min/max travel in the
    * manifest (the prune set — pick the partition-like columns
    * deletes and reads key on: dates, source ids, doc-id ranges).
    * `epochId` makes the commit idempotent under foreachBatch replay
    * (see the object doc).
    */
  def commitAppend(spark: SparkSession, root: String, df: DataFrame,
      statsCols: Seq[String] = Seq.empty,
      epochId: Option[Long] = None): Long = {
    val prev = latestVersion(spark, root)
    val st = loadManifest(spark, root, prev)
    if (epochId.isDefined && prev > 0 && st.epoch == epochId.get)
      return prev
    val v = prev + 1
    val batch = s"b$v"
    clearOrphan(spark, root, batch)
    df.write.mode("errorifexists").parquet(s"$root/data/$batch")
    val written = spark.read.parquet(s"$root/data/$batch")
    val (n, stats) = SnapshotStats.computeStats(written, statsCols)
    writeManifest(spark, root, v,
      st.refs :+ BatchRef(batch, n, stats),
      "append", prev, epochId.getOrElse(NoEpoch), written.schema.json)
    v
  }

  /** Delete rows matching `pred` as a new version — copy-on-write at
    * batch granularity: untouched batches carry over by reference.
    * Batches to rewrite are found by manifest-stats pruning plus ONE
    * union-read probe job (see the object doc); rewritten batches
    * keep stats for the same columns their sources carried.
    */
  def commitDelete(spark: SparkSession, root: String, pred: Column,
      epochId: Option[Long] = None): Long = {
    val prev = latestVersion(spark, root)
    require(prev > 0, "nothing committed yet")
    val st = loadManifest(spark, root, prev)
    if (epochId.isDefined && st.epoch == epochId.get) return prev
    val v = prev + 1
    val rows = st.refs
    val schema = st.schema.getOrElse(
      if (rows.isEmpty) new org.apache.spark.sql.types.StructType()
      else spark.read.parquet(s"$root/data/${rows.last.batch}").schema)
    // metadata prune: batches whose stats envelope can't satisfy pred
    // carry over without a single file touched
    val pe = SnapshotStats.resolve(spark, schema, pred)
    val candidates = rows.filter(r =>
      r.stats.isEmpty || SnapshotStats.mayMatch(pe, r.stats))
    // ONE probe job over every candidate: which batches hold matches
    val hitNames: Set[String] =
      if (candidates.isEmpty) Set.empty
      else spark.read
        .parquet(candidates.map(r => s"$root/data/${r.batch}"): _*)
        .filter(pred)
        // the file's PARENT dir name is the batch (batch dirs are flat
        // parquet dirs) — anchoring to the tail is immune to a store
        // root that itself contains a "/data/" segment
        .select(regexp_extract(input_file_name(), "/([^/]+)/[^/]*$", 1)
          .as("_b"))
        .distinct().collect().map(_.getString(0)).toSet
    val (hit, kept) = rows.partition(r => hitNames.contains(r.batch))
    if (hit.isEmpty) { // audit-trail no-op commit
      writeManifest(spark, root, v, rows, "delete", prev,
        epochId.getOrElse(NoEpoch), schema.json)
      return v
    }
    val batch = s"b$v"
    clearOrphan(spark, root, batch)
    // SQL DELETE semantics: only pred = TRUE rows go; NULL survives
    val survivors = spark.read
      .parquet(hit.map(r => s"$root/data/${r.batch}"): _*)
      .filter(!coalesce(pred, lit(false)))
    survivors.write.mode("errorifexists").parquet(s"$root/data/$batch")
    val keysToKeep = hit.flatMap(_.stats.keys).distinct
    val (n, stats) = SnapshotStats.computeStats(
      spark.read.parquet(s"$root/data/$batch"), keysToKeep)
    val newRows = if (n > 0) kept :+ BatchRef(batch, n, stats) else kept
    writeManifest(spark, root, v, newRows, "delete", prev,
      epochId.getOrElse(NoEpoch), schema.json)
    v
  }

  /** Roll FORWARD to a new version whose content is `toVersion`'s —
    * history stays intact (nothing is erased), no data moves.
    */
  def rollback(spark: SparkSession, root: String, toVersion: Long): Long = {
    val known = versions(spark, root)
    require(known.contains(toVersion),
      s"rollback target v$toVersion does not exist (have: " +
        s"${known.mkString(", ")})")
    val prev = known.last
    val v = prev + 1
    val target = loadManifest(spark, root, toVersion)
    writeManifest(spark, root, v, target.refs, "rollback", toVersion,
      schemaJson = target.schema.map(_.json).getOrElse(""))
    v
  }

  /** Rewrite the CURRENT content as one right-sized batch and commit
    * it as a new version — the store-level small-file compaction
    * (nightly appends leave one batch dir per day; scans pay a
    * footer read per file). Content is byte-identical by
    * construction (one read → one write of the same rows); prior
    * versions still reference the old batches until `expire`
    * reclaims them, so compaction is as non-destructive as any other
    * commit. Stats carry forward for every column any source batch
    * tracked.
    */
  def commitCompact(spark: SparkSession, root: String): Long = {
    val prev = latestVersion(spark, root)
    require(prev > 0, "nothing committed yet")
    val v = prev + 1
    val batch = s"b$v"
    clearOrphan(spark, root, batch)
    readAt(spark, root, prev).write
      .mode("errorifexists").parquet(s"$root/data/$batch")
    val keys = currentRows(spark, root, prev)
      .flatMap(_.stats.keys).distinct
    val written = spark.read.parquet(s"$root/data/$batch")
    val (n, stats) = SnapshotStats.computeStats(written, keys)
    writeManifest(spark, root, v, Seq(BatchRef(batch, n, stats)),
      "compact", prev, schemaJson = written.schema.json)
    v
  }

  /** Reclaim storage: drop manifests older than `keepFrom` and delete
    * every data dir (and stray tmp manifest) no surviving manifest
    * references. The only destructive operation in the store, and the
    * only one that needs single-writer coordination with readers of
    * expired versions.
    */
  def expire(spark: SparkSession, root: String, keepFrom: Long): Unit = {
    val fs = fsOf(spark, root)
    val all = versions(spark, root)
    val (drop, keep) = all.partition(_ < keepFrom)
    require(keep.nonEmpty, "refusing to expire every version")
    val referenced = keep.flatMap(v => currentRows(spark, root, v))
      .map(_.batch).toSet
    drop.foreach(v => fs.delete(new Path(s"${manifestDir(root)}/$v"), true))
    // stray in-flight manifests from crashed commits
    fs.listStatus(new Path(manifestDir(root))).toSeq
      .filter(_.getPath.getName.startsWith("_tmp_"))
      .foreach(s => fs.delete(s.getPath, true))
    val dataDir = new Path(s"$root/data")
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).toSeq
        .filterNot(s => referenced.contains(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, true))
  }
}
