package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  *                              batch `(batch, n_rows, op, parent)`
  *   - `_v/_tmp_<N>/`         — in-flight manifest (ignored by reads)
  *
  * Commit protocol (crash-safe on any Hadoop FS with atomic dir
  * rename, the bm_index discipline): data dirs are fully written
  * FIRST, then the manifest is written to `_v/_tmp_<N>` and RENAMED
  * to `_v/<N>`. A crash before the rename leaves only invisible
  * garbage (an orphan data dir / tmp manifest that no version
  * references — `expire` reclaims both); a crash after is a completed
  * commit. Version discovery is one listing of `_v` (max numeric
  * name), so there is no mutable "current" pointer to corrupt.
  * Single-writer, like the index stores; concurrent READERS are
  * always safe.
  *
  * Scale notes: a manifest is batch-count-sized (KB), never
  * data-sized; `readAt` hands Spark the batch dirs as plain parquet
  * paths, so scan pruning/pushdown work exactly as on raw parquet.
  * `commitDelete` is copy-on-write at BATCH granularity — only
  * batches that contain matching rows rewrite (a per-batch existence
  * probe; a production store would short-circuit with column min/max
  * stats in the manifest, the documented next knob), so a
  * right-to-be-forgotten delete touching one day's batch rewrites
  * that batch, not 100 TB.
  */
object Snapshots {

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(root: String) = s"$root/_v"

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
      .select(col("batch")).collect().map(_.getString(0))
    require(batches.nonEmpty,
      s"version $version references no data (fully-deleted table)")
    spark.read.parquet(batches.map(b => s"$root/data/$b"): _*)
  }

  /** Read the latest version. */
  def read(spark: SparkSession, root: String): DataFrame =
    readAt(spark, root, latestVersion(spark, root))

  /** One lineage row per version: (version, op, parent, n_batches,
    * n_rows) — the audit log, from manifests only (no data scan).
    */
  def history(spark: SparkSession, root: String): Seq[(Long, String, Long, Long, Long)] =
    versions(spark, root).map { v =>
      val rows = manifest(spark, root, v)
        .agg(count(lit(1)), sum(col("n_rows")),
          first(col("op")), first(col("parent")))
        .head()
      (v,
        if (rows.isNullAt(2)) "empty" else rows.getString(2),
        if (rows.isNullAt(3)) 0L else rows.getLong(3),
        rows.getLong(0),
        if (rows.isNullAt(1)) 0L else rows.getLong(1))
    }

  private def writeManifest(spark: SparkSession, root: String, version: Long,
      rows: Seq[(String, Long)], op: String, parent: Long): Unit = {
    import spark.implicits._
    val fs = fsOf(spark, root)
    val tmp = s"${manifestDir(root)}/_tmp_$version"
    rows.map { case (b, n) => (b, n, op, parent) }
      .toDF("batch", "n_rows", "op", "parent")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val dst = new Path(s"${manifestDir(root)}/$version")
    if (fs.exists(dst))
      throw new IllegalStateException(
        s"version $version already committed — concurrent writer?")
    if (!fs.rename(new Path(tmp), dst))
      throw new IllegalStateException(s"manifest rename failed for v$version")
  }

  private def currentRows(spark: SparkSession, root: String,
      version: Long): Seq[(String, Long)] =
    if (version == 0) Seq.empty
    else manifest(spark, root, version)
      .select(col("batch"), col("n_rows")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Append `df` as a new version; returns the committed version. */
  def commitAppend(spark: SparkSession, root: String, df: DataFrame): Long = {
    val prev = latestVersion(spark, root)
    val v = prev + 1
    val batch = s"b$v"
    df.write.mode("errorifexists").parquet(s"$root/data/$batch")
    val n = spark.read.parquet(s"$root/data/$batch").count()
    writeManifest(spark, root, v,
      currentRows(spark, root, prev) :+ (batch, n), "append", prev)
    v
  }

  /** Delete rows matching `pred` as a new version — copy-on-write at
    * batch granularity: untouched batches carry over by reference.
    */
  def commitDelete(spark: SparkSession, root: String, pred: Column): Long = {
    val prev = latestVersion(spark, root)
    require(prev > 0, "nothing committed yet")
    val v = prev + 1
    val rows = currentRows(spark, root, prev)
    val (hit, kept) = rows.partition { case (b, _) =>
      !spark.read.parquet(s"$root/data/$b").filter(pred).isEmpty
    }
    if (hit.isEmpty) { // audit-trail no-op commit
      writeManifest(spark, root, v, rows, "delete", prev)
      return v
    }
    val batch = s"b$v"
    // SQL DELETE semantics: only pred = TRUE rows go; NULL survives
    val survivors = spark.read
      .parquet(hit.map { case (b, _) => s"$root/data/$b" }: _*)
      .filter(!coalesce(pred, lit(false)))
    survivors.write.mode("errorifexists").parquet(s"$root/data/$batch")
    val n = spark.read.parquet(s"$root/data/$batch").count()
    val newRows = if (n > 0) kept :+ (batch, n) else kept
    writeManifest(spark, root, v, newRows, "delete", prev)
    v
  }

  /** Roll FORWARD to a new version whose content is `toVersion`'s —
    * history stays intact (nothing is erased), no data moves.
    */
  def rollback(spark: SparkSession, root: String, toVersion: Long): Long = {
    val prev = latestVersion(spark, root)
    val v = prev + 1
    writeManifest(spark, root, v,
      currentRows(spark, root, toVersion), "rollback", toVersion)
    v
  }

  /** Rewrite the CURRENT content as one right-sized batch and commit
    * it as a new version — the store-level small-file compaction
    * (nightly appends leave one batch dir per day; scans pay a
    * footer read per file). Content is byte-identical by
    * construction (one read → one write of the same rows); prior
    * versions still reference the old batches until `expire`
    * reclaims them, so compaction is as non-destructive as any other
    * commit.
    */
  def commitCompact(spark: SparkSession, root: String): Long = {
    val prev = latestVersion(spark, root)
    require(prev > 0, "nothing committed yet")
    val v = prev + 1
    val batch = s"b$v"
    readAt(spark, root, prev).write
      .mode("errorifexists").parquet(s"$root/data/$batch")
    val n = spark.read.parquet(s"$root/data/$batch").count()
    writeManifest(spark, root, v, Seq((batch, n)), "compact", prev)
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
      .map(_._1).toSet
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
