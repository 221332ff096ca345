package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference blueprint surface (upload / download / move / delete
  * with exact or regex matching — ftp-blueprints
  * {upload,download,move,delete}_file.py) re-expressed over
  * `org.apache.hadoop.fs.FileSystem`, so one implementation serves
  * file://, hdfs://, s3a://, and graft's own FTP connector, and every
  * bulk operation distributes over Spark executors (one FS connection
  * per partition — 1000 executors ⇒ 1000 parallel transfer streams,
  * no driver bottleneck).
  */
object FileOps {

  /** The reference's error taxonomy (ftp-blueprints exit_codes.py:1-4)
    * as a typed exception: 3 bad credentials, 200 no matches, 201
    * invalid path, 202 move error. Library callers pattern-match on
    * `code`; a CLI wrapper would `sys.exit(code)`.
    */
  final case class GraftFsError(code: Int, message: String)
      extends RuntimeException(message)
  object ErrorCodes {
    val IncorrectCredentials = 3
    val NoMatchesFound = 200
    val InvalidFilePath = 201
    val MoveError = 202
  }

  /** Guard: a matching stage that found nothing is exit-200 in the
    * reference (upload_file.py / download_file.py main flow).
    */
  def requireMatches(matched: Seq[String], pattern: String): Seq[String] =
    if (matched.isEmpty)
      throw GraftFsError(ErrorCodes.NoMatchesFound,
        s"no files found matching '$pattern'")
    else matched

  case class FileEntry(path: String, size: Long, mtime: Long, is_dir: Boolean)

  private def fs(uri: String, conf: Configuration): FileSystem = {
    val f = FileSystem.newInstance(new URI(uri), conf)
    // no .crc sidecars from ChecksumFileSystem wrappers (local fs)
    f.setWriteChecksum(false)
    f.setVerifyChecksum(false)
    f
  }

  private def hadoopConf(spark: SparkSession): Configuration =
    spark.sessionState.newHadoopConf()

  /** Recursive listing as a DataFrame — the Spark-shaped twin of the
    * reference's `find_files_in_directory` walk (download_file.py:138).
    * Only the root's direct children are listed on the driver (bounded
    * by the root's fan-out); each child subtree is walked in parallel
    * on the executors, and the result STAYS distributed — the manifest
    * is a DataFrame over the walk's RDD, never `.collect()`ed. At
    * 10⁷–10⁸ files the manifest feeds bulkCopy partition-by-partition
    * without ever materializing on the driver.
    */
  def listRecursive(spark: SparkSession, rootUri: String): DataFrame = {
    import spark.implicits._
    val conf = new SerializableConfiguration(hadoopConf(spark))
    val root = fs(rootUri, conf.value)
    val top: Seq[FileStatus] =
      try root.listStatus(new Path(rootUri)).toSeq
      catch {
        case _: java.io.FileNotFoundException =>
          throw GraftFsError(ErrorCodes.InvalidFilePath,
            s"source path does not exist: $rootUri")
      }
      finally root.close()
    val (dirs, files) = top.partition(_.isDirectory)
    val topEntries = files.map(st => FileEntry(
      st.getPath.toUri.getPath, st.getLen,
      st.getModificationTime, is_dir = false)) ++
      dirs.map(st => FileEntry(st.getPath.toUri.getPath,
        0L, st.getModificationTime, is_dir = true))
    val topDF = topEntries.toDF()
    val subtreeDF =
      if (dirs.isEmpty) spark.emptyDataset[FileEntry].toDF()
      else spark.sparkContext
        .parallelize(dirs.map(_.getPath.toString), math.min(dirs.size, 64))
        .mapPartitions { paths =>
          paths.flatMap { p =>
            val f = FileSystem.newInstance(new URI(p), conf.value)
            try walk(f, new Path(p))
            finally f.close()
          }
        }.toDF()
    topDF.unionAll(subtreeDF).orderBy(col("path"))
  }

  private def walk(f: FileSystem, p: Path): Seq[FileEntry] =
    f.listStatus(p).toSeq.flatMap { st =>
      if (st.isDirectory)
        FileEntry(st.getPath.toUri.getPath, 0L, st.getModificationTime,
          is_dir = true) +: walk(f, st.getPath)
      else Seq(FileEntry(st.getPath.toUri.getPath, st.getLen,
        st.getModificationTime, is_dir = false))
    }

  /** Regex basename matching (download_file.py:174) over a manifest. */
  def matchBasename(manifest: DataFrame, pattern: String): DataFrame =
    manifest.filter(!col("is_dir")
      && regexp_like(element_at(split(col("path"), "/"), -1), lit(pattern)))

  /** Full-path regex matching (upload_file.py:147 semantics). */
  def matchFullPath(manifest: DataFrame, pattern: String): DataFrame =
    manifest.filter(!col("is_dir") && regexp_like(col("path"), lit(pattern)))

  /** Transfer spec: one source file → one destination path. */
  case class Transfer(src: String, dst: String)

  /** Plan destination names for a set of matched sources: explicit
    * destination name is enumerated `name_N.ext` on multi-match
    * (upload_file.py:242-253), otherwise each source keeps its
    * basename under the destination folder.
    */
  def planTransfers(
      sources: Seq[String],
      destinationFolder: String,
      destinationFileName: Option[String]): Seq[Transfer] = {
    val multi = sources.lengthCompare(1) > 0
    sources.zipWithIndex.map { case (src, i) =>
      Transfer(src, PathUtils.determineDestinationFullPath(
        destinationFolder, destinationFileName, src,
        if (multi && destinationFileName.isDefined) Some(i + 1) else None))
    }
  }

  /** Retry a transient-failure-prone action up to `attempts` extra
    * times with exponential backoff (backoffMs, 2×, 4×, …). Typed
    * [[GraftFsError]]s are NEVER retried — the reference's taxonomy
    * codes (bad credentials, no matches, bad paths) are deterministic
    * job outcomes, not network weather; retrying them would only
    * delay the correct exit code. The production transfer-job twin of
    * the blueprint CLIs' `--retries/--backoff-ms` flags.
    */
  def withRetries[A](attempts: Int, backoffMs: Long)(f: () => A): A = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= attempts) {
      try return f()
      catch {
        case e: GraftFsError => throw e
        case scala.util.control.NonFatal(e) =>
          lastErr = e
          if (attempt < attempts)
            Thread.sleep(backoffMs << attempt)
          attempt += 1
      }
    }
    throw lastErr
  }

  /** Distributed bulk copy between any two Hadoop filesystems: the
    * transfer list is partitioned across executors; each partition
    * opens one source FS + one destination FS and streams bytes.
    * `dstUriPrefix` anchors relative destinations (e.g.
    * "file:/tmp/out" or "gftp://host:21").
    *
    * `retries` re-runs an individual FILE's copy on transient errors
    * (fresh source/destination streams each attempt; `create`
    * overwrites, so a half-written destination is replaced, making
    * per-file retry idempotent). The FS handles are per-partition; a
    * connection-level failure surfaces on the next stream open and is
    * retried the same way.
    *
    * `resume = true` picks transfers up where they died instead of
    * restarting: a destination already at the source's size is
    * skipped, a shorter one is completed by seeking the source to the
    * destination length and APPENDING the tail — over gftp both sides
    * are REST offsets (O(1) positioning), so a retried 10 GB transfer
    * that failed at 9 GB moves 1 GB, not 10. Combined with `retries`,
    * each attempt re-probes the sizes and continues from wherever the
    * previous attempt stopped.
    */
  def bulkCopy(
      spark: SparkSession,
      transfers: Seq[Transfer],
      srcUriPrefix: String,
      dstUriPrefix: String,
      parallelism: Int = 32,
      retries: Int = 0,
      backoffMs: Long = 1000L,
      resume: Boolean = false): Unit = {
    if (transfers.isEmpty) return
    val conf = new SerializableConfiguration(hadoopConf(spark))
    spark.sparkContext
      .parallelize(transfers, math.min(transfers.size, parallelism))
      .foreachPartition { it: Iterator[Transfer] =>
        // a bare-scheme prefix ("file:") needs a root path to be a URI
        def asUri(p: String) = new URI(if (p.endsWith(":")) p + "/" else p)
        val sfs = FileSystem.newInstance(asUri(srcUriPrefix), conf.value)
        val dfs = FileSystem.newInstance(asUri(dstUriPrefix), conf.value)
        sfs.setVerifyChecksum(false)
        dfs.setWriteChecksum(false)
        try it.foreach { t =>
          // absolute destinations append directly to the scheme/root
          val joined = if (t.dst.startsWith("/")) s"$dstUriPrefix${t.dst}"
            else s"$dstUriPrefix/${t.dst}"
          val dst = new Path(joined.replaceAll("(?<!:)//+", "/"))
          withRetries(retries, backoffMs) { () =>
            val parent = dst.getParent
            if (parent != null && !dfs.exists(parent)) dfs.mkdirs(parent)
            // resume probe: sizes re-checked on every attempt, so a
            // retry continues from wherever the last attempt died
            val dstLen =
              if (!resume) -1L
              else try {
                val s = dfs.getFileStatus(dst)
                if (s.isFile) s.getLen else -1L
              } catch { case _: java.io.FileNotFoundException => -1L }
            val srcLen =
              if (dstLen > 0) sfs.getFileStatus(new Path(t.src)).getLen
              else -1L
            if (dstLen > 0 && dstLen == srcLen) () // already complete
            else if (dstLen > 0 && dstLen < srcLen) {
              val in = sfs.open(new Path(t.src))
              try {
                in.seek(dstLen) // REST offset over gftp, O(1)
                // ChecksumFileSystem (local) can't append; its raw fs can
                val afs = dfs match {
                  case c: org.apache.hadoop.fs.ChecksumFileSystem =>
                    c.getRawFileSystem
                  case f => f
                }
                val out = afs.append(dst)
                try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
                finally out.close()
              } finally in.close()
            } else {
              val in = sfs.open(new Path(t.src))
              try {
                val out = dfs.create(dst, true)
                try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
                finally out.close()
              } finally in.close()
            }
          }
        } finally { sfs.close(); dfs.close() }
      }
  }

  /** Small-file compaction — the table-maintenance pass a data lake
    * runs continuously: a directory of many small parquet files is
    * rewritten as ceil(totalBytes / targetBytes) right-sized files.
    * At 100 TB this is what keeps scans from dying of open-file
    * overhead (a 10⁶-file table at 100 KB/file costs 10⁶ S3 GETs and
    * 10⁶ footer parses per query; the same bytes in 128 MB files cost
    * ~800) and keeps each input split a full row group.
    *
    * Shape: output count from FS metadata (one driver listing of the
    * target dir only — no data read), then one distributed
    * read→repartition→write; `repartition` round-robins rows so the
    * output files are uniformly sized regardless of input skew.
    * Returns the output file count.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20): Int = {
    val f = fs(inDir, hadoopConf(spark))
    val totalBytes =
      try f.listStatus(new Path(inDir)).filter(_.isFile)
        .filter(!_.getPath.getName.startsWith("_")).map(_.getLen).sum
      catch {
        case _: java.io.FileNotFoundException =>
          throw GraftFsError(ErrorCodes.InvalidFilePath,
            s"source path does not exist: $inDir")
      }
      finally f.close()
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    nOut
  }

  /** Existence probe through any registered FS (driver-side, one
    * metadata call — the CLI twins' pre-check for single-file ops).
    */
  def exists(spark: SparkSession, uri: String, path: String): Boolean = {
    val f = fs(uri, hadoopConf(spark))
    try f.exists(new Path(path)) finally f.close()
  }

  /** True only for an existing REGULAR FILE — the pre-check for
    * single-file transfers, where a directory passing a bare exists()
    * probe would still fail downstream with a non-taxonomy error.
    */
  def isFile(spark: SparkSession, uri: String, path: String): Boolean = {
    val f = fs(uri, hadoopConf(spark))
    try f.getFileStatus(new Path(path)).isFile
    catch { case _: java.io.FileNotFoundException => false }
    finally f.close()
  }

  /** Single-file move (rename) — move_file.py:96; a failed rename is
    * the reference's exit-202 condition (move_file.py:102).
    */
  def move(spark: SparkSession, uri: String, src: String, dst: String): Boolean = {
    val f = fs(uri, hadoopConf(spark))
    try {
      val dstPath = new Path(dst)
      val parent = dstPath.getParent
      if (parent != null && !f.exists(parent)) f.mkdirs(parent)
      // some FileSystem impls signal a missing source by exception,
      // others by returning false — both are the reference's exit-202
      val renamed =
        try f.rename(new Path(src), dstPath)
        catch { case _: java.io.FileNotFoundException => false }
      if (!renamed)
        throw GraftFsError(ErrorCodes.MoveError,
          s"could not move $src -> $dst")
      true
    } finally f.close()
  }

  /** Bulk delete, distributed — delete_file.py:76. */
  def bulkDelete(spark: SparkSession, uri: String, paths: Seq[String],
      parallelism: Int = 32): Unit = {
    if (paths.isEmpty) return
    val conf = new SerializableConfiguration(hadoopConf(spark))
    spark.sparkContext.parallelize(paths, math.min(paths.size, parallelism))
      .foreachPartition { it: Iterator[String] =>
        val f = FileSystem.newInstance(new URI(uri), conf.value)
        f.setWriteChecksum(false); f.setVerifyChecksum(false)
        try it.foreach(p => f.delete(new Path(p), false))
        finally f.close()
      }
  }

  /** q60: file manifest of a scale-factor directory, paths relativized
    * for determinism. Rows-only (no portable SQL oracle for fs walks).
    */
  def q60(spark: SparkSession, dir: String): DataFrame =
    listRecursive(spark, s"file:$dir")
      .withColumn("path", regexp_replace(col("path"), lit(s"^$dir/?"), lit("")))
      .filter(col("path") =!= "")
      .orderBy(col("path"))
}

/** Minimal serializable wrapper for a Hadoop Configuration (the
  * standard Spark trick — Configuration itself is not Serializable).
  */
class SerializableConfiguration(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
