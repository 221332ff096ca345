package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once harness for IN-MEMORY incremental state driven from a
  * foreachBatch sink (the [[graft.operators.Curation]] increment /
  * decrement family: `lineDedupIncrement`, `cutSpanIncrement`, …).
  *
  * Structured Streaming's foreachBatch is at-least-once: after a sink
  * failure or restart it re-invokes the SAME (batchId, df). On-disk
  * artifacts guard with their persisted epoch (Snapshots manifests,
  * the bm_index `_stats` row); a driver-held state var has no disk to
  * consult, so the guard lives next to the state: fold a batch only
  * if its epoch is new, otherwise return this state unchanged — the
  * retry is a pure no-op and the state equals the once-applied fold,
  * which is exactly the exactly-once contract.
  *
  * {{{
  * var st = Epoched(Curation.lineDedupState(standing))
  * stream.writeStream.foreachBatch { (df: DataFrame, epoch: Long) =>
  *   st = st.fold(epoch) { s => Curation.lineDedupIncrement(s, df)._1 }
  * }
  * }}}
  *
  * Scope: retries WITHIN one run. Across driver restarts, pair the
  * fold with [[EpochedState]]: checkpoint the state's relations every
  * K epochs, and on restart resume from the last checkpoint plus a
  * re-fold of the snapshot store's epoch-tagged batches since it
  * ([[graft.sources.Snapshots.appendsSince]]) — O(state + recent
  * batches), with the standing corpus never re-scanned.
  */
case class Epoched[S](state: S, lastEpoch: Long = -1L) {
  /** Apply `step` once per distinct epoch: a replayed epoch returns
    * `this` untouched.
    */
  def fold(epochId: Long)(step: S => S): Epoched[S] =
    if (epochId == lastEpoch) this else Epoched(step(state), epochId)
}

/** Disk checkpoints for driver-held [[Epoched]] state — the round-10
  * gap (§7e): the incremental line-dedup / cut-span state lived only
  * in the driver, so a restart rebuilt it from the standing corpus,
  * O(corpus) instead of O(state).
  *
  * A state is persisted as a map of named relations (the two
  * DataFrames of `LineDedupState` / `CutSpanState`) under
  * `root/<epoch>/<name>/…parquet`, written to a hidden `_tmp_<epoch>`
  * dir first and RENAMED — the manifest discipline of
  * [[graft.sources.Snapshots]], so a checkpoint exists wholly or not
  * at all and a crash mid-save is invisible. Saving an epoch that is
  * already checkpointed is a no-op (replay-idempotent).
  *
  * The restart protocol (spec-asserted in IngestLoopSpec):
  * {{{
  * // per epoch, in foreachBatch (store commit is the ingest loop's):
  * st = st.fold(epoch) { s => Curation.lineDedupIncrement(s, df)._1 }
  * if (epoch % k == 0)
  *   EpochedState.save(spark, ck, epoch, Map(
  *     "segments" -> st.state.segments, "counts" -> st.state.counts))
  * // on restart:
  * val (c, parts) = EpochedState.loadLatest(spark, ck).get
  * var st = Epoched(LineDedupState(parts("segments"), parts("counts")), c)
  * Snapshots.appendsSince(spark, store, c).foreach { case (e, batch) =>
  *   st = st.fold(e) { s => Curation.lineDedupIncrement(s, batch)._1 }
  * }
  * }}}
  * Checkpointing every epoch makes restart pure load; every K epochs
  * amortizes the O(state) write and re-folds ≤ K batch-sized deltas —
  * either way the standing corpus is never re-scanned. The batches
  * between checkpoint and crash come from the snapshot store the
  * ingest loop already commits to (epoch-tagged), NOT from the
  * stream, which only replays its final unacknowledged epoch.
  */
object EpochedState {

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Persist one epoch's state atomically; a no-op if that epoch is
    * already checkpointed.
    */
  def save(spark: SparkSession, root: String, epoch: Long,
      parts: Map[String, DataFrame]): Unit = {
    require(parts.nonEmpty, "nothing to checkpoint")
    val fs = fsOf(spark, root)
    val dst = new Path(s"$root/$epoch")
    if (fs.exists(dst)) return
    val tmp = new Path(s"$root/_tmp_$epoch")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    parts.foreach { case (name, df) =>
      df.write.parquet(s"$tmp/$name")
    }
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(
        s"checkpoint rename failed for epoch $epoch")
  }

  /** Epochs checkpointed, ascending (completed saves only). */
  def epochs(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val d = new Path(root)
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(n => n.matches("-?\\d+")).map(_.toLong).sorted
  }

  /** The relations of one checkpointed epoch, keyed by part name. */
  def load(spark: SparkSession, root: String,
      epoch: Long): Map[String, DataFrame] = {
    val fs = fsOf(spark, root)
    val d = new Path(s"$root/$epoch")
    require(fs.exists(d), s"no checkpoint for epoch $epoch under $root")
    fs.listStatus(d).toSeq.filter(_.isDirectory)
      .map(s => s.getPath.getName ->
        spark.read.parquet(s.getPath.toString)).toMap
  }

  /** The newest checkpoint, or None when nothing was ever saved (a
    * cold start — bootstrap from the corpus once).
    */
  def loadLatest(spark: SparkSession,
      root: String): Option[(Long, Map[String, DataFrame])] =
    epochs(spark, root).lastOption.map(e => (e, load(spark, root, e)))

  /** Reclaim old checkpoints, keeping the newest `keepLast`. */
  def prune(spark: SparkSession, root: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least the newest checkpoint")
    val fs = fsOf(spark, root)
    epochs(spark, root).dropRight(keepLast)
      .foreach(e => fs.delete(new Path(s"$root/$e"), true))
    // sweep crashed in-flight saves
    val d = new Path(root)
    if (fs.exists(d))
      fs.listStatus(d).toSeq
        .filter(_.getPath.getName.startsWith("_tmp_"))
        .foreach(s => fs.delete(s.getPath, true))
  }
}
