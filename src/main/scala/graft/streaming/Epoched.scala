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

  /** Reclaim old checkpoints, keeping the newest `keepLast`, plus any
    * delta dirs older than the oldest kept base (they can never be
    * replayed — resolution starts from a base).
    */
  def prune(spark: SparkSession, root: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least the newest checkpoint")
    val fs = fsOf(spark, root)
    val kept = epochs(spark, root)
    kept.dropRight(keepLast)
      .foreach(e => fs.delete(new Path(s"$root/$e"), true))
    kept.takeRight(keepLast).headOption.foreach { oldestKept =>
      deltaEpochs(spark, root).filter(_ <= oldestKept)
        .foreach(e => fs.delete(new Path(s"$root/$e.d"), true))
    }
    // sweep crashed in-flight saves
    val d = new Path(root)
    if (fs.exists(d))
      fs.listStatus(d).toSeq
        .filter(_.getPath.getName.startsWith("_tmp_"))
        .foreach(s => fs.delete(s.getPath, true))
  }

  // ── Delta checkpoints (round 11 — the §7f full-copy cost) ─────────
  //
  // `save` persists the WHOLE state every checkpoint: O(state) parquet
  // per epoch even when the epoch touched a batch-sized fraction of
  // it. The delta form applies the snapshot store's own discipline to
  // state: persist per-epoch keyed INCREMENTS (changed/new rows plus
  // tombstoned keys) under `root/<epoch>.d/<name>/{up,del}`, resolve a
  // restart as newest-base-plus-deltas, and COMPACT periodically so
  // the replay chain stays short. Steady-state checkpoint cost is then
  // batch-sized; compaction amortizes the O(state) write over many
  // epochs. Keys must uniquely identify a row of their relation (the
  // remaining columns are the payload a new version replaces) — e.g.
  // LineDedupState: segments by (doc_id, line_id), counts by line.

  /** Keyed diff `old → neu`: `(upserts, deleteKeys)` — the rows of
    * `neu` absent from `old` (new keys AND keys whose payload
    * changed), and the keys of `old` absent from `neu`. Applying
    * these with [[loadResolved]]'s replace-by-key rule reconstructs
    * `neu` exactly. Incremental folds that already KNOW their touched
    * rows (a batch's own lines) can build the delta directly and skip
    * the diff's two anti-joins.
    */
  def diff(old: DataFrame, neu: DataFrame,
      key: Seq[String]): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val keyCols = key.map(col)
    (neu.exceptAll(old),
      old.select(keyCols: _*).except(neu.select(keyCols: _*)))
  }

  /** Persist one epoch's DELTA atomically (tmp+rename, whole-or-
    * nothing); a no-op if that epoch's delta is already checkpointed
    * (replay-idempotent). Every relation of the state must be present
    * in both maps (empty DataFrames are fine and cheap) so resolution
    * never guesses which parts an epoch touched.
    */
  def saveDelta(spark: SparkSession, root: String, epoch: Long,
      upserts: Map[String, DataFrame],
      deleteKeys: Map[String, DataFrame]): Unit = {
    require(upserts.nonEmpty, "nothing to checkpoint")
    require(upserts.keySet == deleteKeys.keySet,
      s"upserts/deleteKeys name mismatch: ${upserts.keySet} vs " +
        s"${deleteKeys.keySet}")
    val fs = fsOf(spark, root)
    val dst = new Path(s"$root/$epoch.d")
    if (fs.exists(dst)) return
    val tmp = new Path(s"$root/_tmp_$epoch.d")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    upserts.foreach { case (name, df) =>
      df.write.parquet(s"$tmp/$name/up")
      deleteKeys(name).write.parquet(s"$tmp/$name/del")
    }
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(
        s"delta checkpoint rename failed for epoch $epoch")
  }

  /** Delta epochs checkpointed, ascending (completed saves only). */
  def deltaEpochs(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val d = new Path(root)
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(n => n.matches("-?\\d+\\.d"))
      .map(_.stripSuffix(".d").toLong).sorted
  }

  /** The newest checkpointed epoch of either kind — the restart
    * protocol's `appendsSince` cursor.
    */
  def latestEpoch(spark: SparkSession, root: String): Option[Long] =
    (epochs(spark, root) ++ deltaEpochs(spark, root))
      .sorted.lastOption

  /** Resolve the newest state: the newest FULL checkpoint plus every
    * later delta applied ascending — per relation, a delta REPLACES
    * the rows whose key it names (upsert keys and tombstones) and
    * unions its upsert rows in. Returns `(epoch, parts)` where epoch
    * is the last applied delta (or the base when none). None when no
    * full checkpoint exists — a delta chain needs a base under it; a
    * cold start bootstraps with [[save]] once.
    *
    * The result is a lazy plan of one anti-join per (delta, relation):
    * fine for the ≤ K deltas a compaction cadence leaves, which is
    * why [[compact]] exists — call it when the chain grows past K.
    *
    * READ-PIN (round 12): the delta rows are PINNED at resolve time
    * (eager `localCheckpoint` — deltas are batch-sized by contract,
    * so the pin is O(recent batches), never O(state)), so a lazy
    * resolved plan collected AFTER a concurrent [[compact]] deleted
    * the consumed delta dirs still reads the pinned rows — the plan
    * never touches the vanished files. The BASE dir is safe without
    * pinning: compact only writes a new base and deletes deltas;
    * bases are reclaimed by [[prune]] alone, which the caller
    * sequences. A delta naming a relation the base LACKS (a state
    * grown a new relation after bootstrap) fails loudly instead of
    * being silently dropped — re-bootstrap with [[save]] first.
    */
  def loadResolved(spark: SparkSession, root: String,
      keys: Map[String, Seq[String]]): Option[(Long, Map[String, DataFrame])] = {
    import org.apache.spark.sql.functions.col
    val fs = fsOf(spark, root)
    epochs(spark, root).lastOption.map { base =>
      var parts = load(spark, root, base)
      var at = base
      deltaEpochs(spark, root).filter(_ > base).foreach { e =>
        at = e
        val deltaNames = fs.listStatus(new Path(s"$root/$e.d")).toSeq
          .filter(_.isDirectory).map(_.getPath.getName).toSet
        val unknown = deltaNames -- parts.keySet
        if (unknown.nonEmpty) throw new IllegalStateException(
          s"delta epoch $e names relations absent from base $base: " +
            s"${unknown.toSeq.sorted.mkString(", ")} — a relation " +
            "added after bootstrap must be folded into a new FULL " +
            "checkpoint (save) before deltas reference it")
        parts = parts.map { case (name, standing) =>
          val key = keys.getOrElse(name, sys.error(
            s"no key declared for relation '$name'"))
          val keyCols = key.map(col)
          val up = spark.read.parquet(s"$root/$e.d/$name/up")
            .localCheckpoint(true)
          val del = spark.read.parquet(s"$root/$e.d/$name/del")
            .localCheckpoint(true)
          val touched = up.select(keyCols: _*)
            .union(del.select(keyCols: _*)).distinct()
          name -> standing.join(touched, key, "left_anti")
            .unionByName(up)
        }
      }
      (at, parts)
    }
  }

  /** Fold the current delta chain into a new FULL checkpoint at the
    * newest epoch and drop the consumed deltas. Crash-safe in the
    * store's style: the base lands atomically first ([[save]]), the
    * delta deletes follow — a crash between leaves deltas ≤ the new
    * base, which [[loadResolved]] ignores and a re-run sweeps.
    */
  def compact(spark: SparkSession, root: String,
      keys: Map[String, Seq[String]]): Unit = {
    val fs = fsOf(spark, root)
    loadResolved(spark, root, keys).foreach { case (epoch, parts) =>
      save(spark, root, epoch, parts)
      deltaEpochs(spark, root).filter(_ <= epoch)
        .foreach(e => fs.delete(new Path(s"$root/$e.d"), true))
    }
  }
}
