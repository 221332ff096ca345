package graft.streaming

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
  * Scope: retries WITHIN one run (state dies with the driver; a
  * restarted driver rebuilds it from the standing corpus, which
  * re-derives every fold deterministically).
  */
case class Epoched[S](state: S, lastEpoch: Long = -1L) {
  /** Apply `step` once per distinct epoch: a replayed epoch returns
    * `this` untouched.
    */
  def fold(epochId: Long)(step: S => S): Epoched[S] =
    if (epochId == lastEpoch) this else Epoched(step(state), epochId)
}
