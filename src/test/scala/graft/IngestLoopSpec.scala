package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.{Curation, Search}

/** The composed NIGHTLY INGEST LOOP — the end-to-end proof that the
  * streaming surface and the incremental-maintenance family wire
  * together: one live document stream drives, per micro-batch, BOTH
  * standing artifacts this engine maintains incrementally —
  * `appendBmIndex` (retrieval) and `lineDedupIncrement` (curation) —
  * and after the stream drains, each artifact equals a full recompute
  * over the union corpus. Every piece is individually spec'd
  * elsewhere (SearchSpec, CurationSpec, StreamingSpec); this spec
  * pins the COMPOSITION: a foreachBatch sink is a legal driver for
  * the batch-contract maintenance APIs, batch boundaries and the
  * single-writer/new-docs-only contracts hold across micro-batches,
  * and no ordering between the two maintenance paths matters.
  */
class IngestLoopSpec extends SparkSpec {

  private def hits(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    .toSeq

  private def verdictMap(df: DataFrame) = df.collect()
    .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
    .toMap

  test("nightly ingest loop: one stream appends the BM25 index and folds line-dedup state; both equal full recomputes") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    // standing corpus = the nightly bootstrap; two disjoint "days"
    // arrive through the stream (new-docs-only by construction)
    val standing = docs.filter(col("doc_id") % 5 > 1)
    val day1 = docs.filter(col("doc_id") % 5 === 0)
    val day2 = docs.filter(col("doc_id") % 5 === 1)
    assert(day1.count() > 0 && day2.count() > 0)

    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ingest_loop").toString
    standing.write.parquet(s"$tmp/documents.parquet")
    val idx = s"$tmp/bmidx"
    Search.buildBmIndex(spark, tmp, idx)
    var state = Curation.lineDedupState(standing)
    var batches = 0

    // the ingest drop directory: each day's parquet lands as one file
    // → one micro-batch (public file-source API, the production shape)
    val dropDir = s"$tmp/arrivals"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dropDir))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val q = spark.readStream.schema(schema).parquet(dropDir)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        if (!df.isEmpty) {
          // seal the micro-batch once; both maintenance paths consume
          // the same sealed relation
          val batch = df.localCheckpoint()
          Search.appendBmIndex(spark, idx, batch)
          val (ns, _) = Curation.lineDedupIncrement(state, batch)
          state = ns
          batches += 1
        }
      }
      .start()
    try {
      day1.coalesce(1).write.mode("append").parquet(dropDir)
      q.processAllAvailable()
      day2.coalesce(1).write.mode("append").parquet(dropDir)
      q.processAllAvailable()
    } finally q.stop()
    assert(batches >= 2, s"expected the two days as separate batches, got $batches")

    // retrieval artifact: searching the accreted on-disk index equals
    // the in-flight scorer over the full union corpus, bit-for-bit
    assert(hits(Search.searchBmIndex(spark, idx))
      === hits(Search.bm25On(docs, Search.SearchQueries)))
    // and the folded stats row equals a from-scratch recount
    val stats = spark.read.parquet(s"$idx/_stats").collect().head
    val base = docs.agg(count(lit(1)),
      sum(size(expr("regexp_extract_all(text, '\\\\S+', 0)")))).collect().head
    assert(stats.getLong(0) === base.getLong(0))
    assert(stats.getLong(1) === base.getLong(1))

    // curation artifact: the incrementally-folded line-dedup state
    // renders exactly the full-pass verdicts over the union corpus
    assert(verdictMap(Curation.lineVerdictsFrom(docs, state.segments))
      === verdictMap(Curation.lineDedupOn(docs)))
  }

  test("crash-retry twin: replaying a batch epoch leaves every artifact byte-identical") {
    // foreachBatch is at-least-once — after a sink crash the SAME
    // (batchId, df) re-invokes. Each standing artifact guards with
    // the epoch it recorded at commit: the on-disk index via _stats,
    // the snapshot store via its manifest, driver-held state via
    // Epoched. The retry must change NOTHING — not a file length, not
    // an mtime — and the artifacts must still equal full recomputes.
    import graft.sources.Snapshots
    import graft.streaming.Epoched
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val standing = docs.filter(col("doc_id") % 5 > 0)
    val day1 = docs.filter(col("doc_id") % 5 === 0).localCheckpoint()
    assert(day1.count() > 0)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_retry_loop").toString
    standing.write.parquet(s"$tmp/documents.parquet")
    val idx = s"$tmp/bmidx"
    val snap = s"$tmp/snap"
    Search.buildBmIndex(spark, tmp, idx)
    var st = Epoched(Curation.lineDedupState(standing))
    def applyBatch(): Unit = {
      Search.appendBmIndex(spark, idx, day1, epochId = Some(7L))
      Snapshots.commitAppend(spark, snap, day1, Seq("doc_id"),
        epochId = Some(7L))
      st = st.fold(7L) { s => Curation.lineDedupIncrement(s, day1)._1 }
    }
    applyBatch()

    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long, Long)] =
      fs.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else Seq((s.getPath.toString, s.getLen, s.getModificationTime))
      }
    val artifactsBefore =
      walk(new org.apache.hadoop.fs.Path(idx)) ++
        walk(new org.apache.hadoop.fs.Path(snap))
    val stBefore = st

    applyBatch() // the crash retry

    assert(walk(new org.apache.hadoop.fs.Path(idx)) ++
      walk(new org.apache.hadoop.fs.Path(snap)) === artifactsBefore,
      "replaying the epoch changed an on-disk artifact")
    assert(st eq stBefore, "replaying the epoch re-folded driver state")
    assert(Snapshots.latestVersion(spark, snap) === 1L)
    // unchanged AND correct: each artifact equals its full recompute
    assert(hits(Search.searchBmIndex(spark, idx))
      === hits(Search.bm25On(docs, Search.SearchQueries)))
    assert(verdictMap(Curation.lineVerdictsFrom(docs, st.state.segments))
      === verdictMap(Curation.lineDedupOn(docs)))
  }

  private def spanSet(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    .toSet

  test("forget loop: one deletion request erases a doc set from all five standing artifacts; each equals a survivor recompute") {
    import graft.operators.Rag
    import graft.sources.Snapshots
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_forget_loop").toString
    // nightly bootstrap of every standing artifact over the full corpus
    docs.write.parquet(s"$tmp/documents.parquet")
    val bmIdx = s"$tmp/bmidx"
    val ragIdx = s"$tmp/ragidx"
    val store = s"$tmp/store"
    Search.buildBmIndex(spark, tmp, bmIdx)
    Rag.buildRagIndex(spark, tmp, ragIdx)
    // fifth artifact (round 12 — the r11 verdict's composition gap):
    // the versioned snapshot store holding the corpus itself
    Snapshots.commitAppend(spark, store, docs)
    val lineState = Curation.lineDedupState(docs)
    val cutState = Curation.cutSpanState(docs)

    // THE deletion request: content-bearing (the erased records), as
    // a GDPR request is in practice — the indexes validate against
    // it, the curation states need only its ids
    val request = docs.filter(col("doc_id") % 11 === 3)
    val requestIds = request.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(requestIds.nonEmpty)
    val survivors = docs.filter(!col("doc_id").isInCollection(requestIds))

    Search.deleteFromBmIndex(spark, bmIdx, request)
    Rag.deleteFromRagIndex(spark, ragIdx, request)
    val (lineAfter, _) = Curation.lineDedupDecrement(
      lineState, request.select(col("doc_id")))
    val (cutAfter, _, _) = Curation.cutSpanDecrement(
      cutState, request.select(col("doc_id")))
    // the store arm: the SAME one request drives a COW delete commit
    Snapshots.commitDelete(spark, store,
      col("doc_id").isInCollection(requestIds))

    // every artifact now equals its survivor recompute
    assert(Search.searchBmIndex(spark, bmIdx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
      === Search.bm25On(survivors, Search.SearchQueries).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq)
    val ragGot = Rag.probeRagIndex(spark, ragIdx,
      nprobeOverride = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(!ragGot.exists(h => requestIds.contains(h._3)),
      "a forgotten doc still surfaces in dense retrieval")
    assert(spark.read.parquet(ragIdx)
      .filter(col("doc_id").isInCollection(requestIds)).count() === 0L,
      "forgotten chunks remain on disk in the dense index")
    assert(verdictMap(Curation.lineVerdictsFrom(
      survivors, lineAfter.segments))
      === verdictMap(Curation.lineDedupOn(survivors)))
    assert(spanSet(Curation.spansFromFlags(cutAfter.grams))
      === spanSet(Curation.cutSpansOn(survivors)))
    // and nothing about the forgotten ids lingers in either state
    assert(lineAfter.segments
      .filter(col("doc_id").isInCollection(requestIds)).count() === 0L)
    assert(cutAfter.grams
      .filter(col("doc_id").isInCollection(requestIds)).count() === 0L)
    // the store's live version equals the survivor corpus bit-for-bit
    // (COW delete: untouched batches carry over, hit batches rewrite
    // survivors only)
    val storeRows = Snapshots.read(spark, store)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val survivorRows = survivors
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(storeRows === survivorRows,
      "store live version differs from the survivor recompute")
    assert(Snapshots.read(spark, store)
      .filter(col("doc_id").isInCollection(requestIds)).count() === 0L)
    // GDPR means the BYTES are gone, not just filtered: no live data
    // file under the store may contain a forgotten doc_id (only
    // manifest-referenced batches remain after the COW rewrite plus
    // expire of the pre-delete version)
    Snapshots.expire(spark, store, Snapshots.latestVersion(spark, store))
    val liveFiles = spark.read.parquet(s"$store/data/*")
    assert(liveFiles.filter(col("doc_id").isInCollection(requestIds))
      .count() === 0L,
      "forgotten rows remain in on-disk store batches after expire")
  }

  test("Epoched persistence: a killed driver resumes from checkpoint + store replay, never re-scanning the corpus") {
    // the round-10 gap: Epoched state died with the driver, so a
    // restart rebuilt it from the standing corpus (O(corpus)). Now:
    // checkpoint the state relations every K epochs (EpochedState),
    // and on restart re-fold the snapshot store's epoch-tagged batches
    // since the checkpoint (appendsSince) — O(state + recent batches).
    // The corpus-never-re-scanned claim is enforced physically: the
    // standing corpus file is DELETED at the kill, so any resume path
    // that touches it throws.
    import graft.sources.Snapshots
    import graft.streaming.{Epoched, EpochedState}
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val standing = docs.filter(col("doc_id") % 5 > 2)
    val days = (0 to 2).map(d =>
      docs.filter(col("doc_id") % 5 === d).localCheckpoint())
    days.foreach(d => assert(d.count() > 0))
    val unionDocs = (standing +: days).reduce(_ unionByName _)
      .localCheckpoint()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_epoched_ck").toString
    val store = s"$tmp/store"
    val ck = s"$tmp/ck"
    val standingFile = s"$tmp/standing.parquet"
    standing.write.parquet(standingFile)

    // ---- run 1: bootstrap FROM THE FILE, fold epochs 0 and 1,
    // checkpoint only epoch 0 (K = 2), then "crash" before epoch 2
    var st = Epoched(
      Curation.lineDedupState(spark.read.parquet(standingFile)))
    def applyEpoch(e: Long, batch: DataFrame): Unit = {
      st = st.fold(e)(s => Curation.lineDedupIncrement(s, batch)._1)
      Snapshots.commitAppend(spark, store, batch, Seq("doc_id"),
        epochId = Some(e))
    }
    applyEpoch(0L, days(0))
    EpochedState.save(spark, ck, 0L, Map(
      "segments" -> st.state.segments, "counts" -> st.state.counts))
    // a replayed save of the same epoch must be a byte-level no-op
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long, Long)] =
      fs.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else Seq((s.getPath.toString, s.getLen, s.getModificationTime))
      }
    val ckBefore = walk(new org.apache.hadoop.fs.Path(ck))
    EpochedState.save(spark, ck, 0L, Map(
      "segments" -> st.state.segments, "counts" -> st.state.counts))
    assert(walk(new org.apache.hadoop.fs.Path(ck)) === ckBefore,
      "re-saving a checkpointed epoch rewrote files")
    applyEpoch(1L, days(1))

    // ---- the kill: driver state gone, standing corpus file gone
    fs.delete(new org.apache.hadoop.fs.Path(standingFile), true)

    // ---- restart: load the newest checkpoint, re-fold the store's
    // batches since it, then take the stream's replay of epoch 2
    val (ckEpoch, parts) = EpochedState.loadLatest(spark, ck).get
    assert(ckEpoch === 0L)
    var st2 = Epoched(
      Curation.LineDedupState(parts("segments"), parts("counts")), ckEpoch)
    val replay = Snapshots.appendsSince(spark, store, ckEpoch)
    assert(replay.map(_._1) === Seq(1L), "replay source wrong epochs")
    replay.foreach { case (e, batch) =>
      st2 = st2.fold(e)(s =>
        Curation.lineDedupIncrement(s, batch.localCheckpoint())._1)
    }
    // the stream itself re-delivers only its unacknowledged epoch
    applyEpochOn(st2, 2L, days(2), store) match { case s => st2 = s }

    // resumed state renders EXACTLY the full recompute over the union
    assert(verdictMap(Curation.lineVerdictsFrom(unionDocs,
        st2.state.segments))
      === verdictMap(Curation.lineDedupOn(unionDocs)))
    // and a retry of epoch 2 is a pure no-op on the resumed state
    val st3 = st2.fold(2L)(s =>
      Curation.lineDedupIncrement(s, days(2))._1)
    assert(st3 eq st2)
    // prune keeps the newest checkpoint and sweeps tmp garbage
    EpochedState.save(spark, ck, 2L, Map(
      "segments" -> st2.state.segments, "counts" -> st2.state.counts))
    EpochedState.prune(spark, ck, keepLast = 1)
    assert(EpochedState.epochs(spark, ck) === Seq(2L))
  }

  test("EpochedState delta checkpoints: batch-sized saves resolve to the full state; compaction folds the chain") {
    // the round-11 §7f cost gap: `save` wrote the WHOLE state every
    // checkpoint — O(state) parquet per epoch for a batch-sized
    // change. Delta checkpoints persist only the keyed increment
    // (changed/new rows + tombstones); a restart resolves newest base
    // + deltas, and compaction folds the chain back into one base.
    import graft.streaming.EpochedState
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val standing = docs.filter(col("doc_id") % 5 > 2)
    val days = (0 to 2).map(d =>
      docs.filter(col("doc_id") % 5 === d).localCheckpoint())
    val unionDocs = (standing +: days).reduce(_ unionByName _)
      .localCheckpoint()
    val keys = Map("segments" -> Seq("doc_id", "line_id"),
      "counts" -> Seq("line"))
    def partsOf(s: Curation.LineDedupState) = Map(
      "segments" -> s.segments.localCheckpoint(),
      "counts" -> s.counts.localCheckpoint())
    val ck = java.nio.file.Files
      .createTempDirectory("graft_delta_ck").toString
    val fs = new org.apache.hadoop.fs.Path(ck)
      .getFileSystem(spark.sessionState.newHadoopConf())

    // bootstrap: full base at epoch 0 (standing corpus + day 0)
    var state = partsOf(Curation.lineDedupIncrement(
      Curation.lineDedupState(standing), days(0))._1)
    EpochedState.save(spark, ck, 0L, state)
    val baseSegRows = state("segments").count()

    // epochs 1..2: fold, persist only the keyed diff
    (1 to 2).foreach { e =>
      val next = partsOf(Curation.lineDedupIncrement(
        Curation.LineDedupState(state("segments"), state("counts")),
        days(e))._1)
      val diffs = keys.map { case (n, k) =>
        val (up, del) = EpochedState.diff(state(n), next(n), k)
        n -> (up.localCheckpoint(), del.localCheckpoint())
      }
      EpochedState.saveDelta(spark, ck, e.toLong,
        diffs.map { case (n, (up, _)) => n -> up },
        diffs.map { case (n, (_, del)) => n -> del })
      state = next
    }
    assert(EpochedState.epochs(spark, ck) === Seq(0L))
    assert(EpochedState.deltaEpochs(spark, ck) === Seq(1L, 2L))
    assert(EpochedState.latestEpoch(spark, ck) === Some(2L))
    // the delta IS batch-sized: each epoch's segment upserts are far
    // smaller than the standing segment relation
    (1 to 2).foreach { e =>
      val upRows = spark.read.parquet(s"$ck/$e.d/segments/up").count()
      assert(upRows > 0 && upRows < baseSegRows / 2,
        s"epoch $e delta not batch-sized: $upRows vs base $baseSegRows")
    }

    def resolvedRender() = {
      val (at, parts) = EpochedState.loadResolved(spark, ck, keys).get
      (at, verdictMap(Curation.lineVerdictsFrom(unionDocs,
        parts("segments"))))
    }
    val fullRender = verdictMap(Curation.lineDedupOn(unionDocs))
    // resolution = base + deltas == the in-memory state == full recompute
    assert(resolvedRender() === ((2L, fullRender)))
    assert(verdictMap(Curation.lineVerdictsFrom(unionDocs,
      state("segments"))) === fullRender)

    // a replayed delta save is a byte-level no-op
    def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long, Long)] =
      fs.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else Seq((s.getPath.toString, s.getLen, s.getModificationTime))
      }
    val before = walk(new org.apache.hadoop.fs.Path(ck))
    EpochedState.saveDelta(spark, ck, 2L,
      keys.map { case (n, _) => n -> state(n) },
      keys.map { case (n, k) =>
        n -> state(n).select(k.map(col): _*).limit(0) })
    assert(walk(new org.apache.hadoop.fs.Path(ck)) === before,
      "replayed delta save rewrote files")

    // a crashed in-flight save is invisible and swept by prune
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$ck/_tmp_9.d"))
    assert(resolvedRender() === ((2L, fullRender)))

    // a compact that crashed between its base write and the delta
    // sweep leaves base 2 + deltas ≤ 2 — still resolving identically
    EpochedState.save(spark, ck, 2L,
      EpochedState.loadResolved(spark, ck, keys).get._2
        .map { case (n, df) => n -> df.localCheckpoint() })
    assert(EpochedState.epochs(spark, ck) === Seq(0L, 2L))
    assert(EpochedState.deltaEpochs(spark, ck) === Seq(1L, 2L))
    assert(resolvedRender() === ((2L, fullRender)))

    // the re-run compact consumes the chain; prune keeps the newest
    EpochedState.compact(spark, ck, keys)
    assert(EpochedState.deltaEpochs(spark, ck) === Seq.empty)
    assert(resolvedRender() === ((2L, fullRender)))
    EpochedState.prune(spark, ck, keepLast = 1)
    assert(EpochedState.epochs(spark, ck) === Seq(2L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ck/_tmp_9.d")),
      "prune did not sweep the crashed tmp")
    assert(resolvedRender() === ((2L, fullRender)))
  }

  private def applyEpochOn(st: graft.streaming.Epoched[Curation.LineDedupState],
      e: Long, batch: DataFrame, store: String)
      : graft.streaming.Epoched[Curation.LineDedupState] = {
    val out = st.fold(e)(s => Curation.lineDedupIncrement(s, batch)._1)
    graft.sources.Snapshots.commitAppend(spark, store, batch, Seq("doc_id"),
      epochId = Some(e))
    out
  }
}
