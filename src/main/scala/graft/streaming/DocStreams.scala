package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.operators.{Bpe, Curation, Dedup, Perplexity, Rag, Search}

/** Structured Streaming twins of the document-curation operators — the
  * shapes an ingest pipeline runs on documents as they ARRIVE, against
  * artifacts a nightly batch job published from the standing corpus.
  */
object DocStreams {

  /** Streaming source over a documents-shaped parquet glob; the schema
    * is pinned from a batch peek (streaming sources cannot infer).
    */
  def source(spark: SparkSession, schemaPath: String,
      glob: String): DataFrame = {
    val schema = spark.read.parquet(schemaPath).schema
    spark.readStream.schema(schema).parquet(glob)
  }

  /** Streaming duplicate-span coverage — the LIVE twin of
    * [[Curation.q72]] (§7b): each arriving document is scored for the
    * fraction of its word 5-gram positions already present in the
    * STANDING corpus, against a broadcast Bloom sketch of the corpus
    * grams ([[Curation.corpusGramBloom]], the nightly-batch artifact).
    *
    * Scale shape: the sketch is fixed-size at any corpus size and
    * rides the closure (broadcast-by-serialization, like q98's merge
    * table) — the stream side is MAP-ONLY: no join, no shuffle, no
    * state; per-doc work is linear in its grams. Two semantic deltas
    * vs batch q72, both inherent to the live setting: coverage is
    * against the corpus (df ≥ 1 — "does this span already exist
    * anywhere"), not the corpus-internal df ≥ 2; and the Bloom errs
    * only positive (overcount ≤ fpp in expectation, never a miss).
    */
  def dupSpanOn(spark: SparkSession, src: DataFrame,
      bloom: BloomFilter, flagAt: Double = 0.5): DataFrame = {
    import spark.implicits._
    src.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val gs = Curation.spanGramsOf(text)
          var dup = 0L
          var i = 0
          while (i < gs.length) {
            if (bloom.mightContainString(gs(i))) dup += 1
            i += 1
          }
          val m = gs.length.toLong
          (id, m, dup,
            if (m == 0) 0.0 else dup.toDouble / m)
        }
      }
      .toDF("doc_id", "n_grams", "dup_grams", "dup_frac")
      .withColumn("flagged", col("dup_frac") > flagAt)
  }

  /** Streaming exact-substring CUT SPANS — the LIVE twin of
    * [[Curation.q100]] / [[Curation.cutSpansOn]]: each arriving
    * document emits its duplicated-token intervals [start_pos,
    * end_pos] (positions, not just a coverage score) against the
    * STANDING corpus's gram Bloom ([[Curation.corpusGramBloom]], the
    * same nightly artifact [[dupSpanOn]] uses) — the ingest-time form
    * of the Lee '21 cut step: decide what to strip from a doc BEFORE
    * admitting it, without touching the corpus.
    *
    * Scale shape: map-only, no join, no shuffle, NO state — the
    * sketch rides the closure and per-doc work is linear in grams
    * (island merge is a single left-to-right sweep over window
    * starts). Same one-sided semantics as every Bloom twin: a
    * present-gram test errs only positive (spurious/overlong spans ≤
    * fpp in expectation, never a missed span), and membership is
    * corpus-presence (df ≥ 1), not the batch operator's corpus-
    * internal ≥ 2 occurrences — both deltas inherent to the live
    * setting and documented, not hidden.
    */
  def cutSpanOn(spark: SparkSession, src: DataFrame, bloom: BloomFilter,
      minLen: Int = Curation.CutMinTokens): DataFrame = {
    import spark.implicits._
    src.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val gs = Curation.spanGramsOf(text)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long)]
        // islands of consecutive duplicated window starts (1-based),
        // emitted when token length >= minLen — the same merge rule
        // as the batch gaps-and-islands, computed in one sweep
        var start = -1L
        var last = -1L
        def close(): Unit = if (start > 0) {
          val end = last + Curation.SpanN - 1
          val len = end - start + 1
          if (len >= minLen) out += ((id, start, end, len))
        }
        var i = 0
        while (i < gs.length) {
          if (bloom.mightContainString(gs(i))) {
            val pos = i + 1L
            if (start < 0) { start = pos; last = pos }
            else if (pos == last + 1) last = pos
            else { close(); start = pos; last = pos }
          }
          i += 1
        }
        close()
        out.iterator
      }
      .toDF("doc_id", "start_pos", "end_pos", "span_tokens")
  }

  /** Streaming MinHash near-dup screen — the LIVE twin of
    * [[graft.operators.Dedup.q32]] (ingest-time continuation of the
    * §7b streaming set): each arriving document's LSH band keys are
    * checked against a broadcast Bloom sketch of the STANDING corpus's
    * band keys ([[graft.operators.Dedup.bandBucketBloom]], the
    * nightly-batch artifact). A doc whose signature collides with the
    * corpus in ≥ `minBands` bands is flagged as a probable near-dup of
    * SOMETHING already ingested — the cheap gate a pipeline runs
    * before admitting a doc to the expensive batch dedup.
    *
    * Scale shape: map-only — no join, no shuffle, NO state; per-doc
    * work is linear in its shingles (the 64-permutation sweep rides
    * one pass over the shingle hashes). The signature/band math is the
    * imperative twin of the batch SQL, spec-asserted bit-equal
    * ([[graft.operators.Dedup.minhashBandKeysOf]]); an exact clone of
    * a corpus doc therefore hits ALL its bands by construction. The
    * Bloom errs only positive (≤ fpp per band); `bands_hit` can
    * overcount, never undercount — tune `minBands` up to trade
    * screening recall for precision.
    */
  def nearDupOn(spark: SparkSession, src: DataFrame,
      bloom: BloomFilter, minBands: Int = 1): DataFrame = {
    import spark.implicits._
    src.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val keys = Dedup.minhashBandKeysOf(text)
          var hits = 0
          var i = 0
          while (i < keys.length) {
            if (bloom.mightContainLong(keys(i))) hits += 1
            i += 1
          }
          (id, keys.length, hits, keys.length > 0 && hits >= minBands)
        }
      }
      .toDF("doc_id", "n_bands", "bands_hit", "near_dup")
  }

  /** Streaming perplexity scoring — the LIVE twin of
    * [[graft.operators.Perplexity.q102]]'s scoring stage: arriving
    * documents score against a compact LM the nightly batch job
    * published ([[Perplexity.persistLm]] → [[Perplexity.loadLm]],
    * optionally count-pruned, CCNet's ship-the-pruned-KenLM shape).
    * This closes the LM lifecycle exactly like the BPE family's
    * (q97 → merges artifact → [[tokenizeOn]]): train nightly at
    * corpus scale, score at ingest with zero scan-back.
    *
    * Scale shape: MAP-ONLY — the [[Perplexity.LongLongMap]]-backed
    * LM (~34 B/row) rides the closure, no join, no shuffle, NO
    * state; per-doc work is linear in tokens × order. Per-row
    * outputs are bit-equal to the batch broadcast arm on the same
    * doc by construction — both call [[Perplexity.scoreDoc]] — and
    * spec-asserted against a batch run.
    */
  def pplOn(spark: SparkSession, src: DataFrame,
      lm: Perplexity.Lm): DataFrame = {
    import spark.implicits._
    src.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val (n, p) = Perplexity.scoreDoc(lm, text)
          (id, n, p)
        }
      }
      .toDF("doc_id", "n_scored", "ppl")
  }

  /** Streaming BM25 relevance tagging — the LIVE twin of
    * [[graft.operators.Search.q105]]'s scoring stage: arriving
    * documents are scored against the STANDING query set using the
    * KB-sized index-statistics artifact derived from the nightly
    * PERSISTED index ([[Search.bmStatsFromIndex]]: corpus N + total
    * length from the index's `_stats` row, query-term document
    * frequencies recounted from the pruned buckets — ONE source of
    * truth with [[Search.searchBmIndex]], the persistLm → loadLm →
    * pplOn lifecycle shape; [[Search.bmStatsOf]] remains the
    * bootstrap for a corpus with no index yet). The production shape is
    * ingest-time relevance tagging / contamination screening: every
    * new doc is tagged with how strongly it matches each standing
    * probe query, with zero scan-back into the corpus.
    *
    * Scale shape: MAP-ONLY — stats and queries ride the closure (no
    * join, no shuffle, NO state); per-doc work is linear in tokens.
    * Per-(doc, query) scaled scores are bit-equal to the batch
    * Catalyst expression by construction ([[Search.scoreDocBm25]] is
    * its closure twin) — spec-asserted against an un-truncated batch
    * run. Semantic delta vs batch q105, documented: the stream emits
    * EVERY matching (doc, query) score as docs arrive — a global
    * static top-k is meaningless mid-stream; rank selection belongs
    * to whoever consumes the scores.
    */
  def searchOn(spark: SparkSession, src: DataFrame,
      stats: Search.BmStats,
      queries: Seq[(Long, String)] = Search.SearchQueries): DataFrame = {
    import spark.implicits._
    src.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        Search.scoreDocBm25(stats, queries, text)
          .map { case (qid, s) => (id, qid, s / 1e9) }
      }
      .toDF("doc_id", "query_id", "score")
  }

  /** Streaming DENSE relevance tagging — the ingest twin of the RAG
    * retrieval stack ([[Rag.q109]]'s scoring stage), completing the
    * ingest-twin family on the dense side the way [[searchOn]] does
    * for BM25: each arriving document is CHUNKED (the same
    * [[Curation.chunksOn]] Catalyst stage as batch — stateless
    * generators work unchanged on a stream), feature-hash EMBEDDED,
    * and cosine-scored against the standing query set. Emits one row
    * per (chunk, query): `(doc_id, chunk_id, query_id, cosine)`.
    *
    * Scale shape: MAP-ONLY — queries embed once on the driver and
    * ride the closure (no join, no shuffle, NO state); per-chunk work
    * is dims × queries. Per-row cosines are bit-equal the batch
    * [[Rag.scoreAllChunks]] relation by construction: same
    * [[Rag.embedText]], and the closure's index-order dot is the
    * `dot_d` expression's exact summation order (the `scoreDocBm25`
    * precedent) — spec-asserted against the batch run. Rank/top-k
    * selection belongs to the consumer, as with [[searchOn]].
    */
  def ragOn(spark: SparkSession, src: DataFrame,
      queries: Seq[(Long, String)] = Rag.RagQueries): DataFrame = {
    import spark.implicits._
    val qs = queries.map { case (qid, t) =>
      val qv = Rag.embedText(t)
      (qid, qv, Rag.normOf(qv))
    }
    Curation.chunksOn(src.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("chunk_id"), col("text"))
      .as[(Long, Long, String)]
      .flatMap { case (d, c, t) =>
        val v = Rag.embedText(t)
        val nrm = Rag.normOf(v)
        qs.map { case (qid, qv, qnrm) =>
          var s = 0.0
          var i = 0
          while (i < v.length) { s += qv(i) * v(i); i += 1 }
          (d, c, qid, s / (nrm * qnrm))
        }
      }
      .toDF("doc_id", "chunk_id", "query_id", "cosine")
  }

  /** Streaming quality filtering — the LIVE twin of
    * [[graft.operators.QualityFilter.q111]]'s apply stage: arriving
    * documents are scored by a classifier the nightly batch job
    * trained and published ([[QualityFilter.persistQc]] →
    * [[QualityFilter.loadQc]]), and verdicted with the SAME
    * deterministic Pareto keep rule. This closes the quality-filter
    * lifecycle exactly like the LM's (persistLm → loadLm → pplOn):
    * train nightly at corpus scale, filter at ingest with zero
    * scan-back.
    *
    * Scale shape: MAP-ONLY — the KB weight vector rides the closure
    * (no join, no shuffle, NO state); per-doc work is linear in
    * tokens. Per-row scores are bit-equal the batch Catalyst arm by
    * construction ([[QualityFilter.QcModel.score]] is its closure
    * twin: index-order dot, one Math.exp) and the keep rule hashes
    * the same md5 prefix — spec-asserted against a batch run.
    */
  def qcOn(spark: SparkSession, src: DataFrame,
      model: graft.operators.QualityFilter.QcModel): DataFrame = {
    import spark.implicits._
    src.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val s = model.score(text)
          md.reset()
          val hex = md.digest(text.getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString
          val u = java.lang.Long.parseLong(hex.take(6), 16).toDouble /
            (1L << 24).toDouble
          (id, s, graft.operators.QualityFilter.keepRule(s, u))
        }
      }
      .toDF("doc_id", "score", "kept")
  }

  /** Streaming language ID — the LIVE twin of
    * [[graft.operators.LangId.q134]]'s apply stage: arriving documents
    * are scored with the char-n-gram Naive Bayes model the nightly
    * batch job trained (the qc/ppl lifecycle shape). Map-only, the
    * model broadcast, NO state; per-row predictions are bit-equal the
    * batch arm by construction (same [[LangId.LangIdModel.score]]
    * closure, pure int64 sums) — spec-asserted against a batch run.
    */
  def langIdOn(spark: SparkSession, src: DataFrame,
      model: graft.operators.LangId.LangIdModel): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    src.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, t) =>
          val (pred, margin) = m.score(t)
          (id, pred, margin)
        }
      }
      .toDF("doc_id", "pred_lang", "margin")
  }

  /** Streaming BPE tokenization — the LIVE twin of
    * [[graft.operators.Bpe.q98]]: arriving documents are encoded with
    * a merge table the nightly batch job trained ([[Bpe.trainCached]]
    * / q97, the published artifact), emitting the same per-doc token
    * stats the batch APPLY step computes. This closes the tokenizer
    * lifecycle: train nightly at corpus scale, apply at ingest with
    * zero scan-back.
    *
    * Scale shape: identical to batch q98 — the KB-sized merge table
    * rides the closure (no join, no shuffle, NO state), encode is
    * map-only with a per-partition word→tokens memo (Zipfian hit
    * rate). Per-row outputs are bit-equal to batch q98 on the same
    * doc by construction (same `encodeWord`, same stats arithmetic) —
    * spec-asserted against the batch run.
    */
  def tokenizeOn(spark: SparkSession, src: DataFrame,
      merges: Seq[(Long, String, String, String, Long)]): DataFrame = {
    import spark.implicits._
    src.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, text) =>
          val words = text.trim.split("\\s+").filter(_.nonEmpty)
          var nTok = 0L
          val distinct = new java.util.HashSet[String]()
          words.foreach { w =>
            var toks = memo.get(w)
            if (toks == null) {
              toks = Bpe.encodeWord(w, merges).toArray
              memo.put(w, toks)
            }
            nTok += toks.length
            toks.foreach(distinct.add)
          }
          (id, words.length.toLong, nTok, distinct.size.toLong,
            if (words.isEmpty) 0.0 else nTok.toDouble / words.length)
        }
      }
      .toDF("doc_id", "n_words", "n_tokens", "n_distinct_tokens",
        "tokens_per_word")
  }
}
