package graft

import org.apache.spark.sql.functions._

import graft.operators.Search

class SearchSpec extends SparkSpec {

  /** Independent BM25-lite reference: different code shape than the
    * operator (driver-side maps, no DataFrames) but the same exact
    * arithmetic contract — rational idf N/df, k1=1.25 b=0.75,
    * per-term contributions floor-scaled to int64 at 1e9 and summed
    * exactly. A yardstick must not share the operator's code.
    */
  private def referenceBm25(
      docs: Seq[(Long, String)],
      queries: Seq[(Long, String)],
      topK: Int): Seq[(Long, Long, Long, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val n = docs.size.toLong
    val totalLen = toks.values.map(_.size.toLong).sum
    val dfMap = toks.values
      .flatMap(_.distinct).groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    queries.flatMap { case (qid, q) =>
      val terms = q.split("\\s+").filter(_.nonEmpty).distinct
      val scored = toks.toSeq.flatMap { case (did, ts) =>
        val dl = ts.size.toLong
        val dlNorm = dl.toDouble * n.toDouble / totalLen.toDouble
        val s = terms.flatMap { term =>
          val tf = ts.count(_ == term).toLong
          if (tf == 0L) None
          else {
            val idf = n.toDouble / dfMap(term).toDouble
            val c = idf * (tf.toDouble * 2.25) /
              (tf.toDouble + 1.25 * (1.0 - 0.75 + 0.75 * dlNorm))
            Some(math.floor(c * 1e9).toLong)
          }
        }
        if (s.isEmpty) None else Some(did -> s.sum)
      }
      scored.sortBy { case (did, sc) => (-sc, did) }.take(topK)
        .zipWithIndex.map { case ((did, sc), i) =>
          (qid, i + 1L, did, sc.toDouble / 1e9) }
    }
  }

  test("q105 BM25: bit-equal to an independent reference scorer on a planted corpus") {
    import spark.implicits._
    // planted: doc 1 is saturated with 'fast', doc 2 mentions it once
    // in a long doc (length normalization penalizes), doc 3 has both
    // query terms (coordination wins), doc 4 is irrelevant
    val docs = Seq(
      (1L, "fast fast fast fast scan"),
      (2L, "fast " + (1 to 40).map(i => s"w$i").mkString(" ")),
      (3L, "fast scan table row"),
      (4L, "alpha beta gamma delta"),
      (5L, "scan scan fast"))
    val queries = Seq((1L, "fast scan"), (2L, "table"))
    val got = Search.bm25On(docs.toDF("doc_id", "text"), queries, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val want = referenceBm25(docs, queries, 3)
    assert(got === want)
    // the semantics the numbers encode: doc 4 never retrieved; the
    // term-saturated short doc outranks the diluted long one
    assert(!got.exists(_._3 == 4L))
    val q1 = got.filter(_._1 == 1L).map(_._3)
    // the diluted 41-token doc 2 ranks below the term-saturated short
    // docs — here it falls out of the top-3 entirely
    assert(q1.contains(1L) && !q1.contains(2L))
  }

  test("q105 matches the reference on the real corpus, full query set") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = Search.q105(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val want = referenceBm25(docs, Search.SearchQueries, Search.SearchTopK)
    assert(got === want)
  }

  test("on-disk index: build -> search bit-equals in-flight, probes prune, append folds a batch in") {
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bmidx").toString + "/bm"
    Search.buildBmIndex(spark, sf, idx)
    // search through the index == the in-flight scorer, bit-for-bit
    val fromIndex = Search.searchBmIndex(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val inFlight = Search.q105(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fromIndex.toSeq === inFlight.toSeq)
    // every index scan in the plan touches only probed partitions
    val probedPlan = Search.searchBmIndex(spark, idx)
      .queryExecution.sparkPlan
    val scans = probedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(idx)) =>
        f.selectedPartitions.partitionCount
    }
    val allBuckets = spark.read.parquet(idx)
      .select("bucket").distinct().count()
    assert(scans.nonEmpty)
    scans.foreach(n => assert(n < allBuckets,
      s"scan read $n of $allBuckets buckets — no pruning"))
    // append a batch: a doc saturated with a query term must surface
    // at rank 1, and the whole result set must equal an in-flight run
    // over the UNION corpus (stats folded in exactly)
    val batch = Seq((900001L, "fast fast fast fast fast scan fast"))
      .toDF("doc_id", "text")
    val report = Search.appendBmIndex(spark, idx, batch).collect()
    assert(report.map(_.getAs[Long]("n_postings")).sum === 2L) // fast, scan
    val after = Search.searchBmIndex(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val union = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).union(batch)
    val expected = Search.bm25On(union, Search.SearchQueries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(after.toSeq === expected.toSeq)
    // the stats artifact folded the batch in exactly (one more doc,
    // seven more tokens) — the bit-equality above already depends on
    // this, but assert it directly so a failure names the culprit
    val stats = spark.read.parquet(s"$idx/_stats").collect().head
    val base = Tables(spark, sf, "documents")
      .agg(count(lit(1)), sum(size(split(col("text"), "\\s+")))).collect()
    assert(stats.getLong(0) === base.head.getLong(0) + 1L)
    // and the un-truncated union scorer sees the appended doc
    val full = Search.bm25On(union, Search.SearchQueries, Int.MaxValue)
      .filter(col("doc_id") === 900001L).collect()
    assert(full.nonEmpty, "appended doc invisible to the union scorer")
  }

  test("deleteFromBmIndex: search equals the survivor corpus bit-for-bit; mismatched requests abort untouched") {
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bmdel").toString + "/bm"
    Search.buildBmIndex(spark, sf, idx)
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    // delete a batch that includes docs visible in the standing
    // results, so the deletion provably changes rankings
    val before = Search.searchBmIndex(spark, idx).collect()
    val visible = before.map(_.getLong(2)).distinct.take(2).toSeq
    val doomed = docs.filter(col("doc_id").isin(visible: _*)
      || col("doc_id") % 97 === 0)
    val doomedIds = doomed.select("doc_id").collect().map(_.getLong(0)).toSet
    val report = Search.deleteFromBmIndex(spark, idx, doomed).collect()
    assert(report.map(_.getAs[Long]("postings_removed")).sum > 0L)
    // search through the index == in-flight over the survivor corpus
    val survivors = docs.filter(!col("doc_id").isInCollection(doomedIds))
    val after = Search.searchBmIndex(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = Search.bm25On(survivors, Search.SearchQueries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(after.toSeq === expect.toSeq)
    assert(!after.exists(h => doomedIds.contains(h._3)),
      "a deleted doc still surfaces")
    // the stats artifact decremented exactly to the survivor recount
    val stats = spark.read.parquet(s"$idx/_stats").collect().head
    val base = survivors.agg(count(lit(1)),
      sum(size(expr("regexp_extract_all(text, '\\\\S+', 0)"))))
      .collect().head
    assert(stats.getLong(0) === base.getLong(0))
    assert(stats.getLong(1) === base.getLong(1))
    // a request whose text differs from the indexed content must
    // abort with every bucket intact (validation precedes any swap)
    val bogus = survivors.limit(1)
      .select(col("doc_id"), lit("totally different words").as("text"))
    intercept[IllegalArgumentException] {
      Search.deleteFromBmIndex(spark, idx, bogus)
    }
    val untouched = Search.searchBmIndex(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(untouched.toSeq === expect.toSeq)
    // delete → append composes: a fresh doc indexes cleanly after
    val batch = Seq((910001L, "fast fast fast scan fast"))
      .toDF("doc_id", "text")
    Search.appendBmIndex(spark, idx, batch)
    val withNew = Search.searchBmIndex(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect2 = Search.bm25On(survivors.union(batch),
      Search.SearchQueries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(withNew.toSeq === expect2.toSeq)
  }

  test("index maintenance: compaction right-sizes buckets byte-identically; _stats heals from a crash; duplicate appends rejected") {
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bmidx2").toString + "/bm"
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(bucketDir: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(bucketDir)
        .count(f => f.isFile && !f.getPath.getName.startsWith("_"))
    def bucketDirs() = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
    def results() = Search.searchBmIndex(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

    Search.buildBmIndex(spark, sf, idx)
    // five nightly appends accrete one small file per touched bucket
    (0 until 5).foreach { i =>
      Search.appendBmIndex(spark, idx,
        Seq((910000L + i, s"fast scan nightly$i payload"))
          .toDF("doc_id", "text"))
    }
    assert(bucketDirs().map(s => dataFiles(s.getPath)).max > 1,
      "appends did not fragment any bucket — the fixture is broken")
    val before = results()

    // compaction: fragmented buckets rewritten right-sized, results
    // byte-identical (rows move between files, never change)
    val report = Search.compactBmIndex(spark, idx).collect()
    assert(report.nonEmpty, "no bucket was compacted")
    report.foreach { r =>
      assert(r.getInt(2) < r.getInt(1),
        s"bucket ${r.getLong(0)}: ${r.getInt(1)} -> ${r.getInt(2)} files")
    }
    // at the default 128 MB target every bucket collapses to one file,
    // and no hidden temp/old dir survives the swap
    bucketDirs().foreach(d => assert(dataFiles(d.getPath) === 1))
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .exists(s => s.getPath.getName.startsWith("_tmp_bucket") ||
        s.getPath.getName.startsWith("_old_bucket")))
    assert(results() === before, "compaction changed search results")

    // crash window 1: _stats missing entirely (died between delete and
    // rename) — reads heal by recomputing from the postings
    val statsP = new org.apache.hadoop.fs.Path(s"$idx/_stats")
    val goodStats = Search.readBmStatsRow(spark, idx)
    fs.delete(statsP, true)
    assert(results() === before, "search diverged after _stats loss")
    assert(fs.exists(statsP), "_stats not re-materialized on read")
    assert(Search.readBmStatsRow(spark, idx) === goodStats)

    // crash window 2: postings appended but stats swap never ran —
    // the index stays READABLE with stats stale by one batch, and
    // recomputeBmStats repairs it to the exact folded values
    Seq((goodStats._1 - 1L, goodStats._2 - 5L))
      .toDF("n_docs", "total_len")
      .write.mode("overwrite").parquet(s"$idx/_stats")
    assert(results().size === before.size,
      "stale stats made the index unreadable")
    assert(Search.recomputeBmStats(spark, idx) === goodStats)
    assert(results() === before)

    // new-docs-only guard: re-appending an indexed doc_id is rejected
    val dup = Seq((910000L, "fast again")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Search.appendBmIndex(spark, idx, dup, guardDuplicates = true)
    }
    assert(e.getMessage.contains("910000"))
    assert(results() === before, "rejected append mutated the index")
  }

  test("recoverBmIndexCompaction heals every compaction crash state with byte-identical results") {
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bmidx4").toString + "/bm"
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def p(n: String) = new org.apache.hadoop.fs.Path(s"$idx/$n")
    def results() = Search.searchBmIndex(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    Search.buildBmIndex(spark, sf, idx)
    val before = results()
    val buckets = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .filter(_.getPath.getName.startsWith("bucket=")).map(_.getPath)
    val b0 = buckets.head
    val id0 = b0.getName.stripPrefix("bucket=").toLong
    // clean index: recovery is a no-op
    assert(Search.recoverBmIndexCompaction(spark, idx) === Seq.empty)

    // state 1: died before the first rename — temp twin exists,
    // standing bucket intact
    fs.mkdirs(p(s"_tmp_bucket_$id0"))
    assert(Search.recoverBmIndexCompaction(spark, idx) === Seq(id0))
    assert(!fs.exists(p(s"_tmp_bucket_$id0")))
    assert(results() === before)

    // state 2: died between the second rename and the old delete —
    // compacted bucket live, old payload lingers
    fs.mkdirs(p(s"_old_bucket_$id0"))
    assert(Search.recoverBmIndexCompaction(spark, idx) === Seq(id0))
    assert(!fs.exists(p(s"_old_bucket_$id0")))
    assert(results() === before)

    // state 3: died between the two renames — bucket ABSENT, its
    // whole payload parked as _old (simulated by the same rename)
    fs.rename(b0, p(s"_old_bucket_$id0"))
    fs.mkdirs(p(s"_tmp_bucket_$id0")) // possibly-incomplete temp too
    assert(Search.recoverBmIndexCompaction(spark, idx) === Seq(id0))
    assert(fs.exists(b0), "bucket not restored from _old")
    assert(!fs.exists(p(s"_old_bucket_$id0")))
    assert(!fs.exists(p(s"_tmp_bucket_$id0")))
    assert(results() === before)
  }

  test("bmStatsFromIndex: no corpus scan, equal to the bootstrap form, append-aware") {
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bmidx3").toString + "/bm"
    Search.buildBmIndex(spark, sf, idx)
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    assert(Search.bmStatsFromIndex(spark, idx) === Search.bmStatsOf(docs))
    // after an append the index-derived stats track the union corpus
    val batch = Seq((920000L, "fast stream window")).toDF("doc_id", "text")
    Search.appendBmIndex(spark, idx, batch)
    assert(Search.bmStatsFromIndex(spark, idx) ===
      Search.bmStatsOf(docs.union(batch)))
  }

  test("term bloom short-circuits absent query terms with identical results; appends stay findable; bloom-less legacy index works") {
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bmidx5").toString + "/bm"
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Search.buildBmIndex(spark, sf, idx)
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // a query mixing present terms with vocabulary-absent garbage
    val mixed = Seq((1L, "fast zzxqvnotaword scan"),
      (2L, "qqwwzz alsonotaword"))
    assert(res(Search.searchBmIndex(spark, idx, mixed)) ===
      res(Search.bm25On(docs, mixed)))
    // the absent-only query probes ZERO buckets: its plan scans no
    // index partitions at all
    val absentOnly = Seq((9L, "zzxqvnotaword qqwwzz"))
    val noneDf = Search.searchBmIndex(spark, idx, absentOnly)
    assert(noneDf.isEmpty)
    val scans = noneDf.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(idx)) =>
        f.selectedPartitions.partitionCount
    }
    scans.foreach(n => assert(n === 0,
      s"absent-only query still scanned $n buckets"))
    // index-derived stats carry no phantom df entries either
    val stats = Search.bmStatsFromIndex(spark, idx, mixed)
    assert(!stats.df.keySet.exists(_.contains("notaword")))
    assert(stats === Search.bmStatsOf(docs, mixed))
    // append a doc with a NOVEL term: the bloom folds it in and the
    // term is immediately searchable through the screen
    Search.appendBmIndex(spark, idx,
      Seq((930000L, "xylophonic xylophonic retrieval"))
        .toDF("doc_id", "text"))
    val novel = Seq((5L, "xylophonic"))
    val hits = res(Search.searchBmIndex(spark, idx, novel))
    assert(hits.nonEmpty && hits.head._3 === 930000L)
    // legacy mode: an index without _termbloom screens nothing and
    // still answers identically
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/_termbloom"), false)
    assert(res(Search.searchBmIndex(spark, idx, mixed)) ===
      res(Search.bm25On(docs.union(
        Seq((930000L, "xylophonic xylophonic retrieval"))
          .toDF("doc_id", "text")), mixed)))
  }

  test("append's distributed bloom fold takes the mergeInPlace fast path at every bloom size") {
    // The round-14 fold relies on one invariant: a graft-built bloom
    // (fpp 1% at ANY expectedNumItems) has optimal hash count 7, and
    // the batch bloom built with numBits = standing.bitSize() and
    // expectedNumItems = ceil(bits·ln2/7) rounds to the same 7 — so
    // mergeInPlace is a plain bit-OR, never the streamed fallback.
    // Pin it across four decades of vocabulary size.
    import spark.implicits._
    for (n <- Seq(3L, 1000L, 50000L, 2000000L)) {
      val standing = org.apache.spark.util.sketch.BloomFilter.create(
        math.max(1024L, n * 2), Search.TermBloomFpp)
      val bits = standing.bitSize()
      val nItems = math.max(1L, math.ceil(bits * math.log(2) / 7.0).toLong)
      val batch = Seq("alpha", "beta", "gamma").toDF("term")
        .stat.bloomFilter("term", nItems, bits)
      // must NOT throw IncompatibleMergeException
      standing.mergeInPlace(batch)
      for (t <- Seq("alpha", "beta", "gamma"))
        assert(standing.mightContainString(t),
          s"term $t lost in the fold at vocab size $n")
    }
  }

  test("rebuildTermBloom unlearns deleted-only vocabulary; results stay identical") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_bloomrb").toString
    val idx = s"$tmp/bm"
    val all = Seq(
      (1L, "zebraqx unicorntt common retrieval"),
      (2L, "common retrieval engine"),
      (3L, "common engine scan")).toDF("doc_id", "text")
    all.write.parquet(s"$tmp/documents.parquet")
    Search.buildBmIndex(spark, tmp, idx)
    assert(Search.readTermBloom(spark, idx).get
      .mightContainString("zebraqx"))
    // forget doc 1 — the ONLY holder of zebraqx/unicorntt — with the
    // bloom rebuild folded in
    Search.deleteFromBmIndex(spark, idx,
      all.filter(col("doc_id") === 1), rebuildBloom = true)
    val after = Search.readTermBloom(spark, idx).get
    assert(!after.mightContainString("zebraqx") &&
      !after.mightContainString("unicorntt"),
      "rebuilt bloom still admits vocabulary only deleted docs held")
    assert(after.mightContainString("common") &&
      after.mightContainString("engine"))
    // and search through the rebuilt screen equals the survivor
    // recompute (the deleted-only term scoring zero both ways)
    val survivors = all.filter(col("doc_id") =!= 1)
    val queries = Seq((1L, "common engine"), (2L, "zebraqx common"))
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(res(Search.searchBmIndex(spark, idx, queries)) ===
      res(Search.bm25On(survivors, queries)))
  }

  test("epoch append: a retry from EVERY crash point yields the exactly-once artifact") {
    // the round-10 double-apply window: a crash between the postings
    // append and the _stats swap made the foreachBatch retry re-append
    // the batch (duplicated postings no repair removed). Appends now
    // stage under _batch_<epoch> and publish by file moves, so a retry
    // resumes instead of re-writing. Reproduce each crash state with
    // the implementation's own staging helpers, retry the epoch, and
    // demand the result equals a clean exactly-once append.
    import spark.implicits._
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val standing = docs.filter(col("doc_id") % 5 > 0)
    val day1 = docs.filter(col("doc_id") % 5 === 0).localCheckpoint()
    val base = java.nio.file.Files
      .createTempDirectory("graft_bmcrash").toString
    standing.write.parquet(s"$base/documents.parquet")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())

    def freshIndex(name: String): String = {
      val idx = s"$base/$name"
      Search.buildBmIndex(spark, base, idx)
      idx
    }
    def tfOf() = Search.tfIndex(day1)
      .withColumn("bucket",
        pmod(xxhash64(col("term")), lit(Search.IndexBuckets.toLong)))
      .localCheckpoint()
    def postings(idx: String) = spark.read.parquet(idx).collect()
      .map(_.toString).sorted.toSeq
    def statsRow(idx: String) = spark.read.parquet(s"$idx/_stats")
      .collect().head.toString
    def hits(idx: String) = Search.searchBmIndex(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

    // the exactly-once reference: one clean epoch append
    val ref = freshIndex("ref")
    Search.appendBmIndex(spark, ref, day1, epochId = Some(7L))
    val (refPostings, refStats, refHits) =
      (postings(ref), statsRow(ref), hits(ref))
    // sanity: reference equals the union-corpus recompute
    assert(refHits === Search.bm25On(docs, Search.SearchQueries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq)

    def retryAndCheck(idx: String, state: String): Unit = {
      Search.appendBmIndex(spark, idx, day1, epochId = Some(7L))
      assert(postings(idx) === refPostings,
        s"$state: postings differ from the exactly-once artifact")
      assert(statsRow(idx) === refStats, s"$state: stats differ")
      assert(hits(idx) === refHits, s"$state: search results differ")
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
        Search.batchDir(idx, 7L))), s"$state: staging dir leaked")
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/_stats_old")),
        s"$state: _stats_old aside leaked")
      // and the retry's retry is a byte-level no-op
      Search.appendBmIndex(spark, idx, day1, epochId = Some(7L))
      assert(postings(idx) === refPostings && statsRow(idx) === refStats)
    }

    // crash 1: staged, nothing published, no stats swap
    val c1 = freshIndex("c1")
    Search.stageBatchPostings(spark, c1, tfOf(), 7L)
    retryAndCheck(c1, "crash-after-staging")

    // crash 2: staged, HALF the staged files published, no stats swap
    val c2 = freshIndex("c2")
    Search.stageBatchPostings(spark, c2, tfOf(), 7L)
    val stage2 = new org.apache.hadoop.fs.Path(Search.batchDir(c2, 7L))
    val bucketDirs = fs.listStatus(stage2)
      .filter(_.getPath.getName.startsWith("bucket="))
    assert(bucketDirs.length > 1, "need >1 staged bucket to split")
    bucketDirs.take(bucketDirs.length / 2).foreach { bdir =>
      val dst = new org.apache.hadoop.fs.Path(
        s"$c2/${bdir.getPath.getName}")
      if (!fs.exists(dst)) fs.mkdirs(dst)
      fs.listStatus(bdir.getPath)
        .filterNot(f => f.getPath.getName.startsWith("_") ||
          f.getPath.getName.startsWith("."))
        .foreach(f => fs.rename(f.getPath,
          new org.apache.hadoop.fs.Path(dst, f.getPath.getName)))
    }
    retryAndCheck(c2, "crash-mid-publish")

    // crash 3: fully published, no stats swap (the judged window)
    val c3 = freshIndex("c3")
    Search.stageBatchPostings(spark, c3, tfOf(), 7L)
    Search.publishStagedPostings(spark, c3, 7L)
    retryAndCheck(c3, "crash-before-stats-swap")

    // crash 4: stats swapped, staging delete lost — the no-op replay
    // must sweep the orphan without touching the artifacts
    val c4 = freshIndex("c4")
    Search.appendBmIndex(spark, c4, day1, epochId = Some(7L))
    fs.mkdirs(new org.apache.hadoop.fs.Path(Search.batchDir(c4, 7L)))
    retryAndCheck(c4, "crash-before-staging-delete")

    // crash 5: the r10 §7f window — a RETRY of a fully-published batch
    // dies INSIDE the stats swap, after the old row is renamed aside
    // and before the new one lands. Under the old delete→rename form
    // this state had NO stats at all, readBmStatsRow recomputed a base
    // that already included the published batch, and the next retry
    // folded the batch AGAIN (stats off by one batch). Now the aside
    // carries the pre-batch row + epoch and the retry folds exactly once.
    val c5 = freshIndex("c5")
    Search.stageBatchPostings(spark, c5, tfOf(), 7L)
    Search.publishStagedPostings(spark, c5, 7L)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$c5/_stats"),
      new org.apache.hadoop.fs.Path(s"$c5/_stats_old")))
    // the crashed swap's half-written tmp (the next attempt overwrites it)
    spark.range(1)
      .select(lit(999L).as("n_docs"), lit(999L).as("total_len"),
        lit(999L).as("epoch"))
      .coalesce(1).write.parquet(s"$c5/_stats_tmp")
    retryAndCheck(c5, "crash-mid-stats-swap")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$c5/_stats_old")),
      "mid-swap aside not swept")

    // crash 6: new stats landed, the trailing _stats_old delete lost —
    // readers must prefer _stats (new epoch ⇒ no-op replay) and the
    // replay must sweep the stale aside
    val c6 = freshIndex("c6")
    Search.appendBmIndex(spark, c6, day1, epochId = Some(7L))
    spark.range(1)
      .select(lit(1L).as("n_docs"), lit(1L).as("total_len"),
        lit(-1L).as("epoch"))
      .coalesce(1).write.parquet(s"$c6/_stats_old")
    retryAndCheck(c6, "crash-before-aside-delete")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$c6/_stats_old")),
      "stale aside not swept by the no-op replay")
  }

  test("q105 plan: query terms broadcast, top-k is a map-side group limit") {
    val plan = Search.q105(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"query-term join is not broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-k is not a WindowGroupLimit:\n$plan")
  }

  test("stats swap survives concurrently-promoting readers: no epoch lost, every read sees a valid row") {
    // round-12 advice fix: resolveStats (reader) promotes _stats_old
    // back to _stats; a reader interposing between the writer's
    // rename-aside and rename-in used to make the rename-in fail
    // SILENTLY (return value unchecked) — the new stats row was lost
    // without any crash. The writer now return-checks and retries the
    // swap. This hammer runs a spinning promoter against a sequence
    // of swaps: post-fix, the final epoch is exactly the last one
    // written and every concurrent read observed some valid epoch.
    val idx = java.nio.file.Files
      .createTempDirectory("graft_stats_race").toString
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Search.writeStatsAtomic(spark, idx, 1L, 1L, epoch = 0L)
    @volatile var stop = false
    @volatile var readerFailure: Option[String] = None
    val reads = new java.util.concurrent.atomic.AtomicLong
    val reader = new Thread(() => {
      while (!stop) {
        // the promoting read path the race needs (resolveStats renames
        // _stats_old -> _stats when _stats is momentarily absent)
        val p = Search.resolveStats(fs, idx)
        if (p.isEmpty)
          readerFailure = Some("reader observed NO readable stats row")
        reads.incrementAndGet()
      }
    })
    reader.start()
    val epochs = 1L to 120L
    try epochs.foreach { e =>
      Search.writeStatsAtomic(spark, idx, e + 1, e * 10, epoch = e)
    } finally { stop = true; reader.join(10000) }
    assert(readerFailure.isEmpty, readerFailure.getOrElse(""))
    assert(reads.get() > 0)
    // the LAST swap's row is live: nothing was silently lost
    assert(Search.readStatsEpoch(spark, idx) === epochs.last)
    val row = spark.read.parquet(s"$idx/_stats").collect().head
    assert((row.getLong(0), row.getLong(1)) ===
      ((epochs.last + 1, epochs.last * 10)))
  }
}
