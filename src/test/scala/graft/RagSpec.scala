package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Rag, Similarity}

class RagSpec extends SparkSpec {

  /** Driver-side brute-force retrieval over the chunked corpus —
    * independent of the operator's relational plan (imperative loop
    * over collected chunk vectors), but the same arithmetic contract
    * (index-order dot, cosine = dot / (nrm × qnrm), ties to the
    * smallest vec_id) so the full-probe path must match bit-for-bit.
    */
  private def bruteForce(
      chunks: Seq[(Long, Long, Long, Long, Long, Array[Double], Double)],
      queries: Seq[(Long, String)], topK: Int)
      : Seq[(Long, Long, Long, Long, Long, Long, Double)] =
    queries.flatMap { case (qid, text) =>
      val qv = Rag.embedText(text)
      var qn = 0.0
      var i = 0
      while (i < qv.length) { qn += qv(i) * qv(i); i += 1 }
      val qnrm = math.sqrt(qn)
      chunks.map { case (vid, d, c, s, e, v, nrm) =>
        var dp = 0.0
        var j = 0
        while (j < v.length) { dp += qv(j) * v(j); j += 1 }
        (vid, d, c, s, e, dp / (nrm * qnrm))
      }.sortBy { case (vid, _, _, _, _, cos) => (-cos, vid) }
        .take(topK).zipWithIndex
        .map { case ((_, d, c, s, e, cos), r) =>
          (qid, r + 1L, d, c, s, e, cos) }
    }

  private def collectChunks() =
    Rag.chunkVectors(Tables(spark, sf, "documents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getSeq[Double](5).toArray, r.getDouble(6)))
      .toSeq

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq

  test("q109 full-probe retrieval equals brute force over the chunked corpus bit-for-bit") {
    val chunks = collectChunks()
    assert(chunks.nonEmpty)
    val got = rows(Rag.q109(spark, sf, nprobeOverride = Int.MaxValue))
    val want = bruteForce(chunks, Rag.RagQueries, Rag.RagTopK)
    assert(got === want)
  }

  test("on-disk chunk index: probe bit-equals in-flight q109 and scans only probed cells") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ragidx").toString + "/rag"
    Rag.buildRagIndex(spark, sf, idx)
    val fromIndex = rows(Rag.probeRagIndex(spark, idx))
    val inFlight = rows(Rag.q109(spark, sf))
    assert(fromIndex === inFlight)
    // partition pruning: every index scan touches fewer partitions
    // than the index holds cells
    val plan = Rag.probeRagIndex(spark, idx).queryExecution.sparkPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(idx)) =>
        f.selectedPartitions.partitionCount
    }
    val allCells = spark.read.parquet(idx)
      .select("cell").distinct().count()
    assert(scans.nonEmpty)
    scans.foreach(n => assert(n < allCells,
      s"scan read $n of $allCells cells — no pruning"))
  }

  test("default probe width holds recall against exact retrieval") {
    val chunks = collectChunks()
    val exact = bruteForce(chunks, Rag.RagQueries, Rag.RagTopK)
      .map { case (qid, _, d, c, _, _, _) => (qid, d, c) }.toSet
    val approx = rows(Rag.q109(spark, sf))
      .map { case (qid, _, d, c, _, _, _) => (qid, d, c) }.toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"q109 recall@${Rag.RagTopK} at derived nprobe: $recall%.3f")
    assert(recall >= 0.5, f"recall $recall%.3f below floor")
  }

  test("appendRagIndex: a batch folds into stored-quantizer cells and full-probe search equals brute force over the union") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ragidx2").toString + "/rag"
    Rag.buildRagIndex(spark, sf, idx)
    // the batch plants a clone of query 1's text — its single chunk
    // embeds IDENTICALLY to the query vector, so it must come back at
    // rank 1 with cosine ~ 1
    val qText = Rag.RagQueries.head._2
    val batch = Seq((950000L, qText), (950001L, "entirely novel payload"))
      .toDF("doc_id", "text")
    val report = Rag.appendRagIndex(spark, idx, batch).collect()
    val quantCells = spark.read.parquet(s"$idx/_quantizer")
      .select("cell").collect().map(_.getInt(0)).toSet
    assert(report.nonEmpty)
    report.foreach(r => assert(quantCells.contains(r.getInt(0)),
      s"append created cell ${r.getInt(0)} outside the stored quantizer"))
    assert(report.map(_.getAs[Long]("n_chunks")).sum === 2L)
    // full-probe search over the appended index == driver brute force
    // over the UNION chunk corpus, bit-for-bit
    val unionChunks = collectChunks() ++
      Rag.chunkVectors(batch).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getSeq[Double](5).toArray, r.getDouble(6)))
    val got = rows(Rag.probeRagIndex(spark, idx,
      nprobeOverride = Int.MaxValue))
    val want = bruteForce(unionChunks, Rag.RagQueries, Rag.RagTopK)
    assert(got === want)
    // the planted clone surfaces at rank 1 for its query
    val top = got.find { case (qid, r, _, _, _, _, _) =>
      qid === Rag.RagQueries.head._1 && r === 1L }.get
    assert(top._3 === 950000L)
    assert(top._7 > 0.999999)
  }

  test("deleteFromRagIndex: full-probe search equals brute force over survivors; mismatches abort; crash states heal") {
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ragdel").toString + "/rag"
    Rag.buildRagIndex(spark, sf, idx)
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    // remove a batch that includes a doc visible in the standing
    // top-k, so the deletion provably changes rankings
    val visible = rows(Rag.probeRagIndex(spark, idx,
      nprobeOverride = Int.MaxValue)).map(_._3).distinct.take(2)
    val doomed = docs.filter(col("doc_id").isin(visible: _*)
      || col("doc_id") % 89 === 0)
    val doomedIds = doomed.select("doc_id").collect().map(_.getLong(0)).toSet
    val report = Rag.deleteFromRagIndex(spark, idx, doomed).collect()
    assert(report.map(_.getAs[Long]("chunks_removed")).sum > 0L)
    val survivors = docs.filter(!col("doc_id").isInCollection(doomedIds))
    val got = rows(Rag.probeRagIndex(spark, idx,
      nprobeOverride = Int.MaxValue))
    val want = bruteForce(
      Rag.chunkVectors(survivors).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getSeq[Double](5).toArray, r.getDouble(6))).toSeq,
      Rag.RagQueries, Rag.RagTopK)
    assert(got === want)
    assert(!got.exists(h => doomedIds.contains(h._3)),
      "a deleted doc's chunk still surfaces")
    // a request whose text differs from the indexed content aborts
    // with every cell intact (validation precedes any swap)
    val bogus = survivors.limit(1)
      .select(col("doc_id"), lit("entirely different chunk text").as("text"))
    intercept[IllegalArgumentException] {
      Rag.deleteFromRagIndex(spark, idx, bogus)
    }
    assert(rows(Rag.probeRagIndex(spark, idx,
      nprobeOverride = Int.MaxValue)) === want)
    // crash healing: plant all three interrupted-deletion states and
    // recover — results unchanged
    val root = new org.apache.hadoop.fs.Path(idx)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val cells = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("cell=")).map(_.stripPrefix("cell=").toInt).sorted
    val (c1, c2, c3) = (cells(0), cells(1), cells(2))
    def cp(n: String) = new org.apache.hadoop.fs.Path(root, n)
    // state 1: temp beside a live cell (died before first rename)
    fs.mkdirs(cp(s"_tmp_cell_$c1"))
    // state 2: old beside a live cell (died before old-dir delete)
    org.apache.hadoop.fs.FileUtil.copy(fs, cp(s"cell=$c2"), fs,
      cp(s"_old_cell_$c2"), false, spark.sessionState.newHadoopConf())
    // state 3: cell absent, old present (died between the renames)
    fs.rename(cp(s"cell=$c3"), cp(s"_old_cell_$c3"))
    val healed = Rag.recoverRagIndexDeletion(spark, idx)
    assert(healed.toSet === Set(c1, c2, c3))
    assert(rows(Rag.probeRagIndex(spark, idx,
      nprobeOverride = Int.MaxValue)) === want)
    assert(Rag.recoverRagIndexDeletion(spark, idx).isEmpty)
  }

  test("provenance: every hit cites a real q107 chunk, and multi-chunk docs flow through") {
    val q107 = Curation.q107(spark, sf)
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        col("end_tok"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val hits = rows(Rag.q109(spark, sf, nprobeOverride = Int.MaxValue))
    assert(hits.nonEmpty)
    hits.foreach { case (_, _, d, c, s, e, _) =>
      assert(q107.get((d, c)) === Some((s, e)),
        s"hit ($d, $c) cites bounds ($s, $e) not in q107")
    }
    // the chunking stage provably fired: more chunks than docs, and
    // chunk ids beyond 1 exist in the index
    val nDocs = Tables(spark, sf, "documents").count()
    assert(q107.size > nDocs, "chunker emitted ≤ 1 chunk per doc")
    assert(q107.keys.exists(_._2 >= 2L))
  }
}
