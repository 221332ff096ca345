package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id")))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }

  test("q40 brute-force: k results per query, descending cosine") {
    val rows = Similarity.q40(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.length === Similarity.K)
      val cos = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(cos.forall(c => c >= -1.0 && c <= 1.0))
    }
  }

  test("q41 LSH: recall@10 ≥ 0.3 vs brute force (random vectors, 8-table LSH)") {
    val exact = topk(Similarity.q40(spark, sf))
    val approx = topk(Similarity.q41(spark, sf))
    // random (unclustered) embeddings are the worst case for LSH —
    // just require substantially-better-than-zero overlap plus the
    // top-1 neighbors being mostly present
    val recalls = exact.map { case (q, ids) =>
      approx.get(q).map(a => a.toSet.intersect(ids.toSet).size.toDouble / ids.size)
        .getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall@10 = $mean")
  }

  test("IVF index append: assign-only batch is probe-visible at rank 1, pruning survives") {
    import org.apache.spark.sql.functions._
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    Similarity.buildIvfIndex(spark, sf, idx)
    // batch = exact clones of the query vectors under new ids: each
    // clone must land in its source's best cell and probe back at
    // rank 1 with cosine 1
    val clones = Tables(spark, sf, "embeddings")
      .filter(col("vec_id").isInCollection(Similarity.QueryIds))
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val report = Similarity.appendIvfIndex(spark, idx, clones).collect()
    assert(report.map(_.getAs[Long]("n_appended")).sum ===
      Similarity.QueryIds.size)
    report.foreach(r => assert(r.getAs[Double]("avg_cos") > 0.0))
    val probed = Similarity.probeIvfIndex(spark, sf, idx)
    // pruning still holds over the appended index
    val scanned = probed.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(idx)) =>
        f.selectedPartitions.partitionCount
    }.head
    val allCells = spark.read.parquet(idx).select("cell").distinct().count()
    assert(scanned < allCells, "append broke partition pruning")
    // every query's top hit is now its own clone at cosine ~1
    val top = probed.filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toMap
    Similarity.QueryIds.foreach { q =>
      val (hit, cos) = top(q)
      assert(hit === q + 100000L, s"query $q top hit $hit is not its clone")
      assert(math.abs(cos - 1.0) < 1e-12)
    }
  }

  test("on-disk IVF index: pruned probe reads match in-flight q42 exactly") {
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.buildIvfIndex(spark, sf, idx)
    val probed = Similarity.probeIvfIndex(spark, sf, idx)
    // the scan must touch only the probed cell partitions (pre-AQE
    // plan: the adaptive wrapper hides scan leaves until execution)
    val scanned = probed.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(idx)) =>
        f.selectedPartitions.partitionCount
    }.head
    val allCells = spark.read.parquet(idx).select("cell").distinct().count()
    assert(scanned < allCells,
      s"probe read $scanned of $allCells partitions — no pruning")
    // identical ranking math ⇒ identical results to the in-flight form
    val a = probed.collect().map(_.toSeq)
    val b = Similarity.q42(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("q42 IVF: k results per query, recall better than random cells") {
    val exact = topk(Similarity.q40(spark, sf))
    val ivf = topk(Similarity.q42(spark, sf))
    ivf.foreach { case (_, ids) => assert(ids.size === Similarity.K) }
    val recalls = exact.map { case (q, ids) =>
      ivf.get(q).map(a => a.toSet.intersect(ids.toSet).size.toDouble / ids.size)
        .getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // probing 4/16 cells of random vectors; require clearly > the 25%
    // a uniform-random cell assignment would give in expectation
    assert(mean >= 0.25, s"mean recall@10 = $mean")
  }

  test("q43 IVF+PQ: k exact-ranked results, recall comparable to full-vector q42") {
    val exact = topk(Similarity.q40(spark, sf))
    val pq = topk(Similarity.q43(spark, sf))
    pq.foreach { case (_, ids) => assert(ids.size === Similarity.K) }
    def recall(m: Map[Long, Seq[Long]]): Double = {
      val rs = exact.map { case (q, ids) =>
        m.get(q).map(a => a.toSet.intersect(ids.toSet).size.toDouble / ids.size)
          .getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    val rPq = recall(pq)
    val rIvf = recall(topk(Similarity.q42(spark, sf)))
    // PQ ranks candidates from 8-byte codes (32× less IO than the
    // vectors) and re-ranks only the top-50 exactly — the price is
    // bounded recall loss vs the full-vector IVF scan
    assert(rPq >= rIvf - 0.15, s"PQ recall $rPq collapsed vs IVF $rIvf")
    assert(rPq >= 0.2, s"PQ recall $rPq")
    // every emitted cosine must be the TRUE cosine (re-rank is exact):
    // q43's scores for ids also found by q40 match q40's bit-for-bit
    val exactScores = Similarity.q40(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    Similarity.q43(spark, sf).collect().foreach { r =>
      exactScores.get((r.getLong(0), r.getLong(2))).foreach { want =>
        assert(r.getDouble(3) === want)
      }
    }
  }

  test("adaptive nprobe selects the minimal ranked cell prefix meeting the candidate budget") {
    val budget = 100L
    val probes = Similarity.ivfProbesAdaptive(spark, sf, budget).collect()
    assert(probes.nonEmpty)
    val byQuery = probes.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet === Similarity.QueryIds.toSet)
    byQuery.foreach { case (q, cells) =>
      val ranked = cells.sortBy(_.getAs[Int]("prank"))
      // selected cells are a contiguous prefix of the cosine ranking
      assert(ranked.map(_.getAs[Int]("prank")).toSeq ===
        (1 to ranked.length).toSeq, s"query $q probes are not a prefix")
      val total = ranked.map(_.getAs[Long]("cell_n")).sum
      // budget met (some cell populations differ, so totals differ
      // per query — the point of adapting)
      assert(total >= budget, s"query $q total candidates $total < budget")
      // and minimally: dropping the last selected cell goes below it
      if (ranked.length > 1) {
        val withoutLast = total - ranked.last.getAs[Long]("cell_n")
        assert(withoutLast < budget,
          s"query $q selected a cell past the budget")
      }
    }
    // adaptation is real on this corpus: not every query probes the
    // same number of cells
    val counts = byQuery.values.map(_.length).toSet
    assert(counts.size > 1 || counts.head === 1,
      s"every query probed the same $counts cells — nothing adapted")
    // end-to-end: the adaptive q42 returns k ranked rows per query
    // and beats a 1-cell probe's recall at the same exact-rerank
    val exact = topk(Similarity.q40(spark, sf))
    def recall(m: Map[Long, Seq[Long]]): Double = {
      val rs = exact.map { case (q, ids) =>
        m.get(q).map(a => a.toSet.intersect(ids.toSet).size.toDouble / ids.size)
          .getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    val adaptive = topk(Similarity.q42Adaptive(spark, sf, budget))
    adaptive.values.foreach(ids => assert(ids.length === Similarity.K))
    val oneCell = topk(Similarity.q42Adaptive(spark, sf, 1L))
    assert(recall(adaptive) >= recall(oneCell),
      s"budget=$budget recall ${recall(adaptive)} < 1-cell ${recall(oneCell)}")
  }

  test("q42 quantizer: k-means refinement beats the seed at equal probes") {
    val exact = topk(Similarity.q40(spark, sf))
    def recall(iters: Int): Double = {
      val ivf = topk(Similarity.q42(spark, sf, iters = iters))
      val rs = exact.map { case (q, ids) =>
        ivf.get(q).map(a => a.toSet.intersect(ids.toSet).size.toDouble / ids.size)
          .getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    def balanceCv(iters: Int): Double = {
      val sizes = Similarity.ivfAssigned(spark, sf, iters)
        .groupBy("cell").count().collect().map(_.getAs[Long]("count"))
      val m = sizes.sum.toDouble / sizes.length
      math.sqrt(sizes.map(s => (s - m) * (s - m)).sum / sizes.length) / m
    }
    // both sides fully deterministic (decimal-summed Lloyd's, fixed
    // seeds) so strict inequalities are stable: measured 0.54 vs 0.46
    // recall and 0.147 vs 0.194 cell-size CV at sf0.001
    val (seedR, refR) = (recall(0), recall(Similarity.KMeansItersDefault))
    assert(refR > seedR, s"refined recall $refR !> seed recall $seedR")
    val (seedCv, refCv) =
      (balanceCv(0), balanceCv(Similarity.KMeansItersDefault))
    assert(refCv < seedCv, s"refined cell CV $refCv !< seed CV $seedCv")
  }
}
