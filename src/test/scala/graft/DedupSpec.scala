package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("ia", "ib").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact: Set[(Long, Long)] = pairs(Dedup.q31(spark, sf, 0.9))

  test("q31 exact jaccard finds the planted near-dups") {
    assert(exact.nonEmpty)
  }

  test("q32 minhash LSH recall ≥ 90% vs exact jaccard ≥0.9 pairs") {
    val cand = pairs(Dedup.q32(spark, sf, minEst = 0.5))
    val found = exact.intersect(cand)
    assert(found.size.toDouble / exact.size >= 0.9,
      s"recall ${found.size}/${exact.size}, candidates=${cand.size}")
  }

  test("q33 simhash finds near-dups and no exact-identical misses") {
    val sh = pairs(Dedup.q33(spark, sf, maxHamming = 8))
    // every 0.95+ jaccard pair should be within hamming 8
    val tight = pairs(Dedup.q31(spark, sf, 0.95))
    assert(tight.subsetOf(sh), s"missed ${tight.diff(sh)}")
  }

  test("q30 exact dedup keeps one id per content hash") {
    val df = Dedup.q30(spark, sf)
    assert(df.count() === df.select("content_hash").distinct().count())
  }

  test("q35 clusters: every q31 edge lands in one cluster, labels are minima") {
    val labels = Dedup.q35(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val edges = pairs(Dedup.q31(spark, sf))
    assert(edges.nonEmpty)
    edges.foreach { case (a, b) =>
      assert(labels(a) === labels(b), s"edge ($a,$b) split across clusters")
    }
    // the cluster id is the smallest member of the cluster
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid === members.keys.min)
    }
  }

  test("q34 cosine pairs are symmetric-free and above threshold") {
    val rows = Dedup.q34(spark, sf, 0.3).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("ia") < r.getAs[Long]("ib"))
      assert(r.getAs[Double]("cosine") >= 0.3)
    }
  }
}
