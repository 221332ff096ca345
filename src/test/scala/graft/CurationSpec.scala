package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends SparkSpec {

  test("q45 repetition fractions are in [0,1] and a synthetic loop doc is rejected") {
    val rows = Curation.q45(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t2 = r.getAs[Double]("top2_frac")
      val d5 = r.getAs[Double]("dup5_frac")
      assert(t2 >= 0.0 && t2 <= 1.0)
      assert(d5 >= 0.0 && d5 <= 1.0)
      // verdict is a pure function of the fractions
      assert(r.getAs[Boolean]("reject") === (t2 > 0.20 || d5 > 0.30))
    }
    // the rules must actually fire on degenerate repetition: a doc
    // that is one phrase looping has top2_frac ≈ 1 and dup5_frac ≈ 1
    import spark.implicits._
    val loop = Seq((0L, ("spam ham " * 30).trim)).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q45").toString
    loop.write.parquet(s"$tmp/documents.parquet")
    val v = Curation.q45(spark, tmp).collect().head
    assert(v.getAs[Double]("top2_frac") > 0.4)
    assert(v.getAs[Double]("dup5_frac") > 0.9)
    assert(v.getAs[Boolean]("reject"))
  }

  test("q46 contamination is a broadcast join over eval grams and finds planted overlap") {
    // plant: doc 0 (eval by mod 97) and doc 1 share a verbatim run
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "xx yy alpha beta gamma delta qq rr"),
      (2L, "totally different words here nothing shared")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q46").toString
    docs.write.parquet(s"$tmp/documents.parquet")
    val got = Curation.q46(spark, tmp).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
    assert(got.head.getAs[Long]("contaminated") === 1L) // "alpha beta gamma delta"
    // eval side must be broadcast — the corpus side may not shuffle
    // for the join at 100 TB
    val plan = Curation.q46(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval grams not broadcast:\n$plan")
  }

  test("q47 weights are a proper tempered distribution") {
    val rows = Curation.q47(spark, sf).collect()
    assert(rows.length > 1)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-9, s"weights sum to $wsum")
    // temperature flattens: tempered weight exceeds raw share for
    // rare langs and trails it for common ones
    rows.foreach { r =>
      val p = r.getAs[Double]("p_raw")
      val w = r.getAs[Double]("weight")
      val mean = 1.0 / rows.length
      if (p < mean * 0.9) assert(w > p, s"rare lang not up-weighted: p=$p w=$w")
    }
  }
}
