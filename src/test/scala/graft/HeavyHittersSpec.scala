package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class HeavyHittersSpec extends SparkSpec {

  test("misra-gries sketch honors its frequency guarantees vs exact counts") {
    val k = 16
    val exact = Tables(spark, sf, "documents")
      .select(explode(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val err = n / (k + 1)

    val got = TextAnalysis.q27(spark, sf, k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got.size <= k)

    // every true heavy hitter (freq > N/(k+1)) must be reported
    exact.filter(_._2 > err).foreach { case (tok, c) =>
      assert(got.contains(tok), s"missed heavy hitter $tok ($c > $err)")
    }
    // reported counts are lower bounds within N/(k+1)
    got.foreach { case (tok, lo) =>
      val t = exact(tok)
      assert(lo <= t, s"$tok: count_lo $lo exceeds true $t")
      assert(t - lo <= err, s"$tok: bound too loose ($lo vs $t, err $err)")
    }
  }

  test("heavy_hitters works per group and via SQL extensions") {
    val s2 = GraftSession.builder("local[2]", 2).getOrCreate()
    graft.Tables(s2, sf, "documents").createOrReplaceTempView("docs_hh")
    // k (=24) above the distinct-source count (20): no counter ever
    // decrements, so the sketch degenerates to exact per-group counts
    val rows = s2.sql(
      """SELECT lang, heavy_hitters(source, 24) AS hh
        |FROM docs_hh GROUP BY lang""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Any](1).nonEmpty))
    val total = rows.map(_.getSeq[org.apache.spark.sql.Row](1)
      .map(_.getLong(1)).sum).sum
    assert(total === graft.Tables(s2, sf, "documents").count())
  }
}
