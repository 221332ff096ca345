package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q01 pricing summary: 6 flag/status groups, counts add up") {
    val rows = Relational.q01(spark, sf).collect()
    assert(rows.length === 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val filtered = Tables(spark, sf, "lineitem")
      .filter("l_shipdate <= timestamp'2000-12-01'").count()
    assert(total === filtered)
    // sums are positive and avg consistent with sum/count per row
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      val avg = r.getAs[Double]("sum_qty") / r.getAs[Long]("count_order")
      assert(math.abs(avg - r.getAs[Double]("avg_qty")) < 1e-9)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
