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

  test("q92 CDC merge: latest version wins, verdicts partition the keys, no window in the plan") {
    import org.apache.spark.sql.functions.col
    val df = graft.operators.RelationalMore.q92(spark, sf)
    val rows = df.collect()
    val snapKeys = Tables(spark, sf, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("o_orderkey")).toSet.size === rows.length)
    rows.foreach { r =>
      val k = r.getAs[Long]("o_orderkey")
      val v = r.getAs[Long]("version")
      val op = r.getAs[String]("op")
      if (k < 0L) { // derived insert keys (negative mirror space)
        assert(op === "inserted" && v === 1L && r.getAs[String]("o_orderstatus") === "N")
        assert((-k - 1L) % 37 === 5L)
      } else if (k % 20 === 3) {
        assert(op === "updated" && v === 2L && r.getAs[String]("o_orderstatus") === "F")
      } else if (k % 10 === 3) {
        assert(op === "updated" && v === 1L && r.getAs[String]("o_orderstatus") === "P")
      } else {
        assert(op === "unchanged" && v === 0L)
        assert(snapKeys.contains(k))
      }
    }
    // every snapshot key survives the merge
    assert(snapKeys.subsetOf(rows.map(_.getAs[Long]("o_orderkey")).toSet))
    // latest-wins is an argmax AGGREGATE with map-side partial
    // combine — no window and no SortAggregate PLAN (struct-max would
    // silently plan one; past the object-agg fallback threshold the
    // runtime may still merge sorted WITHIN a partition, which is
    // fine — the shuffle stays bounded either way)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"merge must not need a window:\n$plan")
    assert(!plan.contains("SortAggregate"), s"merge must not sort-aggregate:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), "expected object-hash-aggregate merge")
  }

  test("all declared queries run at sf0.001 and every oracle key exists") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      df.count() // materialize — catches analysis + runtime errors
    }
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q05 window rank: ≤5 rows per priority, rank ordered by price desc") {
    val rows = operators.Relational.q05(spark, sf).collect()
    rows.groupBy(_.getAs[String]("o_orderpriority")).foreach { case (_, g) =>
      assert(g.length <= 5)
      val prices = g.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("o_totalprice"))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q18 sessionize: session bounds ordered, counts positive") {
    val rows = operators.Relational.q18(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("session_start")
        .after(r.getAs[java.sql.Timestamp]("session_end")))
      assert(r.getAs[Long]("n_events") > 0)
    }
  }
}
