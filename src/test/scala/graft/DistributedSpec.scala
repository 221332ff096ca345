package graft

import org.apache.spark.sql.functions._
import graft.operators.Distributed

class DistributedSpec extends SparkSpec {

  test("orderedPrefix: empty input, single row, and duplicate weights stay exact") {
    import spark.implicits._
    // empty relation → empty result, no crash on the offsets collect
    val empty = Seq.empty[(Long, Long)].toDF("k", "w")
    assert(Distributed.orderedPrefix(empty, Seq(col("k")), col("w"))
      .count() === 0L)
    // single row → rank 1, cum = weight
    val one = Seq((7L, 42L)).toDF("k", "w")
    val r1 = Distributed.orderedPrefix(one, Seq(col("k")), col("w")).head()
    assert(r1.getAs[Long]("rank") === 1L)
    assert(r1.getAs[Long]("cum_w") === 42L)
    // many rows with equal weights and a total-order key: ranks are a
    // permutation-free 1..n and the running sum is exact at every row
    val n = 1000
    val df = spark.range(n).select(col("id").as("k"), lit(3L).as("w"))
    val rows = Distributed.orderedPrefix(df, Seq(col("k")), col("w"))
      .orderBy("rank").collect()
    assert(rows.length === n)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") === i + 1L)
      assert(r.getAs[Long]("cum_w") === (i + 1L) * 3L)
      assert(r.getAs[Long]("k") === i.toLong) // order preserved
    }
  }
}
