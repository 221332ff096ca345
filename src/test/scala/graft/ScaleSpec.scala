package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale-technique evidence (SURVEY §5): bucketed co-located joins and
  * salted skew joins behave as designed.
  */
class ScaleSpec extends SparkSpec {

  test("bucketed tables join with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("graft_wh")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Tables(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
    Tables(spark, sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b").mode("overwrite").saveAsTable("o_b")
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("o_totalprice"), col("l_quantity"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join should be co-located, but shuffled:\n$plan")
    assert(joined.count() === Tables(spark, sf, "lineitem").count())
  }

  test("date-partitioned write prunes partitions at read time") {
    val out = Files.createTempDirectory("graft_part").toString
    Tables(spark, sf, "events")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(out)
    val oneDay = spark.read.parquet(out)
      .filter(col("day") === "2024-01-05")
    val scan = oneDay.queryExecution.executedPlan.toString
    // partition pruning is visible as a PartitionFilters entry and the
    // scan must NOT read every partition directory
    assert(scan.contains("PartitionFilters"), scan)
    val allDays = spark.read.parquet(out).select("day").distinct().count()
    assert(allDays > 1, "partitioned write produced a single partition")
    val prunedFiles = oneDay.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(prunedFiles === Some(1),
      s"expected exactly 1 of $allDays partitions after pruning, got $prunedFiles")
    // correctness of the pruned read
    val expect = Tables(spark, sf, "events")
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(oneDay.count() === expect)
  }

  test("salted join equals the plain join row-for-row") {
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, o, "l_orderkey", salts = 8)
    assert(salted.count() === plain.count())
    val a = plain.groupBy("l_orderkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = salted.groupBy("l_orderkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("runtime bloom filter injects on a selectively-filtered shuffle join") {
    // the build side's selective predicate becomes a bloom filter
    // probed on the fact side BEFORE the shuffle — at 100 TB this
    // drops most fact rows at the scan instead of shuffling them
    val restore = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables(spark, sf, "lineitem")
      val o = Tables(spark, sf, "orders").filter(col("o_totalprice") > 400000.0)
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"), plan)
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join spreads a planted hot key across partitions where the plain join cannot") {
    import spark.implicits._
    // q37's boundary-join shape: corpus postings with ONE hot shingle
    // present in every doc (the stop-gram case), batch postings small
    val hot = -1L
    val corpus = ((1 to 2000).map(i => (i.toLong, hot)) ++
      (1 to 2000).map(i => (i.toLong, i.toLong)))
      .toDF("cid", "h")
    val batch = Seq((9001L, hot), (9002L, hot), (9002L, 17L)).toDF("bid", "h")
    def hotSpread(joined: org.apache.spark.sql.DataFrame): Long = joined
      .filter(col("h") === hot)
      .select(spark_partition_id().as("pid")).distinct().count()
    // measure the SHUFFLE placement: AQE's small-partition coalescing
    // would legitimately fuse this toy volume back into one partition,
    // hiding exactly the thing under test
    val restore = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.get(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try {
      val plainSpread = hotSpread(corpus.join(batch, Seq("h")))
      val saltedSpread = hotSpread(Skew.saltedJoin(corpus, batch, "h", salts = 8))
      assert(plainSpread === 1L,
        s"fixture broken: plain join spread the hot key over $plainSpread partitions")
      assert(saltedSpread >= 3L,
        s"salted join left the hot key in $saltedSpread partitions")
      // row-for-row equivalence under the planted skew
      val a = corpus.join(batch, Seq("h")).groupBy("cid", "bid").count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val b = Skew.saltedJoin(corpus, batch, "h", salts = 8)
        .groupBy("cid", "bid").count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(a === b)
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("keyHistogram surfaces the heaviest keys in order") {
    val h = Skew.keyHistogram(Tables(spark, sf, "lineitem"), "l_suppkey", 5)
      .collect()
    assert(h.length === 5)
    val counts = h.map(_.getAs[Long]("n"))
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y })
  }
}
