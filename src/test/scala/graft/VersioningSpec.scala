package graft

import org.apache.spark.sql.functions._

import graft.operators.Versioning

class VersioningSpec extends SparkSpec {

  private def docsOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("corpusDiff classifies a planted add/remove/change set exactly") {
    val a = docsOf(Seq(
      1L -> "alpha", 2L -> "bravo", 3L -> "charlie", 4L -> "delta"))
    val b = docsOf(Seq(
      1L -> "alpha",          // unchanged — must not be emitted
      2L -> "bravo edited",   // changed
      4L -> "delta",          // unchanged
      9L -> "echo"))          // added; 3 is removed
    val got = Versioning.corpusDiff(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 9L -> "added"))
  }

  test("diff of a corpus against itself is empty") {
    val docs = Tables(spark, sf, "documents")
    assert(Versioning.corpusDiff(docs, docs).count() === 0L)
  }

  test("q112 matches a driver recomputation over the real corpus") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bTexts = docs.collect {
      case (id, t) if id % 17 != 3 =>
        id -> (if (id % 23 == 5) t + " rev2" else t)
    } ++ docs.collect {
      case (id, t) if id % 29 == 7 => (id + 1000000000L) -> (t + " new")
    }
    val want = ((docs.keySet ++ bTexts.keySet).toSeq.collect {
      case id if !bTexts.contains(id) => id -> "removed"
      case id if !docs.contains(id) => id -> "added"
      case id if docs(id) != bTexts(id) => id -> "changed"
    }).toMap
    val got = Versioning.q112(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === want)
    // all three classes must occur on the real corpus
    assert(Set("added", "removed", "changed").subsetOf(got.values.toSet))
  }

  test("diff-detected delta drives the incremental family: detect + apply equals full recompute") {
    import graft.operators.Curation
    def verdicts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val yesterday = docs.filter(col("doc_id") % 7 =!= 0)
    // an append-only nightly: the diff must see pure additions, and
    // its delta IS the batch the incremental operator folds in
    val delta = Versioning.corpusDiff(yesterday, docs)
    assert(delta.select(col("status")).distinct().collect()
      .map(_.getString(0)).toSeq === Seq("added"))
    val batch = docs.join(delta.select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val state = Curation.lineDedupState(yesterday)
    val nightly = verdicts(
      Curation.lineVerdictsFrom(yesterday, state.segments))
    val (_, reV) = Curation.lineDedupIncrement(state, batch)
    assert(nightly ++ verdicts(reV) === verdicts(Curation.lineDedupOn(docs)))
  }

  test("diff exchanges are string-free: document text never shuffles") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    val out = Versioning.q112(spark, sf)
    out.collect() // materialize so AQE's final plan exists
    def exchanges(p: SparkPlan): Seq[Exchange] = p.collect {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case q: QueryStageExec => exchanges(q.plan)
      case e: Exchange => Seq(e)
    }.flatten
    val ex = exchanges(out.queryExecution.executedPlan)
    assert(ex.nonEmpty, out.queryExecution.executedPlan.toString)
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    // the status column is emitted AFTER the join, so even the
    // result exchange carries only (doc_id, 8-byte hashes) — but the
    // house rule targets derived (hash/range) exchanges, and the
    // final orderBy legitimately range-partitions the KB-sized
    // (doc_id, status) delta
    ex.filterNot(_.outputPartitioning
        .isInstanceOf[RoundRobinPartitioning])
      .filterNot(_.output.exists(_.name == "status"))
      .foreach { e =>
        assert(!e.output.exists(_.dataType ==
            org.apache.spark.sql.types.StringType),
          s"string-typed exchange: ${e.output.mkString(", ")}")
      }
  }
}
