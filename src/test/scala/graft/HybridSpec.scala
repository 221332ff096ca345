package graft

import org.apache.spark.sql.functions._

import graft.operators.{Hybrid, Rag, Search, Similarity}

class HybridSpec extends SparkSpec {

  /** Independent driver-side RRF of two rank lists — an imperative
    * map-based fusion (not the operator's union + conditional-agg
    * plan), same arithmetic contract: contribution
    * floor(1e9/(60+rank)) as a long, ties to the smallest doc_id.
    */
  private def fuseRef(lex: Seq[(Long, Long, Long)],
      dense: Seq[(Long, Long, Long)], topK: Int)
      : Seq[(Long, Long, Long, Long, Option[Long], Option[Long])] = {
    def c(r: Long) = math.floor(1e9 / (Hybrid.RrfK.toDouble + r)).toLong
    val lexM = lex.map(t => (t._1, t._2) -> t._3).toMap
    val denseM = dense.map(t => (t._1, t._2) -> t._3).toMap
    (lexM.keySet ++ denseM.keySet).toSeq
      .map { k =>
        val lr = lexM.get(k)
        val dr = denseM.get(k)
        (k._1, k._2,
          lr.map(c).getOrElse(0L) + dr.map(c).getOrElse(0L), lr, dr)
      }
      .groupBy(_._1).toSeq
      .flatMap { case (_, g) =>
        g.sortBy(t => (-t._3, t._2)).take(topK).zipWithIndex
          .map { case ((q, d, s, lr, dr), i) => (q, i + 1L, d, s, lr, dr) }
      }
      .sortBy(t => (t._1, t._2))
  }

  private def fusedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))
    }.toSeq

  private def armRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("rrfFuse: hand-computed fusion — overlap wins, one-arm docs keep NULL ranks, ties break to smallest doc_id") {
    import spark.implicits._
    // q1: doc 11 in both arms (ranks 2,1) must beat single-arm docs;
    // q2: docs 20/21 tie exactly (rank 1 in one arm each) → doc_id order
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 11L, 1L), (1L, 12L, 2L), (2L, 21L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val got = fusedRows(Hybrid.rrfFuse(Seq("lex" -> lex, "dense" -> dense)))
    val c1 = 16393442L // floor(1e9/61)
    val c2 = 16129032L // floor(1e9/62)
    assert(got === Seq(
      (1L, 1L, 11L, c1 + c2, Some(2L), Some(1L)),
      (1L, 2L, 10L, c1, Some(1L), None),
      (1L, 3L, 12L, c2, None, Some(2L)),
      (2L, 1L, 20L, c1, Some(1L), None),
      (2L, 2L, 21L, c1, None, Some(1L))))
  }

  test("rrfFuse truncates to topK per query") {
    import spark.implicits._
    val lex = (1L to 8L).map(d => (1L, d, d)).toDF("query_id", "doc_id", "rank")
    val dense = spark.emptyDataset[(Long, Long, Long)]
      .toDF("query_id", "doc_id", "rank")
    val got = fusedRows(Hybrid.rrfFuse(Seq("lex" -> lex, "dense" -> dense), topK = 3))
    assert(got.map(_._3) === Seq(1L, 2L, 3L))
    assert(got.map(_._2) === Seq(1L, 2L, 3L))
  }

  test("q110 equals an independent driver fusion of its two arm lists bit-for-bit") {
    val lex = armRows(Search.bm25MoreLikeThis(
        Tables(spark, sf, "documents"), Similarity.QueryIds)
      .select(col("query_id"), col("doc_id"), col("rank")))
    val dense = armRows(Similarity.q40(spark, sf)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").cast("long")))
    assert(lex.nonEmpty && dense.nonEmpty)
    val got = fusedRows(Hybrid.q110(spark, sf))
    assert(got === fuseRef(lex, dense, Hybrid.FusedTopK))
  }

  test("more-like-this lexical arm never retrieves the query doc itself") {
    val lex = armRows(Search.bm25MoreLikeThis(
        Tables(spark, sf, "documents"), Similarity.QueryIds)
      .select(col("query_id"), col("doc_id"), col("rank")))
    assert(lex.nonEmpty)
    assert(lex.forall { case (q, d, _) => q != d })
  }

  test("fuseLexicalDense equals an independent fusion of q105 and doc-rolled q109") {
    val lex = armRows(Search.q105(spark, sf)
      .select(col("query_id"), col("doc_id"), col("rank")))
    // independent dense roll-up: best chunk cosine per doc, ranked
    // (cosine desc, doc_id) — the max-chunk pooling contract
    val dense = Rag.q109(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(6)))
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((q, d), g) => (q, d, g.map(_._3).max) }
      .groupBy(_._1).toSeq
      .flatMap { case (_, g) =>
        g.sortBy(t => (-t._3, t._2)).take(Rag.RagTopK).zipWithIndex
          .map { case ((q, d, _), i) => (q, d, i + 1L) }
      }
    assert(lex.nonEmpty && dense.nonEmpty)
    val got = fusedRows(Hybrid.fuseLexicalDense(spark, sf))
    assert(got === fuseRef(lex, dense, Hybrid.FusedTopK))
  }

  test("q110 plan: fused top-k compiles to WindowGroupLimit") {
    val p = Hybrid.q110(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }
}
