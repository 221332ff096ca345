package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Hybrid retrieval fusion — combine a LEXICAL and a DENSE ranking of
  * the same queries into one list via reciprocal-rank fusion
  * (RRF, Cormack/Clarke/Büttcher SIGIR '09): each arm contributes
  * 1/(K + rank) for every (query, doc) it ranks, and docs are
  * re-ranked by the summed contribution. RRF is pure rank arithmetic —
  * it needs no score calibration between arms (BM25 scores and cosines
  * live on incomparable scales), which is exactly why it is the
  * standard first fusion in production hybrid search.
  *
  * Determinism: contributions are `floor(1e9 / (K + rank))` int64s
  * (the q105 scaled-contribution trick) summed exactly, so the fused
  * ordering is bit-identical on every engine — the double division is
  * a single IEEE op both engines perform identically, and everything
  * after it is integer. Ties break to the smallest doc_id.
  *
  * Two compositions ship:
  *
  *  - [[q110]]: MORE-LIKE-THIS hybrid over the corpus tables — the
  *    query is a document (ids = [[Similarity.QueryIds]], which exist
  *    in BOTH `documents` and `embeddings`); the lexical arm is
  *    [[Search.bm25MoreLikeThis]] (the query doc's term set, self
  *    excluded), the dense arm is [[Similarity.q40]]'s brute-force
  *    embedding cosine (self excluded). Both arms are exactly
  *    SQL-expressible, so the WHOLE fusion is oracle-checked
  *    hash-green — the composed-operator proof.
  *  - [[fuseLexicalDense]]: the q105 (BM25 text queries) × q109
  *    (feature-hash dense chunks, rolled up to docs) fusion over the
  *    SHARED [[Search.SearchQueries]] workload — the production
  *    shape. The dense arm's quantizer is a training artifact (not
  *    SQL), so this composition is spec-asserted against an
  *    independent in-driver RRF of the two lists instead.
  *
  * Scale shape: each arm is its own already-audited plan (corpus
  * scanned once per arm, queries broadcast, top-k as
  * WindowGroupLimit); fusion itself touches only the arms' top-k
  * OUTPUT lists — ≤ queries × topK × arms rows, KBs at any corpus
  * size — so the fused re-rank adds one KB-sized hash aggregate and
  * window, never a corpus-sized shuffle.
  */
object Hybrid {

  /** RRF smoothing constant — 60, the SIGIR '09 setting virtually all
    * production fusions keep: small enough that rank 1 dominates,
    * large enough that a doc ranked ~10 by BOTH arms beats a doc
    * ranked 1 by only one.
    */
  val RrfK = 60

  /** Fused results per query. */
  val FusedTopK = 10

  /** Contribution scale: floor(1e9 / (K + rank)) int64s. */
  private val RrfScale = 1e9

  /** Fuse named rank lists. Each arm carries `(query_id, doc_id,
    * rank)` (any extra columns ignored); the output carries the fused
    * `rank`, the exact `rrf_scaled` score, and each arm's original
    * rank as `<arm>_rank` (NULL where that arm did not retrieve the
    * doc) — the provenance a serving layer shows as "why this hit".
    *
    * One union + one hash aggregate over ≤ Σ|arm| rows (KBs): the
    * per-arm rank columns come back as conditional MAX — no join
    * chain, no shuffle beyond the KB-sized lists.
    */
  def rrfFuse(arms: Seq[(String, DataFrame)],
      topK: Int = FusedTopK): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one arm")
    val tagged = arms.map { case (name, df) =>
      df.select(col("query_id"), col("doc_id"), lit(name).as("arm"),
        col("rank").cast("long").as("r"))
    }.reduce(_ unionByName _)
    val armRank = arms.map { case (name, _) =>
      max(when(col("arm") === name, col("r"))).as(s"${name}_rank")
    }
    val aggs = sum(col("c")).as("rrf_scaled") +: armRank
    val scored = tagged
      .withColumn("c", floor(lit(RrfScale) /
        (lit(RrfK).cast("double") + col("r").cast("double"))).cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_scaled").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id") +: col("rank") +: col("doc_id") +:
        col("rrf_scaled") +: arms.map { case (name, _) =>
          col(s"${name}_rank") }: _*)
      .orderBy(col("query_id"), col("rank"))
  }

  /** q110: the fully-oracled more-like-this hybrid — for each query
    * doc, RRF-fuse the BM25 ranking of its term set with the cosine
    * ranking of its embedding. Output `(query_id, rank, doc_id,
    * rrf_scaled, lex_rank, dense_rank)`.
    *
    * The dense arm covers only docs present in `embeddings` (a strict
    * subset of `documents` at some scale factors) — exactly the
    * production asymmetry RRF absorbs: lexical-only docs simply carry
    * a NULL dense_rank.
    */
  def q110(spark: SparkSession, dir: String): DataFrame = {
    val lex = Search.bm25MoreLikeThis(
        Tables(spark, dir, "documents"), Similarity.QueryIds)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val dense = Similarity.q40(spark, dir)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").cast("long").as("rank"))
    rrfFuse(Seq("lex" -> lex, "dense" -> dense))
  }

  val q110Sql: String = {
    val ids = Similarity.QueryIds.mkString(", ")
    s"""WITH tf AS (
       |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
       |    SELECT doc_id,
       |      CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS dl,
       |      unnest(regexp_extract_all(text, '\\S+')) AS term
       |    FROM documents) x
       |  GROUP BY doc_id, dl, term),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
       |      AS total_len
       |  FROM documents),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |qt AS (
       |  SELECT doc_id AS query_id, term FROM tf
       |  WHERE doc_id IN ($ids)),
       |contrib AS (
       |  SELECT qt.query_id, tf.doc_id,
       |    CAST(floor(
       |      (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) *
       |      (CAST(tf AS DOUBLE) * (${Search.BmK1} + 1.0)) /
       |      (CAST(tf AS DOUBLE) +
       |        ${Search.BmK1} * (1.0 - ${Search.BmB} + ${Search.BmB} *
       |          (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE) /
       |           CAST(total_len AS DOUBLE)))) *
       |      1e9) AS BIGINT) AS contrib_scaled
       |  FROM tf
       |  JOIN qt USING (term)
       |  JOIN dfreq USING (term)
       |  CROSS JOIN stats
       |  WHERE tf.doc_id <> qt.query_id),
       |lex_scored AS (
       |  SELECT query_id, doc_id,
       |    CAST(SUM(contrib_scaled) AS BIGINT) AS score_scaled
       |  FROM contrib GROUP BY query_id, doc_id),
       |lex AS (
       |  SELECT query_id, doc_id, r FROM (
       |    SELECT query_id, doc_id,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY score_scaled DESC, doc_id) AS BIGINT) AS r
       |    FROM lex_scored) x
       |  WHERE r <= ${Search.SearchTopK}),
       |e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                          CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM e
       |      WHERE vec_id IN ($ids)),
       |dense_scored AS (
       |  SELECT q.query_id, e.vec_id AS doc_id,
       |    list_dot_product(q.qv, e.v) / (e.nrm * q.qnrm) AS cosine
       |  FROM e JOIN q ON e.vec_id <> q.query_id),
       |dense AS (
       |  SELECT query_id, doc_id, r FROM (
       |    SELECT query_id, doc_id,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, doc_id) AS BIGINT) AS r
       |    FROM dense_scored) x
       |  WHERE r <= ${Similarity.K}),
       |fused AS (
       |  SELECT query_id, doc_id, r, 'lex' AS arm FROM lex
       |  UNION ALL
       |  SELECT query_id, doc_id, r, 'dense' AS arm FROM dense),
       |scored AS (
       |  SELECT query_id, doc_id,
       |    CAST(SUM(CAST(floor(1e9 / ($RrfK.0 + r)) AS BIGINT))
       |      AS BIGINT) AS rrf_scaled,
       |    MAX(CASE WHEN arm = 'lex' THEN r END) AS lex_rank,
       |    MAX(CASE WHEN arm = 'dense' THEN r END) AS dense_rank
       |  FROM fused GROUP BY query_id, doc_id),
       |ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rrf_scaled DESC, doc_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT query_id, rank, doc_id, rrf_scaled, lex_rank, dense_rank
       |FROM ranked
       |WHERE rank <= $FusedTopK
       |ORDER BY query_id, rank""".stripMargin
  }

  /** The PRODUCTION hybrid: q105's BM25 list × q109's dense chunk
    * list, over the shared [[Search.SearchQueries]] workload. The
    * dense arm rolls chunks up to documents first — a doc's dense
    * rank is its BEST chunk's cosine (max-chunk pooling, ties to the
    * smallest doc_id) — because fusion must rank the same unit on
    * both sides. Quantizer training makes this arm non-SQL, so the
    * composition is spec-asserted against an independent in-driver
    * fusion of the two lists ([[graft.HybridSpec]]) rather than
    * oracled.
    */
  def fuseLexicalDense(spark: SparkSession, dir: String): DataFrame = {
    val lex = Search.q105(spark, dir)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("best_cosine").desc, col("doc_id"))
    val dense = Rag.q109(spark, dir)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("cosine")).as("best_cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= Rag.RagTopK)
      .select(col("query_id"), col("doc_id"), col("rank"))
    rrfFuse(Seq("lex" -> lex, "dense" -> dense))
  }
}
