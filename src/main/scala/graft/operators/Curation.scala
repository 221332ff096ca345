package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-corpus curation operators — the filtering/weighting layer
  * a 100 TB LLM-data pipeline runs between dedup and tokenization:
  * repetition-based quality rejection (the Gopher rules, Rae et al.
  * 2021 §A1.1), benchmark decontamination (the GPT-3-style n-gram
  * overlap check), and temperature-based mixture reweighting across
  * languages. All three are map-side per document (or one tiny
  * aggregate), so they pipeline into a single pass over the corpus
  * at scale.
  */
object Curation {

  private def wsTokens: Column = expr("regexp_extract_all(text, '\\\\S+', 0)")

  /** q45: repetition-based quality signals per document, after the
    * Gopher repetition rules re-expressed for single-line documents:
    *
    *  - `top2_frac`: occurrences of the most frequent word 2-gram
    *    over total 2-grams (only the count is reported, so ties need
    *    no break and the answer is engine-independent);
    *  - `dup5_frac`: fraction of 5-gram occurrences that are repeats
    *    of an earlier 5-gram, `(total − distinct) / total`;
    *  - `reject`: the Gopher-style verdict at the classic 0.20 /
    *    0.30 thresholds (docs too short to form a 5-gram pass).
    *
    * Map-only over documents: grams never leave their row (no
    * explode-shuffle — the per-doc aggregation happens inside
    * `aggregate`/`array_distinct` in codegen), so at 100 TB this is
    * a pure scan. Each fraction is a single int/int division in
    * double (no float accumulation), hence bit-stable cross-engine.
    */
  def q45(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")))
      .withColumn("w", wsTokens)
    docs
      // sequence(0, n) with n < 0 counts DOWN — short docs must hit
      // the empty-array branch, not a reversed sequence
      .withColumn("g2", expr(
        """CASE WHEN size(w) >= 2 THEN
          |  transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1]))
          |ELSE array() END""".stripMargin))
      .withColumn("g5", expr(
        """CASE WHEN size(w) >= 5 THEN
          |  transform(sequence(0, size(w) - 5),
          |    i -> concat_ws(' ', slice(w, i + 1, 5)))
          |ELSE array() END""".stripMargin))
      .withColumn("n2", size(col("g2")).cast("long"))
      .withColumn("n5", size(col("g5")).cast("long"))
      .withColumn("top2_cnt", expr(
        """CAST(array_max(transform(array_distinct(g2),
          |  g -> size(filter(g2, x -> x = g)))) AS BIGINT)""".stripMargin))
      .withColumn("d5", size(array_distinct(col("g5"))).cast("long"))
      .select(
        col("doc_id"),
        col("n2").as("n_2grams"),
        col("n5").as("n_5grams"),
        when(col("n2") > 0,
          col("top2_cnt").cast("double") / col("n2").cast("double"))
          .otherwise(lit(0.0)).as("top2_frac"),
        when(col("n5") > 0,
          (col("n5") - col("d5")).cast("double") / col("n5").cast("double"))
          .otherwise(lit(0.0)).as("dup5_frac"))
      .withColumn("reject",
        (col("top2_frac") > 0.20) || (col("dup5_frac") > 0.30))
      .orderBy(col("doc_id"))
  }

  val q45Sql: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    list_transform(range(1, len(w)), i -> concat_ws(' ', w[i], w[i+1])) AS g2,
      |    CASE WHEN len(w) >= 5 THEN
      |      list_transform(range(1, len(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))
      |    ELSE [] END AS g5
      |  FROM t),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(g2) AS BIGINT) AS n_2grams,
      |    CAST(len(g5) AS BIGINT) AS n_5grams,
      |    CASE WHEN len(g2) > 0 THEN CAST(list_max(list_transform(
      |        list_distinct(g2), x -> len(list_filter(g2, y -> y = x)))) AS BIGINT)
      |      ELSE 0 END AS top2_cnt,
      |    CAST(len(list_distinct(g5)) AS BIGINT) AS d5
      |  FROM g)
      |SELECT doc_id, n_2grams, n_5grams,
      |  CASE WHEN n_2grams > 0
      |    THEN CAST(top2_cnt AS DOUBLE) / CAST(n_2grams AS DOUBLE)
      |    ELSE 0.0 END AS top2_frac,
      |  CASE WHEN n_5grams > 0
      |    THEN CAST(n_5grams - d5 AS DOUBLE) / CAST(n_5grams AS DOUBLE)
      |    ELSE 0.0 END AS dup5_frac,
      |  (CASE WHEN n_2grams > 0
      |     THEN CAST(top2_cnt AS DOUBLE) / CAST(n_2grams AS DOUBLE)
      |     ELSE 0.0 END) > 0.20
      |  OR (CASE WHEN n_5grams > 0
      |     THEN CAST(n_5grams - d5 AS DOUBLE) / CAST(n_5grams AS DOUBLE)
      |     ELSE 0.0 END) > 0.30 AS reject
      |FROM m
      |ORDER BY doc_id""".stripMargin

  /** Benchmark membership: a deterministic pseudo-eval split — every
    * 97th doc stands in for "the benchmark suite" the corpus must be
    * decontaminated against.
    */
  private val EvalMod = 97
  /** Overlap gram size. Production decontamination uses 8–13-word
    * grams; the synthetic corpus draws ~50-word docs from a tiny
    * vocabulary, so 4 is the window at which collisions actually
    * occur (8 would make the check vacuously empty here).
    */
  private val ContamN = 4

  /** q46: benchmark decontamination — for every train document, how
    * many of its distinct word [[ContamN]]-grams also occur anywhere
    * in the eval set, and the contaminated fraction. This is the
    * GPT-3-style n-gram collision check run before training.
    *
    * Scale shape: the eval side of the join is tiny by construction
    * (benchmarks are KBs, corpora are TBs), so the distinct eval-gram
    * relation is BROADCAST and the train side never shuffles — one
    * scan, map-side explode, broadcast semi-ish join, per-doc
    * re-aggregate on doc_id (AQE-coalesced). Only contaminated docs
    * survive the final filter.
    */
  def q46(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")))
      .withColumn("w", wsTokens)
      .filter(size(col("w")) >= ContamN) // guard before sequence()
      .withColumn("g", expr(
        s"""array_distinct(transform(sequence(0, size(w) - $ContamN),
           |  i -> concat_ws(' ', slice(w, i + 1, $ContamN))))""".stripMargin))
      .withColumn("ng", size(col("g")).cast("long"))
    val evalGrams = docs.filter(col("doc_id") % EvalMod === 0)
      .select(explode(col("g")).as("gram")).distinct()
    val train = docs.filter(col("doc_id") % EvalMod =!= 0)
      .select(col("doc_id"), col("ng"), explode(col("g")).as("gram"))
    train.join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"), col("ng"))
      .agg(count(lit(1)).as("contaminated"))
      .select(col("doc_id"), col("ng").as("n_grams"), col("contaminated"),
        (col("contaminated").cast("double") / col("ng").cast("double"))
          .as("contam_frac"))
      .orderBy(col("doc_id"))
  }

  val q46Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
       |g AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, len(w) - ${ContamN - 2}),
       |    i -> concat_ws(' ', list_slice(w, i, i + ${ContamN - 1})))) AS g
       |  FROM t WHERE len(w) >= $ContamN),
       |ev AS (
       |  SELECT DISTINCT unnest(g) AS gram FROM g WHERE doc_id % $EvalMod = 0),
       |tr AS (
       |  SELECT doc_id, len(g) AS ng, unnest(g) AS gram FROM g
       |  WHERE doc_id % $EvalMod <> 0)
       |SELECT tr.doc_id, CAST(ANY_VALUE(tr.ng) AS BIGINT) AS n_grams,
       |  COUNT(*) AS contaminated,
       |  CAST(COUNT(*) AS DOUBLE) / CAST(ANY_VALUE(tr.ng) AS DOUBLE)
       |    AS contam_frac
       |FROM tr JOIN ev ON tr.gram = ev.gram
       |GROUP BY tr.doc_id
       |ORDER BY tr.doc_id""".stripMargin

  /** q47: temperature-based language-mixture reweighting — the
    * multilingual-corpus resampling weights (p_l^α / Σ p^α, α = 1/2)
    * used to up-sample low-resource languages when drawing a training
    * mix. Emits per language: doc count, raw share, tempered weight,
    * and the expected number of docs drawn in a 10 000-doc sample.
    *
    * One narrow aggregate (langs ≪ partitions) — the corpus scan
    * reads ONE column. α is exactly 1/2 because sqrt is correctly
    * rounded in IEEE-754 (pow is not, and differs across libm
    * implementations); the normalization denominator is summed in
    * the exact integer domain, so results are bit-stable at any
    * parallelism and match DuckDB exactly.
    */
  def q47(spark: SparkSession, dir: String,
      sampleSize: Int = 10000): DataFrame = {
    val counts = Tables(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("total"))
    val scored = counts.crossJoin(broadcast(total))
      .withColumn("p_raw",
        col("n_docs").cast("double") / col("total").cast("double"))
      .withColumn("sp", sqrt(col("p_raw")))
    // denominator Σ√p summed in the integer domain: floor to 1e-15
    // (doubles carry <16 significant digits here, so the loss is one
    // part in 10^14), sum exact BIGINTs — associative, order-proof,
    // and identical in both engines, unlike decimal casts of doubles
    // whose >17th digit differs by conversion route
    val denom = scored.agg(
      sum(floor(col("sp") * lit(1e15)).cast("long")).as("denom_scaled"))
    scored.crossJoin(broadcast(denom))
      .withColumn("weight",
        col("sp") / (col("denom_scaled").cast("double") / lit(1e15)))
      .select(col("lang"), col("n_docs"), col("p_raw"), col("weight"),
        (col("weight") * sampleSize).as("expected_docs"))
      .orderBy(col("lang"))
  }

  val q47Sql: String =
    """WITH c AS (
      |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
      |t AS (SELECT SUM(n_docs) AS total FROM c),
      |s AS (
      |  SELECT lang, n_docs,
      |    CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE) AS p_raw,
      |    sqrt(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE)) AS sp
      |  FROM c CROSS JOIN t),
      |d AS (SELECT SUM(CAST(floor(sp * 1e15) AS BIGINT)) AS denom FROM s)
      |SELECT lang, n_docs, p_raw,
      |  sp / (CAST(denom AS DOUBLE) / 1e15) AS weight,
      |  sp / (CAST(denom AS DOUBLE) / 1e15) * 10000 AS expected_docs
      |FROM s CROSS JOIN d
      |ORDER BY lang""".stripMargin
}
