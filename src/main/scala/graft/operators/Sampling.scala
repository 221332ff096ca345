package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sampling operators — the split/subset machinery of a training-data
  * pipeline. The content-hash split (q58) is fully deterministic and
  * oracle-checked; the seeded stratified sample (q59) is
  * reproducible-by-seed but engine-specific, so it's rows-only with a
  * spec bounding per-stratum fractions.
  */
object Sampling {

  /** q58: deterministic content-hash split — bucket = first 8 hex
    * chars of md5(text) mod 100, keep buckets < 10 (a stable 10%
    * sample / train-test split that survives re-runs, repartitions and
    * engine swaps, because it depends only on row CONTENT). Map-only:
    * no shuffle, pipelines into the next stage; at 100 TB this is the
    * only sane way to split — never `rand()`, which resamples per
    * retry/speculative task.
    */
  def q58(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long") % 100)
          .as("bucket"))
      .filter(col("bucket") < 10)
      .orderBy(col("doc_id"))

  val q58Sql: String =
    """SELECT doc_id, lang,
      |  CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 AS bucket
      |FROM documents
      |WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 10
      |ORDER BY doc_id""".stripMargin

  /** q59: seeded stratified sample — per-language fractions via
    * `sampleBy` (Bernoulli per stratum, seed-reproducible). Scale
    * shape: map-only filter, no shuffle, no driver collection; the
    * fraction map is a tiny broadcast. Engine-specific RNG ⇒
    * rows-only; SamplingSpec asserts reproducibility and fraction
    * tolerance.
    */
  def q59(spark: SparkSession, dir: String,
      fractions: Map[String, Double] = Map(
        "en" -> 0.5, "es" -> 0.25, "de" -> 0.25, "fr" -> 0.1, "zh" -> 0.1),
      seed: Long = 42L): DataFrame =
    Tables(spark, dir, "documents")
      .stat.sampleBy("lang", fractions, seed)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
}
