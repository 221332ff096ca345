package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus snapshot versioning — the nightly-delta operator a 100 TB
  * pipeline needs so downstream stages (dedup state, indexes, LMs,
  * manifests) can fold in a day's change instead of reprocessing the
  * world: given two corpus versions, classify every document as
  * `added` / `removed` / `changed` (unchanged docs are not emitted —
  * at petabyte scale the delta is the small output, the identity the
  * overwhelming bulk).
  *
  * Scale shape: document TEXT never enters an exchange. Each side
  * reduces map-side to `(doc_id, fingerprint64(text))` — 16 bytes a
  * row — and the classification is one full-outer join on `doc_id`
  * over those narrow relations (the q73/q102 8-byte-key discipline).
  * Equality of fingerprints stands in for equality of text: a
  * misclassification needs a 64-bit collision between two versions of
  * the SAME doc_id — odds 2⁻⁶⁴ per changed doc, the accepted contract
  * everywhere else fingerprint64 keys a join. The incremental-
  * maintenance consumers ([[Curation.cutSpanIncrement]],
  * [[Search]]`.appendBmIndex`, [[Dedup]]`.ccIncrement`, ivf_append)
  * take exactly this delta as their daily batch.
  */
object Versioning {

  /** The derived version-B corpus for [[q112]]'s self-contained query
    * contract (no second snapshot dir exists in the test layout):
    * deterministic doc_id-keyed edits exercising all three diff
    * classes — drop `doc_id % 17 = 3` (removals), append " rev2" to
    * the text of `doc_id % 23 = 5` (changes), and clone
    * `doc_id % 29 = 7` to `doc_id + 10⁹` with " new" appended
    * (additions; test ids stay far below 10⁹ so clones never collide).
    * Mirrored verbatim in the DuckDB oracle.
    */
  def versionB(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 17 =!= 3)
      .withColumn("text",
        when(col("doc_id") % 23 === 5, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .unionByName(
        docs.filter(col("doc_id") % 29 === 7)
          .withColumn("doc_id", col("doc_id") + lit(1000000000L))
          .withColumn("text", concat(col("text"), lit(" new"))))

  /** The diff: `(doc_id, status)` for every doc that is not
    * bit-identical across versions, `status ∈ {added, removed,
    * changed}`. Both sides shrink to 16-byte rows before the one
    * full-outer shuffle (see the object doc).
    */
  def corpusDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val spark = a.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val ha = a.select(col("doc_id"),
      call_function("fingerprint64", col("text")).as("ha"))
    val hb = b.select(col("doc_id"),
      call_function("fingerprint64", col("text")).as("hb"))
    ha.join(hb, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("hb").isNull, "removed")
          .when(col("ha").isNull, "added")
          .when(col("ha") =!= col("hb"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"))
  }

  /** q112: snapshot diff of the corpus against its derived version-B
    * — every added/removed/changed doc with its class.
    */
  def q112(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    corpusDiff(docs, versionB(docs)).orderBy(col("doc_id"))
  }
}
