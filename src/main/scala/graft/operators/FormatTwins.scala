package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.sources.GraftIO

/** Scan-layer fidelity for non-parquet sources (SURVEY §7a).
  *
  * Every other oracle query reads parquet only, so a bug in the CSV or
  * JSON scan path (type coercion, quoting, escaping, timestamp
  * parsing) would never trip the correctness gate. The reference
  * engine moves arbitrary files (upload_file.py:50-133 does not care
  * about format), so graft's claim to cover it includes reading what
  * it wrote. These queries round-trip a table through the text format
  * under test — write twin, read twin with an explicit schema, then
  * aggregate — while the DuckDB oracle computes the identical
  * aggregate over the original parquet. A single corrupted value,
  * mis-parsed timestamp, or broken quote/escape changes the hash.
  *
  * Scale note: the twin write is test scaffolding, not the operator;
  * the operator under test is the *scan* (schema-explicit,
  * projection-pruned — see PlanSpec). At 100 TB you would read CSV the
  * same way: explicit schema (no inferSchema pre-pass over the data),
  * pruned columns, parallel per-file splits.
  */
object FormatTwins {

  /** Symmetric write/read timestamp format — micros, no zone (session
    * zone on both sides of the round trip, same JVM). Set for both the
    * zoned and NTZ writers: parquet `timestamp[ms]` with
    * isAdjustedToUTC=false comes back as TIMESTAMP_NTZ under Spark's
    * default `inferTimestampNTZ`, and the CSV writer picks
    * `timestampNTZFormat` for those columns.
    */
  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val TsOpts = Map(
    "timestampFormat" -> TsFmt, "timestampNTZFormat" -> TsFmt)

  /** Twin files live under java.io.tmpdir keyed by the sf dir so scale
    * factors never collide and reruns overwrite in place.
    */
  private def twinPath(dir: String, name: String): String = {
    val key = dir.replaceAll("[^a-zA-Z0-9.]", "_")
    s"${sys.props("java.io.tmpdir")}/graft-twins/$key/$name"
  }

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  private val lineitemTwinCols = Seq(
    "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
    "l_discount", "l_returnflag", "l_linestatus", "l_shipdate")

  /** q90: CSV scan fidelity. Doubles round-trip through Java's
    * shortest-repr `Double.toString`, timestamps through an explicit
    * symmetric format, strings through RFC-4180 quoting. min/max of
    * the timestamp and a decimal sum of each double column appear in
    * the output so every column of the twin is load-bearing.
    */
  def q90(spark: SparkSession, dir: String): DataFrame = {
    val path = twinPath(dir, "lineitem_csv")
    val src = Tables(spark, dir, "lineitem")
      .select(lineitemTwinCols.map(col): _*)
    GraftIO.write(src, "csv", path, TsOpts)
    // Schema comes from the parquet source, not a hand-written twin —
    // explicit (no inferSchema data pre-pass) and type-exact by
    // construction, including TIMESTAMP vs TIMESTAMP_NTZ.
    spark.read.schema(src.schema)
      .option("header", "true").options(TsOpts)
      .csv(path)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_discount")).as("sum_disc"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        sum(col("l_orderkey")).as("sum_okey"),
        sum(col("l_linenumber").cast("long")).as("sum_lineno"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q90Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
      |  MIN(l_shipdate) AS min_ship,
      |  MAX(l_shipdate) AS max_ship,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
      |  CAST(SUM(l_linenumber) AS BIGINT) AS sum_lineno,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q91: JSON-lines scan fidelity over `documents` — the one table
    * whose text column holds arbitrary content (newlines, quotes,
    * unicode) that CSV would mangle and JSON must escape exactly.
    * `COUNT(DISTINCT text)` makes the round trip byte-exact: any
    * escape bug that perturbs even one character splits or merges
    * distinct groups and breaks the hash.
    */
  def q91(spark: SparkSession, dir: String): DataFrame = {
    val path = twinPath(dir, "documents_json")
    val src = Tables(spark, dir, "documents")
    GraftIO.write(src, "json", path)
    spark.read.schema(src.schema).json(path)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"),
        sum(length(col("text"))).cast("long").as("total_text_chars"),
        sum(col("n_chars")).as("total_n_chars"),
        sum(col("doc_id")).as("sum_doc_id"))
      .orderBy(col("lang"), col("source"))
  }

  val q91Sql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT text) AS n_distinct_texts,
      |  CAST(SUM(length(text)) AS BIGINT) AS total_text_chars,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_n_chars,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** q69: ORC scan fidelity over `orders` (round 3) — the third
    * on-disk format under the oracle gate, and the only COLUMNAR one
    * besides parquet: unlike the q90/q91 text twins this exercises
    * Spark's vectorized ORC reader (stripe/row-group skipping, RLE
    * decoding, timestamp storage in its own physical encoding) plus
    * predicate pushdown into the ORC scan — a wrong pushed filter or
    * a mis-decoded stripe changes the hash. Same pattern as q90:
    * schema pinned from the parquet source (no inference pass), the
    * DuckDB oracle computes the identical aggregate over the original
    * parquet, every twin column load-bearing in the output.
    */
  def q69(spark: SparkSession, dir: String): DataFrame = {
    val path = twinPath(dir, "orders_orc")
    val src = Tables(spark, dir, "orders")
    GraftIO.write(src, "orc", path)
    spark.read.schema(src.schema).orc(path)
      .filter(col("o_totalprice") > lit(1000.0))
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_orderdate")).as("min_date"),
        max(col("o_orderdate")).as("max_date"),
        sum(col("o_orderkey")).as("sum_okey"),
        sum(col("o_custkey")).as("sum_ckey"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  val q69Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  MIN(o_orderdate) AS min_date,
      |  MAX(o_orderdate) AS max_date,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey,
      |  CAST(SUM(o_custkey) AS BIGINT) AS sum_ckey,
      |  COUNT(*) AS n
      |FROM orders
      |WHERE o_totalprice > 1000.0
      |GROUP BY o_orderstatus, o_orderpriority
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin
}
