package graft

import org.apache.spark.sql.functions._

import graft.operators.FormatTwins

/** CSV/JSON scan-layer fidelity (SURVEY §7a): the twin round trip must
  * be value-exact vs computing the same aggregate straight off
  * parquet, and the text scans must stay projection-pruned.
  */
class FormatTwinsSpec extends SparkSpec {

  test("q90: CSV twin aggregate is value-identical to the parquet path") {
    val viaCsv = FormatTwins.q90(spark, sf).collect()
    val viaParquet = Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_price"),
        sum(col("l_discount").cast("decimal(18,4)")).cast("double").as("sum_disc"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        sum(col("l_orderkey")).as("sum_okey"),
        sum(col("l_linenumber").cast("long")).as("sum_lineno"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect()
    assert(viaCsv.nonEmpty)
    assert(viaCsv.toSeq == viaParquet.toSeq)
  }

  test("q91: JSON twin aggregate is value-identical to the parquet path") {
    val viaJson = FormatTwins.q91(spark, sf).collect()
    val viaParquet = Tables(spark, sf, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"),
        sum(length(col("text"))).cast("long").as("total_text_chars"),
        sum(col("n_chars")).as("total_n_chars"),
        sum(col("doc_id")).as("sum_doc_id"))
      .orderBy(col("lang"), col("source"))
      .collect()
    assert(viaJson.nonEmpty)
    assert(viaJson.toSeq == viaParquet.toSeq)
  }

  test("q69: ORC twin aggregate is value-identical to the parquet path") {
    val viaOrc = FormatTwins.q69(spark, sf).collect()
    val viaParquet = Tables(spark, sf, "orders")
      .filter(col("o_totalprice") > lit(1000.0))
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("sum_price"),
        min(col("o_orderdate")).as("min_date"),
        max(col("o_orderdate")).as("max_date"),
        sum(col("o_orderkey")).as("sum_okey"),
        sum(col("o_custkey")).as("sum_ckey"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
      .collect()
    assert(viaOrc.nonEmpty)
    assert(viaOrc.toSeq == viaParquet.toSeq)
  }

  test("ORC scan pushes the filter and prunes the projection") {
    FormatTwins.q69(spark, sf).collect() // ensure the twin exists
    val twin = s"${sys.props("java.io.tmpdir")}/graft-twins/" +
      sf.replaceAll("[^a-zA-Z0-9.]", "_") + "/orders_orc"
    val df = spark.read.schema(Tables(spark, sf, "orders").schema)
      .orc(twin)
      .filter(col("o_totalprice") > lit(1000.0))
      .select(col("o_orderkey"), col("o_totalprice"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), " +
      "GreaterThan(o_totalprice,1000.0)]"), p)
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"), p)
  }

  test("CSV scan prunes projection: 2-column select reads 2 columns") {
    // q90 already wrote the twin in the previous test; write again to
    // be order-independent.
    FormatTwins.q90(spark, sf).collect()
    val twin = s"${sys.props("java.io.tmpdir")}/graft-twins/" +
      sf.replaceAll("[^a-zA-Z0-9.]", "_") + "/lineitem_csv"
    val schema = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_returnflag", "l_linestatus", "l_shipdate").schema
    val df = spark.read.schema(schema)
      .option("header", "true").csv(twin)
      .select(col("l_orderkey"), col("l_quantity"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p)
  }
}
