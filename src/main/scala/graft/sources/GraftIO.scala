package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** DataFrame ⟷ files over any registered Hadoop filesystem (file://,
  * hdfs://, gftp://) — the fs_df_io surface of SURVEY §2.1. Thin by
  * design: the value is that one URI scheme string switches a pipeline
  * between local disk, a cluster store, and an FTP endpoint.
  */
object GraftIO {

  val Formats: Set[String] = Set("parquet", "csv", "json", "orc", "text")

  /** Read `uri` as `format`; CSV defaults to header+inferSchema like
    * the blueprint CLIs expect.
    */
  def read(spark: SparkSession, format: String, uri: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    require(Formats(format), s"unsupported format $format")
    val base: DataFrameReader = spark.read.format(format)
    val withDefaults =
      if (format == "csv")
        base.option("header", "true").option("inferSchema", "true")
      else base
    withDefaults.options(options).load(uri)
  }

  /** Write `df` to `uri` as `format` (overwrite). */
  def write(df: DataFrame, format: String, uri: String,
      options: Map[String, String] = Map.empty): Unit = {
    require(Formats(format), s"unsupported format $format")
    val base = df.write.format(format).mode("overwrite")
    val withDefaults =
      if (format == "csv") base.option("header", "true") else base
    withDefaults.options(options).save(uri)
  }
}
