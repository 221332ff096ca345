package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated parquet tables from a scale-factor dir.
  *
  * Every operator in graft takes `(SparkSession, sfDir)` and pulls its
  * inputs through here so the scan always goes through the DataFrame
  * reader (predicate/projection pushdown, vectorized parquet).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
