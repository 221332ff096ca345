package graft

import org.apache.spark.sql.functions._

class FingerprintSpec extends SparkSpec {

  test("fingerprint64: deterministic, content-sensitive, codegen path") {
    functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("hello world", "hello world", "hello worle", "")
      .toDF("text")
      .select(col("text"), expr("fingerprint64(text)").as("fp"))
    val fps = df.collect().map(_.getAs[Long]("fp"))
    assert(fps(0) === fps(1))          // same content, same fp
    assert(fps(0) !== fps(2))          // 1-byte change flips fp
    assert(fps(3) === 1125899906842597L) // empty string = seed
    // matches the reference implementation of the rolling hash
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(1125899906842597L)((h, b) => h * 1000003L + b)
    assert(fps(0) === ref("hello world"))
  }

  test("fingerprint64 null propagates") {
    functions.GraftFunctions.register(spark)
    val row = spark.sql("SELECT fingerprint64(CAST(NULL AS STRING)) AS fp")
      .collect()(0)
    assert(row.isNullAt(0))
  }
}
