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

  test("nfc_normalize: composed and decomposed forms collide after cleaning") {
    functions.GraftFunctions.register(spark)
    import spark.implicits._
    // "é" composed (U+00E9) vs decomposed (e + U+0301) — byte-different,
    // canonically equal; already-NFC ASCII passes through untouched
    val df = Seq("caf\u00e9", "cafe\u0301", "plain ascii")
      .toDF("text")
      .select(col("text"), expr("nfc_normalize(text)").as("n"),
        md5(expr("nfc_normalize(text)")).as("h"))
    val rows = df.collect()
    assert(rows(0).getString(1) === rows(1).getString(1))
    assert(rows(0).getString(2) === rows(1).getString(2))
    assert(rows(0).getString(0) !== rows(1).getString(0))
    assert(rows(2).getString(1) === "plain ascii")
  }

  test("fingerprint64 null propagates") {
    functions.GraftFunctions.register(spark)
    val row = spark.sql("SELECT fingerprint64(CAST(NULL AS STRING)) AS fp")
      .collect()(0)
    assert(row.isNullAt(0))
  }
}
