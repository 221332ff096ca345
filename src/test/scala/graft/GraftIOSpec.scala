package graft

import java.nio.file.Files

import graft.sources.GraftIO

class GraftIOSpec extends SparkSpec {

  test("csv/json/parquet round-trip through one URI-driven surface") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "v")
    val dir = Files.createTempDirectory("graft_io")
    for (fmt <- Seq("csv", "json", "parquet", "orc")) {
      GraftIO.write(df, fmt, s"file:$dir/$fmt")
      val back = GraftIO.read(spark, fmt, s"file:$dir/$fmt")
      assert(back.count() === 2, fmt)
      assert(back.columns.sorted.toSeq === Seq("k", "s", "v"), fmt)
    }
  }

  test("unknown format is rejected") {
    intercept[IllegalArgumentException] {
      GraftIO.read(spark, "xml", "file:/tmp/x")
    }
  }
}
