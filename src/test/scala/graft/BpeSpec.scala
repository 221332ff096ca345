package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  test("distributed BPE training is bit-equal to the single-machine reference") {
    val got = Bpe.q97(spark, sf).collect().map { r =>
      (r.getAs[Long]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count"))
    }.toSeq
    assert(got.nonEmpty)
    // reference: same word-frequency table, no Spark anywhere
    val wordFreq = Tables(spark, sf, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Bpe.referenceTrain(wordFreq, 30)
    assert(got === want, "distributed merges diverged from reference")
    // merges actually compose: later rounds must merge multi-char
    // symbols built by earlier rounds
    assert(got.exists { case (_, l, r, _, _) =>
      (l.length > 1 && l != Bpe.Eow) || (r.length > 1 && r != Bpe.Eow)
    }, "no merge ever consumed a previously-merged symbol")
    // ranks are 0..n-1 and counts never increase out of order wildly
    assert(got.map(_._1) === got.indices.map(_.toLong))
  }
}
