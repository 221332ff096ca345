package graft

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  test("q58 hash split is deterministic and keeps only buckets < 10") {
    val a = Sampling.q58(spark, sf).collect()
    val b = Sampling.q58(spark, sf).collect()
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq)
    a.foreach(r => assert(r.getAs[Long]("bucket") < 10))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    val frac = a.length.toDouble / total
    assert(frac > 0.02 && frac < 0.25, s"10% split selected $frac")
  }

  test("q59 stratified sample honors per-stratum fractions, same seed = same rows") {
    val fr = Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.25, "fr" -> 0.1, "zh" -> 0.1)
    val s1 = Sampling.q59(spark, sf, fr, seed = 42L).collect()
    val s2 = Sampling.q59(spark, sf, fr, seed = 42L).collect()
    assert(s1.map(_.getLong(0)).toSeq === s2.map(_.getLong(0)).toSeq,
      "same seed must reproduce the same sample")
    val perLang = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = s1.groupBy(_.getString(1)).view.mapValues(_.length)
    got.foreach { case (lang, n) =>
      val expect = fr(lang) * perLang(lang)
      // Bernoulli sampling: allow generous tolerance at tiny SF
      assert(math.abs(n - expect) <= math.max(8.0, 0.6 * expect),
        s"$lang: got $n expected ~$expect of ${perLang(lang)}")
    }
  }
}
