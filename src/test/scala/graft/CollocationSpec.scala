package graft

import graft.operators.TextAnalysis

/** q128 collocation mining: the integer-grid lift contract must match
  * an independently written driver twin exactly — same two-floor
  * placement, same support and lift floors — on the real corpus.
  */
class CollocationSpec extends SparkSpec {

  test("q128 bit-equals a driver collocation miner on the real corpus") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val docToks = texts.map(_.split("\\s+").filter(_.nonEmpty))
    val uni = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    val bi = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    var nb = 0L
    docToks.foreach { w =>
      w.foreach(t => uni(t) += 1)
      if (w.length >= 2) w.sliding(2).foreach { p =>
        bi((p(0), p(1))) += 1; nb += 1
      }
    }
    val nu = uni.values.sum
    val want = bi.iterator.collect {
      case ((w1, w2), n12) if n12 >= 3 =>
        val n1 = uni(w1); val n2 = uni(w2)
        val lift = ((n12 * nu * 1000L) / (n1 * n2)) * nu / nb
        ((w1, w2), (n12, n1, n2, lift))
    }.filter(_._2._4 >= 2000L).toMap
    assert(want.nonEmpty, "fixture produced no collocations — broaden it")

    val got = TextAnalysis.q128(spark, sf).collect().map { r =>
      ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    }.toMap
    assert(got === want)
    // invariants: a bigram never outruns its marginals
    assert(got.forall { case (_, (n12, n1, n2, _)) =>
      n12 <= n1 && n12 <= n2 })
  }
}
