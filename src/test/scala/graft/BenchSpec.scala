package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression tripwire is pure driver-side logic — no
  * SparkSession needed.
  */
class BenchSpec extends AnyFunSuite {

  private val sample =
    """{"metric":"total","value":42.3,"unit":"sec",""" +
    """"queries":{"q31_ngram_jaccard":1.168678776,"q76_fuzzy_match2":3.391,""" +
    """"q01_pricing_summary":0.190884866},""" +
    """"shuffle_mb":{"q31_ngram_jaccard":24.7,"q76_fuzzy_match2":94.8,""" +
    """"q01_pricing_summary":0.0},""" +
    """"spill_mb":0.0,"errors":{},"sf":"/root/testdata/sf0.1"}"""

  test("parseDetail recovers wall and shuffle per query; sfOf recovers the stamp") {
    val m = Bench.parseDetail(sample)
    assert(m("q31_ngram_jaccard") === ((1.168678776, 24.7)))
    assert(m("q76_fuzzy_match2") === ((3.391, 94.8)))
    assert(m("q01_pricing_summary") === ((0.190884866, 0.0)))
    assert(Bench.sfOf(sample).contains("/root/testdata/sf0.1"))
  }

  test("a planted plan change (shuffle delta) trips kind=plan") {
    val prev = Map("q31" -> (1.2, 24.7), "q76" -> (3.4, 94.8))
    // q31's exchange grew 24.7 → 43.6 MB — a plan change regardless
    // of wall; q76 is byte-identical
    val cur = Map("q31" -> (1.3, 43.6), "q76" -> (3.3, 94.8))
    val regs = Bench.regressionsOf(prev, cur)
    assert(regs === Seq(("q31", "plan", 24.7, 43.6)))
  }

  test("a wall blow-up at EQUAL shuffle is kind=wall (env OR same-plan compute), never plan") {
    val prev = Map("q31" -> (1.2, 24.7))
    val cur = Map("q31" -> (6.8, 24.7)) // JIT storm / shared box
    val regs = Bench.regressionsOf(prev, cur)
    assert(regs === Seq(("q31", "wall", 1.2, 6.8)))
  }

  test("jitter trips nothing; new queries are not regressions; gone queries are") {
    val prev = Map("q31" -> (1.2, 24.7), "q99" -> (0.3, 0.8))
    val cur = Map(
      "q31" -> (1.4, 24.7),  // +17% wall, same bytes: noise floor
      "q101" -> (0.2, 5.0))  // new this round
    val regs = Bench.regressionsOf(prev, cur)
    assert(regs === Seq(("q99", "gone", 0.3, 0.0)))
  }

  test("sub-grain shuffle wobble on a tiny exchange does not trip") {
    // 0.1 MB file-grain wobble around small values stays quiet
    val prev = Map("q50" -> (0.16, 0.1))
    val cur = Map("q50" -> (0.17, 0.1))
    assert(Bench.regressionsOf(prev, cur).isEmpty)
  }

  test("shardCuts: contiguous cover, ~equal sizes, graph family never split") {
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    val cuts = Bench.shardCuts(names, 4)
    assert(cuts.size <= 3 && cuts == cuts.sorted && cuts.distinct == cuts)
    val bounds = 0 +: cuts :+ names.size
    val shards = bounds.zip(bounds.tail).map { case (a, b) => names.slice(a, b) }
    // cover: every query in exactly one shard
    assert(shards.flatten == names)
    // the tri-cache pair must share a JVM
    val qi = shards.indexWhere(_.exists(_.startsWith("q122")))
    assert(shards(qi).exists(_.startsWith("q127")),
      "q122 and q127 landed in different shards — tri-cache saving lost")
    // no degenerate shard (each within 3x of the mean)
    assert(shards.forall(s => s.nonEmpty && s.size <= names.size * 3 / 4))
  }
}
