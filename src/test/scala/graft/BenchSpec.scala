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
    // ALL session-cache consumers must share a JVM: the tri-cache
    // (q122/q127/q131/q135 — round 13: a cut between q127 and q131
    // made q131 pay a cold full enumeration), the weighted-edge cache
    // (q129/q130), and round 14's host-tier cache (q132/q133)
    val qi = shards.indexWhere(_.exists(_.startsWith("q122")))
    for (fam <- Seq("q127", "q129", "q130", "q131", "q132", "q133",
        "q135"))
      assert(shards(qi).exists(_.startsWith(fam)),
        s"q122 and $fam landed in different shards — cache saving lost")
    // no degenerate shard (each within 3x of the mean)
    assert(shards.forall(s => s.nonEmpty && s.size <= names.size * 3 / 4))
  }

  private def canned(name: String): Bench.QRes =
    Bench.QRes(name, 1.0, 2.0, 0.0, 3L, 4L, None, Seq(1.2, 1.0))

  test("forkMerge: a dead child's shard is re-measured in-process, nothing lost") {
    val names = ('a' to 'h').map(c => s"q_$c")
    var fellBack: List[Set[String]] = Nil
    val rep = Bench.forkMerge(names, 4,
      runChild = (i, _) =>
        if (i == 1) None // shard 1's JVM "died"
        else Some(Bench.ShardReport(
          Bench.shardOf(names, Bench.shardCuts(names, 4), i).map(canned),
          10.0 + i, 0.25)),
      measureShard = shard => { fellBack ::= shard; shard.toSeq.sorted.map(canned) })
    // exactly one fallback, for exactly the dead shard's queries
    val cuts = Bench.shardCuts(names, 4)
    assert(fellBack === List(Bench.shardOf(names, cuts, 1).toSet))
    // the merged report covers every query exactly once, sorted
    assert(rep.results.map(_.name) === names)
    // meta numbers: worst child code cache, children's ledgers summed
    // (the failed shard contributes nothing — its fills accrue to the
    // parent's own ledger, which the caller reads)
    assert(rep.codeCacheMb === 13.0)
    assert(math.abs(rep.cacheBuildS - 0.75) < 1e-9)
  }

  test("a real dead child JVM (unwritable shard out) is detected and re-measured in-process") {
    // the one code path of the forked-measurement stack CI never used
    // to exercise: a child that runs but cannot deliver its samples.
    // Scoped down: 2 cheap queries at sf0.001, 2 shards of 1.
    val only = "q02_filter_project,q50_event_funnel"
    val env = Map(
      "SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001",
      "SPARK_GRAFT_ONLY" -> only)
    // shard 0 writes to an unwritable path -> the child JVM exits
    // nonzero after measuring and runShardChild must report failure
    val dead = Bench.runShardChild(0, 2, env,
      outOverride = Some("/proc/graft-no-such-dir/out.jsonl"))
    assert(dead.isEmpty, "unwritable out path must surface as a dead child")
    // same shard, writable path -> real samples come back
    val alive = Bench.runShardChild(0, 2, env)
    assert(alive.nonEmpty, "healthy child failed — fork plumbing broken")
    val rep = alive.get
    assert(rep.results.nonEmpty &&
      rep.results.forall(r => r.err.isEmpty && r.wall > 0))
    assert(only.split(",").contains(rep.results.head.name))
  }
}
