package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-examination of the bench's cache-fill accounting against
  * the [[SessionCaches]] ledger (the r13 verdict's item #4 plus the
  * warmup-dir advice): each measurement pass reports the ledger
  * DELTA it caused, so
  *
  *  - a warm-parent in-process fallback (two fallback shards sharing
  *    one JVM and one cache dir) charges each distinct fill exactly
  *    once — the second pass's delta is zero;
  *  - when the benched dir IS the warmup dir (sf0.001 spec runs),
  *    warmup-phase fills never inflate the reported cache_build_s.
  */
class BenchLedgerSpec extends SparkSpec {

  /** One fake registry query that fills a session cache for the dir
    * it is handed (the wsym/verdicts shape, scoped by a unique kind).
    */
  private def cacheQuery(kind: String, fillMs: Long)
      : (SparkSession, String) => DataFrame =
    (s, dir) => {
      SessionCaches.getOrBuild(s, kind, dir) {
        Thread.sleep(fillMs)
        java.lang.Long.valueOf(fillMs)
      }
      s.range(1).toDF("x")
    }

  test("two fallback passes at one warm cache dir charge the fill exactly once") {
    val kind = s"spec-ledger-${java.util.UUID.randomUUID()}"
    val q = Seq("q_fake_cache" -> cacheQuery(kind, 80L))
    // a fake benched dir distinct from the warmup dir: the warmup loop
    // fills the cache at the WARMUP dir's key, the timed runs at ours
    val dir = s"/spec/bench/${java.util.UUID.randomUUID()}"
    val first = Bench.measure(spark, q, dir)
    assert(first.cacheBuildS >= 0.08,
      s"first pass must charge the fill (got ${first.cacheBuildS})")
    assert(first.cacheBuilds.keySet === Set(kind))
    // second fallback shard, same JVM, same dir: the cache is warm —
    // the fill must be charged exactly once across both passes
    val second = Bench.measure(spark, q, dir)
    assert(second.cacheBuildS < 0.02,
      s"warm pass re-charged the fill (got ${second.cacheBuildS})")
    assert(second.cacheBuilds.isEmpty)
    // ledger total for the dir == the sum of the reported deltas ==
    // one distinct fill (warmup filled the WARMUP dir's key, which
    // must not leak into this dir's ledger)
    val ledger = SessionCaches.buildSecondsFor(dir)
    assert(math.abs(ledger - (first.cacheBuildS + second.cacheBuildS))
      < 1e-9, "reported deltas drifted from the ledger")
  }

  test("benched dir == warmup dir: warmup-phase fills stay out of the reported delta") {
    val kind = s"spec-warm-${java.util.UUID.randomUUID()}"
    val q = Seq("q_fake_cache" -> cacheQuery(kind, 80L))
    // sf0.001 IS measure's warmup dir: the warmup loop itself fills
    // the cache for this key, so the timed runs see it warm and the
    // reported delta must be ~zero — not the warmup's 80 ms
    val m = Bench.measure(spark, q, sf)
    assert(m.cacheBuildS < 0.02,
      s"warmup fill leaked into the reported ledger (${m.cacheBuildS})")
    assert(m.cacheBuilds.isEmpty)
    // the fill itself DID run and is on the dir's raw ledger
    assert(SessionCaches.buildSecondsFor(sf) >= 0.08)
  }
}
