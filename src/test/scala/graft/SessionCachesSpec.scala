package graft

/** The session-cache registry's three round-13 contracts: stable
  * UUID keys per live session, eviction + temp sweeping on context
  * stop, and the build-seconds ledger the bench's honest accounting
  * reads.
  */
class SessionCachesSpec extends SparkSpec {

  test("getOrBuild: one build per (session, kind, dir); ledger accrues per dir") {
    var builds = 0
    val dir = s"/spec/dir/${java.util.UUID.randomUUID()}"
    def get() = SessionCaches.getOrBuild(spark, "spec-kind", dir) {
      builds += 1; Thread.sleep(5); java.lang.Integer.valueOf(builds)
    }
    val a = get(); val b = get()
    assert(builds === 1 && (a eq b), "build ran more than once")
    val ledger0 = SessionCaches.buildSecondsFor(dir)
    assert(ledger0 > 0.0, "build seconds not recorded")
    // a DIFFERENT session (same context) builds its own entry and
    // accrues more ledger for the same dir
    val other = spark.newSession()
    SessionCaches.getOrBuild(other, "spec-kind", dir) {
      builds += 1; Thread.sleep(5); java.lang.Integer.valueOf(builds)
    }
    assert(builds === 2, "sessions must not share entries")
    assert(SessionCaches.buildSecondsFor(dir) > ledger0)
    // unrelated dir: zero
    assert(SessionCaches.buildSecondsFor(dir + "-none") === 0.0)
  }

  test("evictContext: entries dropped, registered temps deleted from disk") {
    val dir = s"/spec/dir/${java.util.UUID.randomUUID()}"
    var builds = 0
    def get() = SessionCaches.getOrBuild(spark, "spec-evict", dir) {
      builds += 1; java.lang.Integer.valueOf(builds)
    }
    get()
    val tmp = java.nio.file.Files.createTempDirectory("graft-spec-temp")
    java.nio.file.Files.writeString(tmp.resolve("part-0"), "x")
    SessionCaches.registerTemp(spark, tmp.toString)
    // evicting the session's context clears the entry (a re-get
    // rebuilds) and sweeps the temp dir recursively
    SessionCaches.evictContext(spark.sparkContext)
    assert(!java.nio.file.Files.exists(tmp), "temp dir not swept")
    get()
    assert(builds === 2, "entry survived eviction")
    // eviction is per-context: a foreign (null-keyed) eviction must
    // not touch the rebuilt entry
    get()
    assert(builds === 2)
  }
}
