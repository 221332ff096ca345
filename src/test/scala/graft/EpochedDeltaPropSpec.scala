package graft

import org.apache.spark.sql.functions._

import graft.streaming.EpochedState

/** Randomized round-trip property for EpochedState delta checkpoints —
  * the SnapshotPruningSpec discipline applied to state persistence:
  * whatever random keyed mutations and compaction points happen,
  * `loadResolved` must equal the sequentially mutated model exactly.
  * Deterministic seed: failures reproduce.
  */
class EpochedDeltaPropSpec extends SparkSpec {

  test("random upsert/delete epochs with interleaved compaction resolve to the model state") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val keys = Map("rel" -> Seq("k"))
    def df(m: Map[Long, (Long, String)]) =
      m.toSeq.map { case (k, (v, s)) => (k, v, s) }
        .toDF("k", "v", "tag").localCheckpoint()

    (1 to 3).foreach { trial =>
      val ck = java.nio.file.Files
        .createTempDirectory(s"graft_deltaprop_$trial").toString
      // model: key -> payload
      var model: Map[Long, (Long, String)] =
        (0L until 40L).map(k =>
          k -> (rnd.nextLong(1000), s"s${rnd.nextInt(50)}")).toMap
      EpochedState.save(spark, ck, 0L, Map("rel" -> df(model)))
      var lastCompactCheck = 0L
      (1 to 8).foreach { e =>
        val prev = model
        // random mutation batch: some upserts (new + changed), deletes
        val ups = (1 to 1 + rnd.nextInt(6)).map { _ =>
          val k = rnd.nextLong(60)
          k -> (rnd.nextLong(1000), s"s${rnd.nextInt(50)}")
        }.toMap
        val dels = prev.keySet.filter(_ => rnd.nextDouble() < 0.1)
          .take(3)
        model = (prev -- dels) ++ ups
        val (up, del) = EpochedState.diff(df(prev), df(model), Seq("k"))
        EpochedState.saveDelta(spark, ck, e.toLong,
          Map("rel" -> up.localCheckpoint()),
          Map("rel" -> del.localCheckpoint()))
        if (rnd.nextDouble() < 0.3) {
          EpochedState.compact(spark, ck, keys)
          assert(EpochedState.deltaEpochs(spark, ck).isEmpty)
          lastCompactCheck = e.toLong
        }
        val (at, parts) = EpochedState.loadResolved(spark, ck, keys).get
        assert(at === e.toLong)
        val got = parts("rel").collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
          .toMap
        assert(got === model,
          s"trial $trial epoch $e diverged (last compact $lastCompactCheck)")
      }
    }
  }

  test("read-pin: a lazy resolved plan survives a concurrent compact deleting its deltas") {
    import spark.implicits._
    val keys = Map("rel" -> Seq("k"))
    val ck = java.nio.file.Files
      .createTempDirectory("graft_delta_readpin").toString
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    EpochedState.save(spark, ck, 0L, Map("rel" -> base))
    EpochedState.saveDelta(spark, ck, 1L,
      Map("rel" -> Seq((2L, 21L), (4L, 40L)).toDF("k", "v")),
      Map("rel" -> Seq(Tuple1(3L)).toDF("k")))
    // resolve but DO NOT collect: the plan is outstanding
    val (at, parts) = EpochedState.loadResolved(spark, ck, keys).get
    assert(at === 1L)
    // compact consumes and DELETES the epoch-1 delta dir
    EpochedState.compact(spark, ck, keys)
    assert(EpochedState.deltaEpochs(spark, ck).isEmpty)
    // the outstanding plan still collects the correct state (round 12:
    // delta rows are pinned at resolve time, so the plan never touches
    // the vanished files)
    val got = parts("rel").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 10L, 2L -> 21L, 4L -> 40L))
    // and a fresh resolve off the compacted base agrees
    val (at2, parts2) = EpochedState.loadResolved(spark, ck, keys).get
    assert(at2 === 1L)
    assert(parts2("rel").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap === got)
  }

  test("a delta naming a relation absent from the base fails loudly, never silently drops") {
    import spark.implicits._
    val ck = java.nio.file.Files
      .createTempDirectory("graft_delta_unknown_rel").toString
    EpochedState.save(spark, ck, 0L,
      Map("rel" -> Seq((1L, 10L)).toDF("k", "v")))
    // a state that grew a second relation after bootstrap writes a
    // delta for it without re-bootstrapping the base first
    EpochedState.saveDelta(spark, ck, 1L,
      Map("rel" -> Seq((2L, 20L)).toDF("k", "v"),
        "extra" -> Seq((9L, 90L)).toDF("k", "v")),
      Map("rel" -> spark.emptyDataFrame.select(lit(0L).as("k")).limit(0),
        "extra" -> spark.emptyDataFrame.select(lit(0L).as("k")).limit(0)))
    val e = intercept[IllegalStateException] {
      EpochedState.loadResolved(spark, ck,
        Map("rel" -> Seq("k"), "extra" -> Seq("k")))
    }
    assert(e.getMessage.contains("extra"))
    assert(e.getMessage.contains("absent from base"))
  }
}
