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
}
