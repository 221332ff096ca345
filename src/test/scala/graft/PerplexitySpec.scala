package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Perplexity}

class PerplexitySpec extends SparkSpec {

  /** Straight-line reference stupid-backoff scorer: counts in a local
    * map, the published recursion verbatim, log10 folded in position
    * order — independently written, no shared selection code with the
    * operator (only the final fold contract is the same math).
    */
  private def referencePpl(train: Seq[String],
      text: String): (Long, Option[Double]) = {
    val cnt = scala.collection.mutable.Map.empty[(Int, String), Long]
    var nTrain = 0L
    train.foreach { t =>
      val w = t.trim.split("\\s+").filter(_.nonEmpty)
      nTrain += w.length
      for (k <- 1 to math.min(5, w.length); g <- w.sliding(k) if g.length == k)
        cnt((k, g.mkString(" "))) = cnt.getOrElse((k, g.mkString(" ")), 0L) + 1
    }
    val w = text.trim.split("\\s+").filter(_.nonEmpty)
    if (w.isEmpty) return (0L, None)
    var s = 0.0
    for (p <- 1 to w.length) {
      val kp = math.min(5, p)
      var sel = kp
      var num = -1L
      while (sel >= 1 && num < 0) {
        num = cnt.getOrElse((sel, w.slice(p - sel, p).mkString(" ")), -1L)
        if (num < 0) sel -= 1
      }
      val (nu, de, nb): (Long, Long, Int) =
        if (num < 0) (1L, nTrain, kp - 1)
        else if (sel == 1) (num, nTrain, kp - 1)
        else (num, cnt((sel - 1, w.slice(p - sel, p - 1).mkString(" "))),
          kp - sel)
      s += math.log10(nu.toDouble / de.toDouble) + nb * Perplexity.BackoffLog10
    }
    (w.length.toLong, Some(math.pow(10.0, -s / w.length)))
  }

  test("q102 scorer: bit-equal to a driver recomputation; both arms bit-equal") {
    import spark.implicits._
    // train: enough text that 5-grams exist; score: one in-domain doc
    // (full 5-gram hits), one forcing partial backoff (novel 5-gram,
    // seen trigram), one with an OOV token, one empty
    val trainTexts = Seq(
      "the quick brown fox jumps over the lazy dog today",
      "the quick brown fox sleeps under the old tree today",
      "a slow green turtle walks past the lazy dog quietly")
    val scoreTexts = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox walks past the lazy dog"),
      (2L, "zzz the quick brown fox"),
      (3L, ""))
    val train = trainTexts.zipWithIndex
      .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
    val docs = scoreTexts.toDF("doc_id", "text")
    val broadcastArm = Perplexity.perplexityOn(docs, train).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    // the reference recomputation matches BIT-FOR-BIT (=== on doubles)
    scoreTexts.foreach { case (id, text) =>
      val (n, ppl) = referencePpl(trainTexts, text)
      assert(broadcastArm(id)._1 === n, s"doc $id n_scored")
      assert(broadcastArm(id)._2 === ppl, s"doc $id ppl")
    }
    // backoff and OOV actually fired: the all-hits doc scores better
    // (lower ppl) than the backoff doc, which beats the OOV doc
    assert(broadcastArm(0L)._2.get < broadcastArm(1L)._2.get)
    assert(broadcastArm(1L)._2.get < broadcastArm(2L)._2.get)
    // join arm (broadcastLimit 0 forces it) is bit-equal everywhere
    val joinArm = Perplexity.perplexityOn(docs, train, broadcastLimit = 0L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(joinArm === broadcastArm)
  }

  test("fingerprint64 expression == Fingerprint64.of — the closure/column key twin") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val ss = Seq("", "a", "the quick brown", "naïve café ünïcödé",
      "aa bb cc dd ee", "x\ty \u0001z")
    val got = ss.toDF("s").selectExpr("fingerprint64(s)")
      .collect().map(_.getLong(0)).toSeq
    assert(got === ss.map(graft.functions.Fingerprint64.of))
  }

  test("LongLongMap: 20k random keys round-trip, misses default") {
    val rnd = new scala.util.Random(42)
    val pairs = Array.fill(20000)((rnd.nextLong(), rnd.nextLong()))
    val m = new Perplexity.LongLongMap(pairs.length)
    pairs.foreach { case (k, v) => m.put(k, v) }
    // overwrite wins
    m.put(pairs(0)._1, 99L)
    assert(m.getOrElse(pairs(0)._1, -1L) === 99L)
    pairs.drop(1).foreach { case (k, v) =>
      assert(m.getOrElse(k, Long.MinValue) === v)
    }
    assert(m.getOrElse(1234567L, -7L) === -7L)
  }

  test("q102 join arm: scoring exchanges carry only 8-byte keys — gram strings never shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    val docs = Seq((0L, "aa bb cc dd ee ff gg"), (1L, "aa bb cc dd hh"))
      .toDF("doc_id", "text")
    val out = Perplexity.perplexityOn(docs, docs, broadcastLimit = 0L)
    out.collect() // materialize so AQE's final plan exists
    def exchanges(p: SparkPlan): Seq[Exchange] = p.collect {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case q: QueryStageExec => exchanges(q.plan)
      case e: Exchange => Seq(e)
    }.flatten
    val ex = exchanges(out.queryExecution.executedPlan)
    assert(ex.nonEmpty, out.queryExecution.executedPlan.toString)
    // Tables.spread's round-robin input repartition legitimately
    // moves the raw (doc_id, text) once for parallelism — the house
    // rule targets DERIVED exchanges: every hash/range-partitioned
    // exchange (the gram join, the per-doc fold, the doc restore)
    // must be string-free
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    ex.filterNot(_.outputPartitioning
        .isInstanceOf[RoundRobinPartitioning])
      .foreach { e =>
        assert(!e.output.exists(_.dataType ==
            org.apache.spark.sql.types.StringType),
          s"string-typed exchange: ${e.output.mkString(", ")}")
      }
  }

  test("compactLm: minCount prunes numerators, keeps the unpruned unigram total; limit guards") {
    import spark.implicits._
    val counts = Perplexity.ngramCounts(
      Seq((0L, "aa bb aa bb aa")).toDF("doc_id", "text"))
    val lm = Perplexity.compactLm(counts, minCount = 2)
    assert(lm.nTrain === 5L) // aa×3 + bb×2, unpruned
    assert(lm.counts.getOrElse(Perplexity.lmKey("aa"), -1L) === 3L)
    assert(lm.counts.getOrElse(Perplexity.lmKey("aa bb"), -1L) === 2L)
    // 4-grams occur once each — pruned at minCount = 2
    assert(lm.counts.getOrElse(Perplexity.lmKey("aa bb aa bb"), -1L) === -1L)
    intercept[IllegalArgumentException] {
      Perplexity.compactLm(counts, limit = 1L)
    }
  }

  test("q102 terciles: closed-form ntile matches SQL ntile(3) at awkward sizes") {
    for (n <- Seq(1L, 2L, 3L, 4L, 5L, 7L, 9L, 100L, 101L)) {
      val want = { // SQL ntile(3) contract computed the naive way
        val q = n / 3; val rem = n % 3
        (1L to n).map { r =>
          var acc = 0L; var b = 0L
          while (acc < r) { b += 1; acc += (if (b <= rem) q + 1 else q) }
          b
        }
      }
      val got = (1L to n).map(r => Perplexity.ntileOf(r, n, 3))
      assert(got === want, s"n=$n")
    }
  }

  test("q102 end-to-end: kept docs split into balanced terciles, other verdicts untouched") {
    val out = Perplexity.q102(spark, sf).collect()
    val q75 = Curation.q75(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(out.length === q75.size)
    val byVerdict = out.groupBy(_.getAs[String]("verdict"))
      .map { case (k, v) => k -> v.length }
    // every SCOREABLE q75 'kept' became exactly one tercile; sizes
    // differ by ≤ 1. Unscoreable kept docs (n_scored = 0 ⇒ ppl null)
    // are excluded from the ranking and stay plain 'kept' — an empty
    // doc carries no quality evidence (round-7 advice)
    val terciles = Seq("kept_head", "kept_middle", "kept_tail")
      .map(byVerdict.getOrElse(_, 0))
    val keptScoreable = out.count(r =>
      q75(r.getAs[Long]("doc_id")) == "kept" && r.getAs[Long]("n_scored") > 0)
    assert(terciles.sum === keptScoreable)
    assert(terciles.max - terciles.min <= 1,
      s"unbalanced terciles: $terciles")
    // non-kept docs carry their q75 verdict verbatim; unscoreable
    // kept docs are never branded kept_tail
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (q75(id) != "kept") assert(r.getAs[String]("verdict") === q75(id))
      else if (r.getAs[Long]("n_scored") == 0)
        assert(r.getAs[String]("verdict") === "kept",
          s"unscoreable kept doc $id must stay plain 'kept'")
      else assert(Seq("kept_head", "kept_middle", "kept_tail")
        .contains(r.getAs[String]("verdict")))
    }
    // head really is the low-perplexity side
    def avgPpl(v: String): Double = {
      val xs = out.filter(_.getAs[String]("verdict") == v)
        .flatMap(r => Option(r.get(r.fieldIndex("ppl")))
          .map(_.asInstanceOf[Double]))
      xs.sum / xs.length
    }
    assert(avgPpl("kept_head") < avgPpl("kept_tail"))
  }
}
