package graft

import graft.operators.{Analytics, Dedup}

class AnalyticsSpec extends SparkSpec {

  test("q55 sketches stay within error bounds of exact values") {
    Analytics.q55(spark, sf).collect().foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"HLL off by ${math.abs(approx - exact) / exact}")
      val em = r.getAs[Double]("exact_median")
      val am = r.getAs[Double]("approx_median")
      assert(math.abs(am - em) / math.max(em.abs, 1e-9) <= 0.05,
        s"approx median $am vs exact $em")
    }
  }

  test("q114 catches the real table's duplicate keys; planted violations fail exactly") {
    import spark.implicits._
    val real = Analytics.q114(spark, sf).collect()
    assert(real.length === 8)
    // the synthetic lineitem genuinely has duplicate
    // (l_orderkey, l_linenumber) keys — the suite's job is to catch
    // that, so uniqueness FAILS honestly and everything else passes
    real.foreach { r =>
      val expected =
        if (r.getAs[String]("check_name") == "uniqueness") "fail" else "pass"
      assert(r.getAs[String]("passed") == expected, r.toString)
    }
    val uq = real.find(_.getAs[String]("check_name") == "uniqueness").get
    assert(uq.getAs[Double]("observed") < 1.0)

    // planted: a null orderkey, a duplicate key, a negative quantity,
    // an out-of-range discount, a foreign returnflag — each violates
    // exactly one constraint family
    val bad = Seq(
      (Option(1L), 1, 5.0, 0.05, 0.02, "A"),   // clean
      (Option.empty[Long], 1, 5.0, 0.05, 0.02, "N"), // null orderkey
      (Option(2L), 1, 5.0, 0.05, 0.02, "R"),   // dup key (with next)
      (Option(2L), 1, -3.0, 0.05, 0.02, "A"),  // negative quantity
      (Option(3L), 1, 5.0, 1.75, 0.02, "X"))   // bad discount + flag
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_tax", "l_returnflag")
    val verdicts = Analytics.dataChecksOn(bad).collect()
      .map(r => (r.getAs[String]("check_name"), r.getAs[String]("col_name")) ->
        (r.getAs[String]("passed"), r.getAs[Double]("observed"))).toMap
    assert(verdicts(("completeness", "l_orderkey"))._1 == "fail")
    assert(verdicts(("completeness", "l_orderkey"))._2 == 4.0 / 5.0)
    assert(verdicts(("completeness", "l_returnflag"))._1 == "pass")
    assert(verdicts(("uniqueness", "l_orderkey,l_linenumber"))._1 == "fail")
    assert(verdicts(("non_negative", "l_quantity")) == ("fail", -3.0))
    assert(verdicts(("non_negative", "l_tax"))._1 == "pass")
    assert(verdicts(("containment", "l_discount")) == ("fail", 4.0 / 5.0))
    assert(verdicts(("containment", "l_returnflag")) == ("fail", 4.0 / 5.0))
    assert(verdicts(("size", "*")) == ("pass", 5.0))
  }

  test("q95 anomaly detection flags exactly a planted spike, nulls the warm-up") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // jittered 55-65 events/hour for 60 hours (a flat series would
    // have zero trailing variance and z undefined), hour 50 spikes 6x
    val base = 1700000000L / 3600 * 3600 // hour-aligned
    val rows = for {
      h <- 0 until 60
      m <- 0 until (if (h == 50) 360 else 55 + h % 11)
    } yield (base + h * 3600L + (m % 60) * 60L + (m / 60), "a")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q95").toString
    rows.toDF("epoch", "event_type")
      .select(timestamp_seconds(col("epoch")).as("ts"), col("event_type"))
      .write.parquet(s"$tmp/events.parquet")
    val got = Analytics.q95(spark, tmp).collect()
    assert(got.length === 60)
    got.foreach { r =>
      val h = (r.getAs[java.sql.Timestamp]("hour_start").getTime / 1000 - base) / 3600
      if (r.getAs[Long]("win_cnt") < 12) {
        assert(r.isNullAt(r.fieldIndex("z")), s"hour $h should be warm-up")
        assert(!r.getAs[Boolean]("is_anomaly"))
      }
    }
    val anomalies = got.filter(_.getAs[Boolean]("is_anomaly"))
      .map(r => (r.getAs[java.sql.Timestamp]("hour_start").getTime / 1000 - base) / 3600)
    assert(anomalies.toSeq === Seq(50L), s"flagged $anomalies")
    // and on the real events table it runs with sane shape
    val sfRows = Analytics.q95(spark, sf).collect()
    assert(sfRows.nonEmpty)
    sfRows.filter(_.getAs[Long]("win_cnt") >= 12).foreach { r =>
      if (!r.isNullAt(r.fieldIndex("z")))
        assert(!r.getAs[Double]("z").isNaN)
    }
  }

  test("q96 gap-filled anomaly detection flags a total-outage hour q95 cannot see") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // jittered traffic for 60 hours, hour 30 is a TOTAL outage
    val base = 1700000000L / 3600 * 3600
    val rows = for {
      h <- (0 until 60) if h != 30
      m <- 0 until (55 + h % 11)
    } yield (base + h * 3600L + (m % 60) * 60L + (m / 60), "a")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q96").toString
    rows.toDF("epoch", "event_type")
      .select(timestamp_seconds(col("epoch")).as("ts"), col("event_type"))
      .write.parquet(s"$tmp/events.parquet")
    val got = Analytics.q96(spark, tmp).collect()
    assert(got.length === 60, "grid must fill the outage hour")
    val byHour = got.map { r =>
      ((r.getAs[java.sql.Timestamp]("hour_start").getTime / 1000 - base) / 3600, r)
    }.toMap
    assert(byHour(30L).getAs[Long]("n_events") === 0L)
    assert(byHour(30L).getAs[Boolean]("is_anomaly"),
      "outage hour must be flagged")
    assert(byHour(30L).getAs[Double]("z") < -3.0)
    // q95 on the same data has NO row for the outage hour — the blind
    // spot q96 exists to close
    val q95Hours = Analytics.q95(spark, tmp).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour_start").getTime / 1000 - base) / 3600)
    assert(!q95Hours.contains(30L))
    // no false positives outside the planted outage
    val anomalies = got.filter(_.getAs[Boolean]("is_anomaly")).map { r =>
      (r.getAs[java.sql.Timestamp]("hour_start").getTime / 1000 - base) / 3600
    }
    assert(anomalies.toSeq === Seq(30L), s"flagged $anomalies")
  }

  test("q94 sketch rollup: merging daily sketches equals sketching the month directly") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.q94(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") >= 1L)
      assert(r.getAs[Double]("rel_err") < 0.05,
        s"month ${r.getAs[java.sql.Date]("month")} error ${r.getAs[Double]("rel_err")}")
    }
    // HLL union is exact over sketch state: merged-daily estimate must
    // EQUAL the estimate of one sketch built over the whole month —
    // the property that makes incremental sketch tables sound
    val events = Tables(spark, sf, "events")
      .select(date_trunc("month", col("ts")).cast("date").as("month"),
        col("user_id"))
    val direct = events.groupBy(col("month"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .as("direct_users"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("month") -> r.getAs[Long]("direct_users"))
      .toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("approx_users") ===
        direct(r.getAs[java.sql.Date]("month")),
        "merged-daily sketch estimate drifted from the direct sketch")
    }
  }

  test("q74 fences flag exactly the planted outliers and the fence join broadcasts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 1..101 uniform grid plus three extremes: quartiles interpolate
    // to 25.75 / 77.25 over the 104 sorted values, fences land at
    // -51.5 / 154.5, and exactly {-100, 200, 300} fall outside
    val vals = (1 to 101).map(_.toDouble) ++ Seq(-100.0, 200.0, 300.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        i.toLong, "t", v)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_q74").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$tmp/events.parquet")
    val r = Analytics.q74(spark, tmp).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n") === 104L)
    assert(r.head.getAs[Double]("p25") === 25.75)
    assert(r.head.getAs[Double]("p75") === 77.25)
    assert(r.head.getAs[Double]("lo_fence") === -51.5)
    assert(r.head.getAs[Double]("hi_fence") === 154.5)
    assert(r.head.getAs[Long]("n_outliers") === 3L)
    // real corpus: every type has a sane fraction and some outliers
    val real = Analytics.q74(spark, sf).collect()
    assert(real.nonEmpty)
    real.foreach { t =>
      val f = t.getAs[Double]("outlier_frac")
      assert(f >= 0.0 && f < 0.5)
      assert(t.getAs[Double]("lo_fence") < t.getAs[Double]("hi_fence"))
    }
    // fences must broadcast — the fact side may not shuffle for the join
    val plan = Analytics.q74(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"fences not broadcast:\n$plan")
  }

  test("q77 rank-pick quantiles are bit-equal to the percentile aggregate " +
      "and the NDV dispatch exercises both paths") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // mostly-distinct doubles (the hashmap-aggregate failure shape at
    // scale) — rank-pick must reproduce `percentile` bit-for-bit,
    // including interpolated positions at both even and odd counts
    for (n <- Seq(999, 1000)) {
      val rng = new scala.util.Random(77)
      val vals = Seq.fill(n)(rng.nextDouble() * 1e6)
      val df = vals.toDF("v").repartition(7)
      val agg = df.agg(
        expr("percentile(v, 0.25)"), expr("percentile(v, 0.75)")).collect()(0)
      val got = Analytics.sortQuantilesExact(df, "v", Seq(0.25, 0.75), n.toLong)
      assert(got(0) === agg.getDouble(0), s"p25 n=$n")
      assert(got(1) === agg.getDouble(1), s"p75 n=$n")
    }
    // nulls excluded exactly as the aggregate excludes them
    val withNulls = (Seq.fill(50)(Option.empty[Double]) ++
      (1 to 100).map(i => Some(i.toDouble))).toDF("v").repartition(5)
    val aggN = withNulls.agg(expr("percentile(v, 0.25)")).collect()(0).getDouble(0)
    assert(Analytics.sortQuantilesExact(withNulls, "v", Seq(0.25), 100L) ===
      Seq(aggN))
    // the real corpus drives both dispatch arms: l_discount/l_quantity
    // are low-NDV (value-count aggregate), l_extendedprice is above
    // the limit (rank-pick) already at this sf
    val li = Tables(spark, sf, "lineitem")
    val ndv = li.agg(
      countDistinct(col("l_discount")).as("d"),
      countDistinct(col("l_extendedprice")).as("e")).collect()(0)
    assert(ndv.getLong(0) <= Analytics.PercentileNdvLimit,
      "l_discount should take the value-count path")
    assert(ndv.getLong(1) > Analytics.PercentileNdvLimit,
      "l_extendedprice should take the rank-pick path at this sf")
  }

  test("q51 funnel stages are monotonically non-increasing") {
    val stages = Analytics.q51(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("users")).toMap
    assert(stages("1_signup") >= stages("2_view"))
    assert(stages("2_view") >= stages("3_purchase"))
    assert(stages("1_signup") > 0)
  }

  test("q52 retention: offset-0 cell equals cohort size") {
    val rows = Analytics.q52(spark, sf).collect()
    val zero = rows.filter(_.getAs[Long]("week_offset") == 0L)
    // every cohort has an offset-0 cell (the user's own first week)
    assert(zero.map(_.get(0)).toSet === rows.map(_.get(0)).toSet)
    rows.foreach(r => assert(r.getAs[Long]("week_offset") >= 0L))
  }

  test("q36 representative is the longest (tie: smallest-id) member") {
    val labels = Dedup.q35(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    val want = labels.groupBy(_._2).map { case (cid, ms) =>
      cid -> ms.map(_._1).maxBy(id => (chars(id), -id))
    }
    val reps = Dedup.q36(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r.getAs[Long]("rep_doc_id")).toMap
    assert(reps === want)
  }
}
