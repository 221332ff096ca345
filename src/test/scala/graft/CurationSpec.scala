package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends SparkSpec {

  test("q45 repetition fractions are in [0,1] and a synthetic loop doc is rejected") {
    val rows = Curation.q45(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t2 = r.getAs[Double]("top2_frac")
      val d5 = r.getAs[Double]("dup5_frac")
      assert(t2 >= 0.0 && t2 <= 1.0)
      assert(d5 >= 0.0 && d5 <= 1.0)
      // verdict is a pure function of the fractions
      assert(r.getAs[Boolean]("reject") === (t2 > 0.20 || d5 > 0.30))
    }
    // the rules must actually fire on degenerate repetition: a doc
    // that is one phrase looping has top2_frac ≈ 1 and dup5_frac ≈ 1
    import spark.implicits._
    val loop = Seq((0L, ("spam ham " * 30).trim)).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q45").toString
    loop.write.parquet(s"$tmp/documents.parquet")
    val v = Curation.q45(spark, tmp).collect().head
    assert(v.getAs[Double]("top2_frac") > 0.4)
    assert(v.getAs[Double]("dup5_frac") > 0.9)
    assert(v.getAs[Boolean]("reject"))
  }

  test("q46 contamination is a broadcast join over eval grams and finds planted overlap") {
    // plant: doc 0 (eval by mod 97) and doc 1 share a verbatim run
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "xx yy alpha beta gamma delta qq rr"),
      (2L, "totally different words here nothing shared")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q46").toString
    docs.write.parquet(s"$tmp/documents.parquet")
    val got = Curation.q46(spark, tmp).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
    assert(got.head.getAs[Long]("contaminated") === 1L) // "alpha beta gamma delta"
    // eval side must be broadcast — the corpus side may not shuffle
    // for the join at 100 TB
    val plan = Curation.q46(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval grams not broadcast:\n$plan")
  }

  test("q48 caps every source, ranks are contiguous, and the plan group-limits before the shuffle") {
    val rows = Curation.q48(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    // independent ground truth: all docs per source from the table
    val all = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, docs) =>
      assert(docs.length <= 15, s"source $src over the cap")
      // ranks within a source are exactly 1..n with no gaps
      assert(docs.map(_.getAs[Long]("src_rank")).sorted.toSeq ===
        (1L to docs.length).toSeq, s"ranks not contiguous for $src")
      docs.foreach(d => assert(d.getAs[Long]("src_docs") === all(src).length))
      // kept docs ARE the longest ones: every kept doc's length >=
      // every dropped doc's length (ties broken by doc_id, so compare
      // on the (n_chars desc, doc_id asc) order key)
      val keptKeys = docs.map(d =>
        (-d.getAs[Long]("n_chars"), d.getAs[Long]("doc_id"))).toSet
      val ordered = all(src).map(d =>
        (-d.getAs[Long]("n_chars"), d.getAs[Long]("doc_id")))
        .sorted.take(docs.length).toSet
      assert(keptKeys === ordered,
        s"source $src kept docs are not the top-${docs.length} by length")
    }
    // the rank-filter must compile to a partial group limit so each
    // map partition forwards at most cap rows per source into the
    // shuffle — the property that makes the cap corpus-scale-safe
    val plan = Curation.q48(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }

  test("q49 distributed ranking equals a single-partition window and covers the corpus") {
    val got = Curation.q49(spark, sf).collect()
    assert(got.nonEmpty)
    // reference: the same ranking through one global window
    import org.apache.spark.sql.expressions.Window
    val freq = Tables(spark, sf, "documents")
      .select(explode(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val w = Window.orderBy(col("freq").desc, col("token"))
    val exp = freq
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_freq", sum(col("freq")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("rank").collect()
    assert(got.length === exp.length)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getAs[String]("token") === e.getAs[String]("token"))
      assert(g.getAs[Long]("rank") === e.getAs[Long]("rank"))
      assert(g.getAs[Long]("cum_freq") === e.getAs[Long]("cum_freq"))
    }
    // the Zipf curve ends at exactly 100% of token occurrences
    assert(math.abs(got.last.getAs[Double]("cum_frac") - 1.0) < 1e-12)
    // and it is monotone in rank
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("cum_freq") < b.getAs[Long]("cum_freq"))
      assert(a.getAs[Long]("freq") >= b.getAs[Long]("freq"))
    }
  }

  test("q93 packing offsets are a contiguous exclusive prefix sum and window spans are exact") {
    val rows = Curation.q93(spark, sf).collect()
    assert(rows.nonEmpty)
    // offsets reproduce a driver-side cumulative sum in doc_id order
    var expectedStart = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("start_tok") === expectedStart,
        s"doc ${r.getAs[Long]("doc_id")} offset out of sequence")
      expectedStart += r.getAs[Long]("n_tokens")
      // window arithmetic: span covers exactly the doc's token range
      val s = r.getAs[Long]("start_tok"); val n = r.getAs[Long]("n_tokens")
      val fw = r.getAs[Long]("first_win"); val lw = r.getAs[Long]("last_win")
      assert(fw === s / 512)
      assert(lw === (if (n > 0) (s + n - 1) / 512 else s / 512))
      assert(r.getAs[Long]("n_windows") === lw - fw + 1)
    }
    // some docs must straddle a window boundary at these lengths
    assert(rows.exists(_.getAs[Long]("n_windows") > 1))
    assert(rows.exists(_.getAs[Long]("n_windows") === 1))
    // the prefix sum must not funnel through one task: no
    // single-partition exchange anywhere in the plan (the final
    // presentation orderBy is a range exchange, which is fine)
    val plan = Curation.q93(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"orderedPrefix degenerated to a single partition:\n$plan")
  }

  test("q115 best-fit packing: conservation, capacity, zero truncation, determinism") {
    import spark.implicits._
    val cap = 512L
    val rows = Curation.q115(spark, sf).collect()
    assert(rows.nonEmpty)
    // conservation: per-doc piece tokens reconstruct the doc's exact
    // token count, with ceil(n/cap) pieces, split only when n > cap
    val docTokens = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long")
          .as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === docTokens.filter(_._2 > 0L).keySet)
    byDoc.foreach { case (id, ps) =>
      val n = docTokens(id)
      assert(ps.map(_.getAs[Long]("piece_tokens")).sum === n)
      assert(ps.length === ((n + cap - 1) / cap).toInt)
      if (n <= cap) assert(ps.length === 1, s"doc $id ≤ cap was split")
      assert(ps.forall(_.getAs[Long]("piece_tokens") <= cap))
      assert(ps.forall(_.getAs[Long]("piece_tokens") > 0L))
    }
    // capacity + intra-bin layout: fills never exceed cap; offsets
    // tile the bin contiguously from 0 in placement order
    val byBin = rows.groupBy(_.getAs[Long]("bin_id"))
    byBin.foreach { case (b, ps) =>
      val sorted = ps.sortBy(_.getAs[Long]("offset_in_bin"))
      var at = 0L
      sorted.foreach { p =>
        assert(p.getAs[Long]("offset_in_bin") === at, s"bin $b gap at $at")
        at += p.getAs[Long]("piece_tokens")
      }
      assert(at <= cap, s"bin $b overfilled to $at")
    }
    // bins are contiguous 0..B-1 and BFD actually packs: utilization
    // well above one-piece-per-bin, ≥ 90% of perfectly full
    val bins = byBin.keySet
    assert(bins === (0L until bins.size.toLong).toSet)
    val total = rows.map(_.getAs[Long]("piece_tokens")).sum
    val util = total.toDouble / (bins.size * cap).toDouble
    assert(util >= 0.90, s"utilization $util")
    // the q93 contrast: concatenation truncates some doc at nearly
    // every window boundary; best-fit never cuts a ≤ cap doc (pieces
    // of short docs are whole by the conservation block above, and
    // q93 provably straddles here)
    assert(Curation.q93(spark, sf).collect()
      .exists(_.getAs[Long]("n_windows") > 1))
    // determinism: a second run is row-for-row identical
    val again = Curation.q115(spark, sf).collect()
    assert(rows.length === again.length)
    rows.zip(again).foreach { case (a, b) => assert(a === b) }
  }

  test("q72 duplicate-span coverage counts cross-doc grams only and is positional") {
    import spark.implicits._
    val docs = Seq(
      // 0 and 1 share the verbatim run "a b c d e f" → two shared
      // 5-gram positions each ("a b c d e", "b c d e f")
      (0L, "a b c d e f x1 y1 z1"),
      (1L, "q r a b c d e f s t"),
      // 2 repeats ITS OWN 5-gram twice — within-doc repetition alone
      // must not count as duplication (df counts distinct docs)
      (2L, "m n o p q m n o p q m n o p q"),
      // 3 shares nothing
      (3L, "u1 u2 u3 u4 u5 u6 u7")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q72").toString
    docs.write.parquet(s"$tmp/documents.parquet")
    val got = Curation.q72(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("dup_grams"))).toMap
    assert(got(0L) === (5L, 2L))
    assert(got(1L) === (6L, 2L))
    assert(got(2L) === (11L, 0L), "own repeats must not count as duplication")
    assert(got(3L) === (3L, 0L))
    // real-corpus invariants: fraction bounds, verdict consistency,
    // and the positional denominator (n_words - 4)
    val rows = Curation.q72(spark, sf).collect()
    assert(rows.nonEmpty)
    val nWords = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("nw"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("nw")).toMap
    rows.foreach { r =>
      val f = r.getAs[Double]("dup_frac")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Boolean]("flagged") === (f > 0.5))
      assert(r.getAs[Long]("n_grams") ===
        nWords(r.getAs[Long]("doc_id")) - 4L)
    }
  }

  test("q75 pipeline verdicts compose the stage operators with correct precedence") {
    val rows = Curation.q75(spark, sf).collect()
    assert(rows.nonEmpty)
    val byVerdict = rows.groupBy(_.getAs[String]("verdict"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("doc_id")).toSet }
    // stage 1: the eval split is exactly doc_id % 97 == 0
    val evalDocs = rows.map(_.getAs[Long]("doc_id")).filter(_ % 97 == 0).toSet
    assert(byVerdict.getOrElse("eval_doc", Set.empty) === evalDocs)
    // stage 2: rep_reject = q45's rejects minus eval docs
    val q45Rejects = Curation.q45(spark, sf).collect()
      .filter(_.getAs[Boolean]("reject")).map(_.getAs[Long]("doc_id")).toSet
    assert(byVerdict.getOrElse("rep_reject", Set.empty) ===
      q45Rejects -- evalDocs)
    // stage 3: contaminated = q46's hits minus earlier gates
    val q46Docs = Curation.q46(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(byVerdict.getOrElse("contaminated", Set.empty) ===
      q46Docs -- evalDocs -- q45Rejects)
    // stage 4: kept ≤ cap per source; over_cap only from full sources
    val kept = rows.filter(_.getAs[String]("verdict") == "kept")
    val keptBySource = kept.groupBy(_.getAs[String]("source"))
      .map { case (s, v) => s -> v.length }
    keptBySource.values.foreach(n => assert(n <= 15))
    rows.filter(_.getAs[String]("verdict") == "over_cap").foreach { r =>
      assert(keptBySource(r.getAs[String]("source")) === 15,
        "over_cap fired on a source that is not full")
    }
    // stage 5: kept weights form a distribution over languages
    val langW = kept.map(r =>
      r.getAs[String]("lang") -> r.getAs[Double]("sample_weight")).toMap
    assert(math.abs(langW.values.sum - 1.0) < 1e-9)
    kept.foreach(r => assert(r.getAs[Double]("sample_weight") > 0.0))
    rows.filterNot(_.getAs[String]("verdict") == "kept")
      .foreach(r => assert(r.getAs[Double]("sample_weight") === 0.0))
    // every verdict is one of the five gates
    assert(byVerdict.keySet.subsetOf(Set(
      "eval_doc", "rep_reject", "contaminated", "over_cap", "kept")))
  }

  test("q103 verdict-cut-pack: packs exactly the kept corpus with spans removed, offsets contiguous") {
    import spark.implicits._
    val q75 = Curation.q75(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    val keptIds = q75.collect { case (id, "kept") => id }.toSet
    val out = Curation.q103(spark, sf).collect()
    // stage wiring: exactly the kept docs are packed, in doc_id order
    assert(out.map(_.getAs[Long]("doc_id")).toSet === keptIds)
    // offsets are an exclusive prefix sum over the CLEANED lengths:
    // contiguous, starting at zero
    var expectOff = 0L
    out.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
      assert(r.getAs[Long]("start_tok") === expectOff)
      expectOff += r.getAs[Long]("n_tokens")
    }
    // the cut stage actually ran between verdict and pack: packed
    // lengths are raw minus that doc's span cut (recomputed here from
    // cutSpansOn over the kept corpus), and at least one doc shrank
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val kept = docs.filter(col("doc_id").isin(keptIds.toSeq: _*))
    val rawLen = kept.collect().map(r => r.getLong(0) ->
      r.getString(1).trim.split("\\s+").count(_.nonEmpty).toLong).toMap
    // UNION of covered positions, not Σ span_tokens: token intervals
    // of position-disjoint islands can overlap (< SpanN apart), and
    // cleanedDocuments removes the union
    val cutBy = Curation.cutSpansOn(kept).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id ->
        rs.flatMap(r => r.getLong(1) to r.getLong(2)).distinct.length.toLong }
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_tokens") ===
        rawLen(id) - cutBy.getOrElse(id, 0L), s"doc $id")
    }
    assert(cutBy.nonEmpty, "no spans cut in the kept corpus — spec is vacuous")
    // window arithmetic follows from offsets (q93's contract)
    out.foreach { r =>
      val st = r.getAs[Long]("start_tok"); val n = r.getAs[Long]("n_tokens")
      val fw = st / 512
      val lw = if (n > 0) (st + n - 1) / 512 else fw
      assert(r.getAs[Long]("first_win") === fw)
      assert(r.getAs[Long]("last_win") === lw)
      assert(r.getAs[Long]("n_windows") === lw - fw + 1)
    }
  }

  test("q104 full pipeline: line dedup runs between verdict and cut, C4 stage order") {
    import spark.implicits._
    val q75 = Curation.q75(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    val keptIds = q75.collect { case (id, "kept") => id }.toSet
    val out = Curation.q104(spark, sf).collect()
    // stage wiring: exactly the kept docs are packed
    assert(out.map(_.getAs[Long]("doc_id")).toSet === keptIds)
    // offsets are an exclusive prefix sum, contiguous from zero
    var expectOff = 0L
    out.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
      assert(r.getAs[Long]("start_tok") === expectOff)
      expectOff += r.getAs[Long]("n_tokens")
    }
    // recompose the chain from the stage operators: kept → lineDedupOn
    // → cutSpansOn over the LINE-DEDUPED corpus → per-doc length
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val kept = docs.filter(col("doc_id").isin(keptIds.toSeq: _*))
    val lined = Curation.lineDedupOn(kept)
    val linedLen = lined.collect().map(r => r.getLong(0) ->
      r.getString(3).trim.split("\\s+").count(_.nonEmpty).toLong).toMap
    val cutBy = Curation.cutSpansOn(lined.select(col("doc_id"), col("text")))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id ->
        rs.flatMap(r => r.getLong(1) to r.getLong(2)).distinct.length.toLong }
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_tokens") ===
        linedLen(id) - cutBy.getOrElse(id, 0L), s"doc $id")
    }
    // both intermediate stages actually fired on this corpus: line
    // dedup dropped lines (kept lengths shrank vs raw), and the span
    // cut over the line-deduped corpus still found something
    val rawLen = kept.collect().map(r => r.getLong(0) ->
      r.getString(1).trim.split("\\s+").count(_.nonEmpty).toLong).toMap
    assert(keptIds.exists(id => linedLen(id) < rawLen(id)),
      "line dedup dropped nothing in the kept corpus — spec is vacuous")
    assert(cutBy.nonEmpty,
      "no spans cut after line dedup — spec is vacuous")
    // C4 ordering is observable: q104's packed total differs from
    // q103's (cut-only) whenever line dedup removed anything
    val q103Total = Curation.q103(spark, sf)
      .agg(sum(col("n_tokens"))).collect().head.getLong(0)
    val q104Total = out.map(_.getAs[Long]("n_tokens")).sum
    assert(q104Total < q103Total,
      "q104 packed as many tokens as q103 — line-dedup stage had no effect")
  }

  test("q106 mixture realization: copies follow the floor+hash-bump rule, totals track expectations") {
    val weights = Curation.q47(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("expected_docs"))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = Curation.q106(spark, sf).collect()
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out.length === docs.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (lang, text) = docs(id)
      val (nDocs, expected) = weights(lang)
      val rate = expected / nDocs.toDouble
      assert(r.getAs[Double]("rate") === rate, s"doc $id rate")
      // the content-hash bump recomputed independently (JDK MD5)
      val hex = md.digest(text.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val h = java.lang.Long.parseLong(hex, 16)
      val bump = if (h.toDouble / 16777216.0 < rate - math.floor(rate)) 1L else 0L
      assert(r.getAs[Long]("copies") === math.floor(rate).toLong + bump,
        s"doc $id copies")
    }
    // realized totals sit between Σfloor(rate) and Σceil(rate), and
    // the bump actually fires both ways on this corpus
    val copies = out.map(_.getAs[Long]("copies")).sum
    val rates = out.map(_.getAs[Double]("rate"))
    assert(copies >= rates.map(math.floor(_).toLong).sum)
    assert(copies <= rates.map(math.ceil(_).toLong).sum)
    assert(out.exists(r => r.getAs[Long]("copies") >
      math.floor(r.getAs[Double]("rate")).toLong), "no doc ever bumped")
    assert(out.exists(r => r.getAs[Long]("copies") ===
      math.floor(r.getAs[Double]("rate")).toLong), "every doc bumped")
  }

  test("q113 token mixture: rates from token shares, hash-bump realization, budget conserved") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val nTok = docs.map { case (id, _, t) =>
      id -> t.split("\\s+").count(_.nonEmpty).toLong }.toMap
    val langTok = docs.groupBy(_._2).view
      .mapValues(_.map(d => nTok(d._1)).sum).toMap
    // driver twin of the engine's weight arithmetic — same IEEE op
    // sequence, so rates must match bitwise
    val total = langTok.values.sum
    val sp = langTok.view.mapValues(n =>
      math.sqrt(n.toDouble / total.toDouble)).toMap
    val denom = sp.values.map(s => math.floor(s * 1e15).toLong).sum
    val rate = langTok.map { case (l, n) =>
      l -> (sp(l) / (denom.toDouble / 1e15)) * 1000000.0 / n.toDouble }
    val out = Curation.q113(spark, sf).collect()
    assert(out.length === docs.length)
    val texts = docs.map(d => d._1 -> d._3).toMap
    val langs = docs.map(d => d._1 -> d._2).toMap
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_tokens") === nTok(id), s"doc $id n_tokens")
      assert(r.getAs[Double]("rate") === rate(langs(id)), s"doc $id rate")
      val hex = md.digest(texts(id).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val h = java.lang.Long.parseLong(hex, 16)
      val rr = rate(langs(id))
      val bump = if (h.toDouble / 16777216.0 < rr - math.floor(rr)) 1L else 0L
      assert(r.getAs[Long]("copies") === math.floor(rr).toLong + bump,
        s"doc $id copies")
    }
    // the langwise expected token yield recomposes the budget: each
    // lang contributes rate × lang_tokens = w × budget, Σw ≈ 1
    val yielded = rate.map { case (l, rr) => rr * langTok(l).toDouble }.sum
    assert(math.abs(yielded - 1000000.0) < 1.0,
      s"token budget not conserved: $yielded")
    assert(out.exists(r => r.getAs[Long]("copies") >
      math.floor(r.getAs[Double]("rate")).toLong), "no doc ever bumped")
    assert(out.exists(r => r.getAs[Long]("copies") ===
      math.floor(r.getAs[Double]("rate")).toLong), "every doc bumped")
  }

  test("q107 chunking: boundary lengths, 16-token overlap, lossless reconstruction") {
    import spark.implicits._
    val mk = (n: Int) => (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, mk(10)), (2L, mk(64)), (3L, mk(65)), (4L, mk(160)), (5L, ""))
      .toDF("doc_id", "text")
    // route the planted frame through the same column program
    val tmp = java.nio.file.Files.createTempDirectory("graft_chunk").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$tmp/documents.parquet")
    val out = Curation.q107(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    val byDoc = out.groupBy(_._1)
    // chunk counts at the boundaries: ≤W → 1; W+1 → 2; the last chunk
    // REACHES the end instead of spawning a tail fragment
    assert(byDoc(1L).length === 1 && byDoc(2L).length === 1)
    assert(byDoc(3L).length === 2 && byDoc(4L).length === 3)
    assert(!byDoc.contains(5L))
    assert(byDoc(3L).map(c => (c._3, c._4)).toSet === Set((1L, 64L), (49L, 65L)))
    byDoc.values.foreach { chunks =>
      val sorted = chunks.sortBy(_._2).toSeq
      // starts advance by the stride; texts are the exact token slices
      sorted.zipWithIndex.foreach { case ((_, cid, st, en, n, text), i) =>
        assert(cid === i + 1L)
        assert(st === i * 48L + 1L)
        assert(n === en - st + 1L)
        assert(text.split(" ").length.toLong === n)
      }
      // consecutive chunks overlap by exactly W − S = 16 tokens
      // (except a clamped last chunk, which overlaps MORE)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 - b._3 + 1L >= 16L)
        case _ =>
      }
      // reconstruction: stitching each chunk's non-overlapping suffix
      // onto the first rebuilds the document exactly
      val doc = (1 to sorted.last._4.toInt).map(i => s"t$i").mkString(" ")
      val rebuilt = sorted.head._6 +: sorted.sliding(2).collect {
        case Seq(a, b) if b._4 > a._4 =>
          b._6.split(" ").drop((a._4 - b._3 + 1L).toInt).mkString(" ")
      }.toSeq
      assert(rebuilt.filter(_.nonEmpty).mkString(" ") === doc)
    }
  }

  test("q108 manifest: contiguous global order, exactly q106's epochs, decorrelated neighbors") {
    val out = Curation.q108(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // positions are exactly 1..N in order-key order
    assert(out.map(_._1).toSeq === (1L to out.length).toSeq)
    assert(out.map(_._2).toSeq === out.map(_._2).sorted.toSeq)
    // the manifest realizes exactly q106's copy counts: doc d appears
    // with epochs 1..copies(d), each exactly once
    val copies = Curation.q106(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("copies")).toMap
    val byDoc = out.groupBy(_._3)
    assert(byDoc.keySet === copies.filter(_._2 > 0).keySet)
    byDoc.foreach { case (d, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1L to copies(d)).toSeq, s"doc $d")
    }
    // the shuffle decorrelates: consecutive epochs of the same doc
    // are NOT adjacent in the global order for the vast majority of
    // docs (hash interleaving), and docs do not appear in id order
    val adjacentSameDoc = out.toSeq.sliding(2).count {
      case Seq(a, b) => a._3 == b._3
      case _ => false
    }
    assert(adjacentSameDoc < out.length / 20,
      s"$adjacentSameDoc adjacent same-doc pairs — not shuffled")
    assert(out.map(_._3).toSeq !== out.map(_._3).sorted.toSeq)
    // determinism: a second run is identical
    val again = Curation.q108(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === out.toSeq)
  }

  test("q101 line dedup: planted duplicate lines drop everywhere, CDC re-scan is exactly empty") {
    import spark.implicits._
    // Breakers end a content-defined line: tokens whose first char's
    // code point ≡ 0 mod 4 ('d','h','l','p','t','x'…). Planted:
    // docs 0 and 1 share the line "cc dd"; doc 2 is one unique tail
    // line; doc 3 repeats a line INTERNALLY (corpus count 2 — both
    // copies must drop, q100's total-occurrence semantics).
    val docs = Seq(
      (0L, "aa bb tt cc dd"),          // lines: [aa bb tt][cc dd]
      (1L, "zz tt cc dd qq"),          // lines: [zz tt][cc dd][qq]
      (2L, "mm nn oo"),                // lines: [mm nn oo] (tail only)
      (3L, "ee tt ee tt")              // lines: [ee tt][ee tt]
    ).toDF("doc_id", "text")
    // the segmentation helper behaves as documented
    assert(Curation.cdcLinesOf("aa bb tt cc dd").toSeq ===
      Seq("aa bb tt", "cc dd"))
    assert(Curation.cdcLinesOf("mm nn oo").toSeq === Seq("mm nn oo"))
    assert(Curation.cdcLinesOf("").isEmpty)
    val got = Curation.lineDedupOn(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(0L) === ((2L, 1L, "aa bb tt")))
    assert(got(1L) === ((3L, 1L, "zz tt qq")))
    assert(got(2L) === ((1L, 0L, "mm nn oo")))
    assert(got(3L) === ((2L, 2L, "")))
    // C4 acceptance, exact thanks to content-defined boundaries:
    // deleting whole lines cannot re-align surviving lines, so a
    // second pass over the cleaned output finds ZERO duplicates —
    // asserted on the real corpus, not just the planted one
    val cleaned = Curation.q101(spark, sf).select(col("doc_id"), col("text"))
    val rescan = Curation.lineDedupOn(cleaned)
    assert(rescan.agg(sum(col("n_dup_lines"))).collect().head.getLong(0) === 0L,
      "line dedup is not idempotent: re-scan found duplicated lines")
    // and the first pass actually fired on the corpus
    val first = Curation.q101(spark, sf)
      .agg(sum(col("n_dup_lines"))).collect().head.getLong(0)
    assert(first > 0L, "corpus contains no duplicated lines — spec is vacuous")
  }

  test("q100 cut spans: bit-equal to a local brute force on planted overlaps") {
    import spark.implicits._
    // A/B share a 14-token run (cross-doc); C is unique; D repeats a
    // 12-token phrase internally (both copies must cut); E shares only
    // 4 tokens with A — below the 5-gram width, invisible by design
    val shared = (1 to 14).map(i => s"dup$i").mkString(" ")
    val phrase = (1 to 12).map(i => s"rep$i").mkString(" ")
    val docs = Seq(
      (0L, s"a0 a1 a2 $shared a3 a4 a5"),
      (1L, s"b0 $shared b1 b2 b3 b4 b5 b6"),
      (2L, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11"),
      (3L, s"d0 $phrase d1 d2 $phrase d3"),
      (4L, "e0 dup1 dup2 dup3 dup4 e1 e2 e3 e4 e5 e6")
    ).toDF("doc_id", "text")
    val got = Curation.cutSpansOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // reference implementation, brute force: count every 5-gram's
    // corpus occurrences in a local map, mark duplicated window
    // starts, merge consecutive starts into islands, keep length ≥ 10
    val toks = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
      .toMap
    val occ = scala.collection.mutable.Map.empty[String, Int]
    toks.values.foreach { w =>
      w.sliding(5).filter(_.size == 5)
        .foreach(g => occ(g.mkString(" ")) = occ.getOrElse(g.mkString(" "), 0) + 1)
    }
    val want = toks.flatMap { case (id, w) =>
      val dupStarts = w.sliding(5).zipWithIndex
        .collect { case (g, i) if g.size == 5 && occ(g.mkString(" ")) >= 2 =>
          i + 1 }
        .toSeq
      val islands = dupStarts.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p.toLong) :: rest
        case (acc, p) => (p.toLong, p.toLong) :: acc
      }.reverse
      islands.map { case (s, e) => (id, s, e + 4, e + 4 - s + 1) }
        .filter(_._4 >= Curation.CutMinTokens)
    }.toSet
    assert(got === want)
    // the planted structure is actually exercised: A and B carry the
    // shared run, D carries BOTH phrase copies, C and E are silent
    assert(got.map(_._1) === Set(0L, 1L, 3L))
    assert(got.count(_._1 == 3L) === 2)
    // Lee '21 acceptance: re-scanning the cleaned corpus finds no
    // duplicated span ≥ minLen anywhere
    val cleaned = Curation.cleanedDocuments(docs)
    assert(Curation.cutSpansOn(cleaned).isEmpty,
      "cleaned corpus still contains duplicated spans")
    // untouched docs round-trip verbatim; cut docs lost exactly their
    // spans' tokens
    val after = cleaned.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after(2L) === toks(2L).mkString(" "))
    assert(after(4L) === toks(4L).mkString(" "))
    val cutTokens = got.toSeq.filter(_._1 == 0L).map(_._4).sum
    assert(after(0L).trim.split("\\s+").length ===
      toks(0L).length - cutTokens)
  }

  test("q100/q103 overlapping islands: cleaning removes the interval UNION, not the sum") {
    import spark.implicits._
    // doc 0 carries w1..w17; doc 1 duplicates its first 10 tokens,
    // doc 2 its last 10. Doc 0's duplicated window starts are {1..6}
    // and {8..13} (window 7 = w7..w11 occurs once) — two position-
    // disjoint islands whose TOKEN intervals [1,10] and [8,17]
    // overlap at 8..10. Union = 17 tokens (the whole doc); a naive
    // Σ span_tokens = 20 > doc length would imply negative n_tokens.
    val w = (1 to 17).map(i => s"w$i")
    val docs = Seq(
      (0L, w.mkString(" ")),
      (1L, w.take(10).mkString(" ")),
      (2L, w.drop(7).mkString(" "))
    ).toDF("doc_id", "text")
    val spans = Curation.cutSpansOn(docs).collect()
      .filter(_.getLong(0) == 0L).map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(spans === Seq((1L, 10L), (8L, 17L)))
    assert(spans.map { case (s, e) => e - s + 1 }.sum === 20L)
    assert(spans.flatMap { case (s, e) => s to e }.distinct.length === 17)
    val cleaned = Curation.cleanedDocuments(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(0L) === "", "union of overlapping cuts must empty doc 0")
  }

  test("q47 weights are a proper tempered distribution") {
    val rows = Curation.q47(spark, sf).collect()
    assert(rows.length > 1)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-9, s"weights sum to $wsum")
    // temperature flattens: tempered weight exceeds raw share for
    // rare langs and trails it for common ones
    rows.foreach { r =>
      val p = r.getAs[Double]("p_raw")
      val w = r.getAs[Double]("weight")
      val mean = 1.0 / rows.length
      if (p < mean * 0.9) assert(w > p, s"rare lang not up-weighted: p=$p w=$w")
    }
  }

  test("cleanedDocuments fixpoint: converges a planted splice-minted span the single pass provably leaves; real corpus is a one-pass fixpoint") {
    import spark.implicits._
    // adversarial construction: doc 1 = M[1..5] ++ S ++ M[6..10] where
    // S (10 tokens) duplicates doc 3 — round 1 cuts S from both, and
    // the splice of doc 1's flanks mints M = m1..m10, duplicating
    // doc 2. M's halves ARE corpus-duplicated pre-cut, but each is a
    // 5-token island, below the 10-token cut threshold — only the
    // splice joins them into a cuttable span.
    val m = (1 to 10).map(i => s"m$i")
    val s = (1 to 10).map(i => s"s$i")
    val docs = Seq(
      (1L, (m.take(5) ++ s ++ m.drop(5)).mkString(" ")),
      (2L, m.mkString(" ")),
      (3L, s.mkString(" ")))
      .toDF("doc_id", "text")
    def textsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the single pass leaves the minted span: doc 1 and doc 2 both
    // read M, and a re-scan finds the 10-token duplicated span
    val single = Curation.cleanedDocuments(docs)
    val singleTexts = textsOf(single)
    assert(singleTexts(1L) === m.mkString(" "))
    assert(singleTexts(2L) === m.mkString(" "))
    assert(singleTexts(3L) === "")
    assert(Curation.cutSpansOn(single).count() > 0,
      "planted corpus failed to mint a splice span — fixture broken")
    // the fixpoint converges it: re-scan of the output is EMPTY
    val fixed = Curation.cleanedDocumentsFixpoint(docs)
    assert(Curation.cutSpansOn(fixed).count() === 0,
      "fixpoint output still contains duplicated spans")
    val fixedTexts = textsOf(fixed)
    assert(fixedTexts(1L) === "" && fixedTexts(2L) === "" &&
      fixedTexts(3L) === "")
    // the real corpus converges in ONE pass: fixpoint == single pass,
    // so q103/q104's single-pass default is already at the fixpoint
    val real = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    assert(textsOf(Curation.cleanedDocumentsFixpoint(real)) ===
      textsOf(Curation.cleanedDocuments(real)))
  }

  private def verdictMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap

  test("incremental line dedup equals a full recompute on the real corpus; standing side never sort-merge-joins") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val standing = docs.filter(col("doc_id") % 7 =!= 0)
    val batch = docs.filter(col("doc_id") % 7 === 0)
    val state = Curation.lineDedupState(standing)
    // the nightly artifact renders exactly the full pass over standing
    val nightly = verdictMap(
      Curation.lineVerdictsFrom(standing, state.segments))
    assert(nightly === verdictMap(Curation.lineDedupOn(standing)))
    val (newState, reV) = Curation.lineDedupIncrement(state, batch)
    // increment == full recompute over the union corpus: nightly
    // verdicts overridden by the re-verdicted docs
    val full = verdictMap(Curation.lineDedupOn(standing.union(batch)))
    val incremental = nightly ++ verdictMap(reV)
    assert(incremental === full)
    // the re-verdict set is real work, not the whole corpus
    val nRe = reV.count()
    assert(nRe >= batch.count(), "batch docs must all be re-verdicted")
    assert(nRe < docs.count(), "increment re-verdicted everything")
    // the updated state renders the union verdicts and its counts
    // equal a from-scratch count
    assert(verdictMap(Curation.lineVerdictsFrom(docs, newState.segments))
      === full)
    val fromScratch = Curation.lineDedupState(standing.union(batch))
      .counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val folded = newState.counts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(folded === fromScratch)
    // every join in the increment broadcasts — the corpus-sized
    // standing relations are scanned, never exchanged (ccincr's rule)
    val plan = reV.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"increment plan sort-merge-joins:\n$plan")
  }

  test("line dedup decrement equals a full recompute over survivors; standing side never sort-merge-joins") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val survivors = docs.filter(col("doc_id") % 7 =!= 0)
    val removed = docs.filter(col("doc_id") % 7 === 0)
    val state = Curation.lineDedupState(docs)
    val nightly = verdictMap(Curation.lineVerdictsFrom(docs, state.segments))
    val removedIds = removed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val (newState, reV) = Curation.lineDedupDecrement(
      state, removed.select(col("doc_id")))
    // compose: nightly verdicts minus departed docs, overridden by
    // the re-verdicted survivors == full recompute over survivors
    val full = verdictMap(Curation.lineDedupOn(survivors))
    val composed = (nightly -- removedIds) ++ verdictMap(reV)
    assert(composed === full)
    // the re-verdict set is bounded, not the whole corpus
    assert(reV.count() < survivors.count())
    // the folded state renders the survivor verdicts and its counts
    // equal a from-scratch count over survivors
    assert(verdictMap(Curation.lineVerdictsFrom(
      survivors, newState.segments)) === full)
    val fromScratch = Curation.lineDedupState(survivors)
      .counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val folded = newState.counts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(folded === fromScratch)
    // corpus-sized relations are scanned, never exchanged
    val plan = reV.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"decrement plan sort-merge-joins:\n$plan")
  }

  test("line dedup decrement planted: a 2->1 crossing flips the surviving holder; n>=3 lines stay dup; departing-only lines vanish") {
    import spark.implicits._
    val standing = Seq(
      (1L, "a b d e f d"),   // lines "a b d", "e f d"
      (2L, "e f d"),         // the other "e f d" holder
      (3L, "a b d a b d"),   // "a b d" twice more (count 3 total)
      (4L, "g g d"))         // unique line, departs with its doc
      .toDF("doc_id", "text")
    val state = Curation.lineDedupState(standing)
    val (newState, reV) = Curation.lineDedupDecrement(
      state, Seq(2L, 4L).toDF("doc_id"))
    val re = verdictMap(reV)
    // exactly doc 1 re-verdicts: its "e f d" crossed 2 -> 1; doc 3's
    // "a b d" fell 3 -> 2 (still dup), doc 4 left, doc 2 left
    assert(re.keySet === Set(1L))
    assert(re(1L) === ((2L, 1L, "e f d")))
    val survivors = standing.filter(col("doc_id").isin(1L, 3L))
    val full = verdictMap(Curation.lineDedupOn(survivors))
    assert(verdictMap(Curation.lineVerdictsFrom(
      survivors, newState.segments)) === full)
    // counts: "a b d" untouched at 3 (no departing doc held it),
    // "e f d" 2 -> 1, "g g d" 1 -> 0 (vanishes with doc 4)
    val counts = newState.counts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a b d" -> 3L, "e f d" -> 1L))
  }

  private def spanSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet

  test("incremental cut spans equal a full recompute on the real corpus; standing side never sort-merge-joins") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val standing = docs.filter(col("doc_id") % 7 =!= 0)
    val batch = docs.filter(col("doc_id") % 7 === 0)
    val state = Curation.cutSpanState(standing)
    // the nightly artifact renders exactly the full pass over standing
    val nightly = spanSet(Curation.spansFromFlags(state.grams))
    assert(nightly === spanSet(Curation.cutSpansOn(standing)))
    val (newState, spans) = Curation.cutSpanIncrement(state, batch)
    val reDocs = spans.select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    // compose: nightly spans for untouched docs + re-derived spans
    val full = spanSet(Curation.cutSpansOn(standing.union(batch)))
    val batchIds = batch.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    // the re-derivation scope: every batch doc with spans plus any
    // affected standing doc — and outside it, nightly rows must agree
    // with the full recompute untouched
    val affectedOrBatch = reDocs ++ batchIds
    val composed = nightly.filterNot(s => affectedOrBatch(s._1)) ++
      spanSet(spans)
    assert(composed === full)
    // the updated state renders the union span set in one shot
    assert(spanSet(Curation.spansFromFlags(newState.grams)) === full)
    // counts folded exactly
    val fromScratch = Curation.cutSpanState(standing.union(batch))
      .counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(newState.counts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap === fromScratch)
    // batch-bounded cost: no shuffle join of the standing relations
    val plan = spans.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"increment plan sort-merge-joins:\n$plan")
  }

  test("cut-span decrement equals a full recompute over survivors; standing side never sort-merge-joins") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val survivors = docs.filter(col("doc_id") % 7 =!= 0)
    val removed = docs.filter(col("doc_id") % 7 === 0)
    val state = Curation.cutSpanState(docs)
    val nightly = spanSet(Curation.spansFromFlags(state.grams))
    val removedIds = removed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val (newState, affected, spans) = Curation.cutSpanDecrement(
      state, removed.select(col("doc_id")))
    val affectedIds = affected.collect().map(_.getLong(0)).toSet
    // compose: nightly spans minus departed docs minus affected docs,
    // plus the re-derived spans (a re-derived doc can have NONE — the
    // explicit affected set is what makes this composable)
    val full = spanSet(Curation.cutSpansOn(survivors))
    val composed = nightly.filterNot(s =>
      removedIds(s._1) || affectedIds(s._1)) ++ spanSet(spans)
    assert(composed === full)
    assert(spans.select(col("doc_id")).distinct().collect()
      .map(_.getLong(0)).toSet.subsetOf(affectedIds))
    // the folded state renders the survivor span set in one shot and
    // its counts equal a from-scratch count
    assert(spanSet(Curation.spansFromFlags(newState.grams)) === full)
    val fromScratch = Curation.cutSpanState(survivors)
      .counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(newState.counts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap === fromScratch)
    val plan = spans.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"decrement plan sort-merge-joins:\n$plan")
  }

  test("cut-span decrement planted: a 2->1 run's span vanishes from the survivor; a 3-holder run keeps its spans") {
    import spark.implicits._
    val s = (1 to 12).map(i => s"s$i").mkString(" ")
    val t = (1 to 12).map(i => s"t$i").mkString(" ")
    val standing = Seq(
      (1L, s),               // S in docs 1, 2 — dup pair
      (2L, s"p1 p2 $s"),
      (3L, t), (4L, t), (5L, t), // T in three docs
      (6L, "only unique words here nothing shared"))
      .toDF("doc_id", "text")
    val state = Curation.cutSpanState(standing)
    // doc 1 and 2 carry an S span nightly
    val nightly = spanSet(Curation.spansFromFlags(state.grams))
    assert(nightly.exists(_._1 == 1L) && nightly.exists(_._1 == 2L))
    val (newState, affected, spans) = Curation.cutSpanDecrement(
      state, Seq(2L, 5L).toDF("doc_id"))
    // doc 1 is affected (its S grams crossed 2 -> 1) and ends with NO
    // span; docs 3/4 keep T (3 -> 2, still dup) and are NOT affected
    assert(affected.collect().map(_.getLong(0)).toSet === Set(1L))
    assert(spans.count() === 0L)
    val survivors = standing.filter(!col("doc_id").isin(2L, 5L))
    val full = spanSet(Curation.cutSpansOn(survivors))
    assert(spanSet(Curation.spansFromFlags(newState.grams)) === full)
    assert(full.exists(_._1 == 3L) && full.exists(_._1 == 4L))
    assert(!full.exists(_._1 == 1L))
  }

  test("incremental cut spans planted: a bridged singleton run flips its standing doc; already-dup runs don't; batch-internal dups span") {
    import spark.implicits._
    val s = (1 to 12).map(i => s"s$i").mkString(" ")
    val t = (1 to 10).map(i => s"t$i").mkString(" ")
    val u = (1 to 11).map(i => s"u$i").mkString(" ")
    val standing = Seq(
      (1L, s"p1 p2 p3 $s"), // S once in standing — the bridge target
      (2L, t), (3L, t))     // T already dup within standing
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, s),             // bridges doc 1's singleton run
      (11L, t),             // matches the ALREADY-dup run
      (12L, u), (13L, u))   // batch-internal dup
      .toDF("doc_id", "text")
    val state = Curation.cutSpanState(standing)
    assert(spanSet(Curation.spansFromFlags(state.grams))
      .map(_._1) === Set(2L, 3L))
    val (newState, spans) = Curation.cutSpanIncrement(state, batch)
    val got = spanSet(spans)
    // doc 1 re-derived with S's 12 tokens cut (positions 4..15);
    // docs 2/3 NOT re-derived (no gram crossed 1 -> 2)
    assert(got.map(_._1) === Set(1L, 10L, 11L, 12L, 13L))
    assert(got.contains((1L, 4L, 15L, 12L)))
    assert(got.contains((10L, 1L, 12L, 12L)))
    assert(got.contains((11L, 1L, 10L, 10L)))
    assert(got.contains((12L, 1L, 11L, 11L)))
    assert(got.contains((13L, 1L, 11L, 11L)))
    // and the state renders the full-union truth
    assert(spanSet(Curation.spansFromFlags(newState.grams)) ===
      spanSet(Curation.cutSpansOn(standing.union(batch))))
  }

  test("incremental line dedup planted: bridge flips a standing doc, batch-internal dups drop, already-dup lines don't re-verdict their docs") {
    import spark.implicits._
    // token first-code-point mod 4 == 0 ends a line: 'd' (100) and
    // 'h' (104) are breakers; a/b/e/f/g are not
    val standing = Seq(
      (1L, "a b d e f d"),   // lines: "a b d", "e f d"
      (2L, "g g d"),         // line:  "g g d"
      (3L, "a b d a b d"))   // "a b d" twice — dup within standing
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "e f d"),        // bridges doc 1's singleton
      (11L, "h"),            // batch-internal dup with doc 12
      (12L, "h"),
      (13L, "a b d"))        // matches an ALREADY-dup standing line
      .toDF("doc_id", "text")
    val state = Curation.lineDedupState(standing)
    val (newState, reV) = Curation.lineDedupIncrement(state, batch)
    val re = verdictMap(reV)
    // exactly doc 1 (the bridged standing doc) + the batch re-verdict;
    // doc 3's line was already dup (no crossing), doc 2 untouched
    assert(re.keySet === Set(1L, 10L, 11L, 12L, 13L))
    // doc 1: "a b d" was already corpus-dup nightly, "e f d" now
    // flips — nothing survives
    assert(re(1L) === ((2L, 2L, "")))
    assert(re(10L) === ((1L, 1L, "")))
    // batch-internal dup: both copies drop
    assert(re(11L) === ((1L, 1L, "")))
    assert(re(12L) === ((1L, 1L, "")))
    assert(re(13L) === ((1L, 1L, "")))
    // equality with the full recompute, planted edition
    val full = verdictMap(
      Curation.lineDedupOn(standing.union(batch)))
    val nightly = verdictMap(
      Curation.lineVerdictsFrom(standing, state.segments))
    assert(nightly ++ re === full)
    assert(verdictMap(Curation.lineVerdictsFrom(
      standing.select(col("doc_id")).union(batch.select(col("doc_id"))),
      newState.segments)) === full)
  }

  test("q132 planted host graph: mean-split tiers exact, weights divided by 1+tier") {
    import spark.implicits._
    // boilerplate 8-gram shared A<->B by 2 docs each (4 cross-source
    // pairs), a second 8-gram shared A<->C once, D isolated; filler
    // words unique per doc so no accidental collisions. Graph:
    // wdeg A=5, B=4, C=1; n=3, tot=10 -> tier2 iff wdeg*3 >= 10
    // (A, B), tier1 = C, tier0 = D.
    val tpl = (1 to 8).map(i => s"tpl$i").mkString(" ")
    val xyz = (1 to 8).map(i => s"xyz$i").mkString(" ")
    def filler(tag: String) = (1 to 6).map(i => s"f$tag$i").mkString(" ")
    val docs = Seq(
      (1L, s"${filler("a1")} $tpl $xyz ${filler("a1x")}", "en", "srcA"),
      (2L, s"${filler("a2")} $tpl ${filler("a2x")}", "en", "srcA"),
      (3L, s"${filler("b1")} $tpl ${filler("b1x")}", "en", "srcB"),
      (4L, s"${filler("b2")} $tpl ${filler("b2x")}", "en", "srcB"),
      (5L, s"${filler("c1")} $xyz ${filler("c1x")}", "de", "srcC"),
      (6L, s"${filler("d1")} plain unshared words only here now then", "de", "srcD"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_q132").toString
    docs.write.parquet(s"$tmp/documents.parquet")
    val got = Curation.q132(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(4),
        r.getDouble(5))).toMap
    val wantTier = Map("srcA" -> 2L, "srcB" -> 2L, "srcC" -> 1L,
      "srcD" -> 0L)
    got.foreach { case (id, (srcName, tier, _)) =>
      assert(tier === wantTier(srcName), s"doc $id source $srcName")
    }
    // adj_weight is EXACTLY q75's sample_weight / (1 + tier) — the
    // prior downweights, never re-verdicts
    val q75w = Curation.q75(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    got.foreach { case (id, (_, tier, adj)) =>
      assert(adj === q75w(id) / (1.0 + tier), s"doc $id")
    }
  }

  test("q132 on the real corpus: all three tiers inhabited, mean split is the int64 compare") {
    val rows = Curation.q132(spark, sf).collect()
    val tiers = rows.map(_.getLong(4)).toSet
    assert(tiers === Set(0L, 1L, 2L),
      s"host tiers degenerate at sf0.001: $tiers")
    // every doc of one source carries one tier (source-grain prior)
    val bySrc = rows.groupBy(_.getString(2))
      .map { case (s, rs) => s -> rs.map(_.getLong(4)).toSet }
    assert(bySrc.values.forall(_.size == 1),
      "a source carries more than one tier")
  }

  test("q132 dfCap is non-binding on the gate corpora (and the SQL twin mirrors it)") {
    // The ADVICE-r13 medium: cappedPairs tombstones grams whose df
    // exceeds dfCap MAP-SIDE — exactly the template-farm signal q132
    // measures — so the bound must be PINNED, not just claimed in a
    // scaladoc. The oracle now mirrors the cap (q132Sql's hok CTE);
    // this asserts the cap is far from binding on both gate corpora,
    // so engine and oracle agree with or without it.
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val maxDf = Curation.hostGrams(spark, dir)
        .groupBy(org.apache.spark.sql.functions.col("h"))
        .count()
        .agg(org.apache.spark.sql.functions.max("count"))
        .collect().head.getLong(0)
      assert(maxDf <= operators.Dedup.DefaultDfCap,
        s"8-gram df $maxDf exceeds dfCap ${operators.Dedup.DefaultDfCap} at $dir")
      assert(maxDf <= 16,
        s"8-gram df $maxDf is within an order of the cap at $dir — " +
          "re-examine before trusting the non-binding claim")
    }
    // and the SQL twin does carry the mirrored stop-shingle filter
    assert(Curation.q132Sql.contains(
      s"HAVING COUNT(*) <= ${operators.Dedup.DefaultDfCap}"))
  }

  test("host-tier session cache: q132 bit-identical across a warm re-read and a cold session") {
    def dump(s: org.apache.spark.sql.SparkSession) =
      Curation.q132(s, sf).collect().map(_.toSeq).toSeq
    val cold = dump(spark)
    val warm = dump(spark)            // same session: cached tiers
    val fresh = dump(spark.newSession()) // new session: cold rebuild
    assert(warm === cold, "warm tier cache changed q132")
    assert(fresh === cold, "cold rebuild changed q132")
  }

  test("q133 realization under the host prior: rates recompose from q132, the prior provably changes the draw, totals conserved") {
    val sampleSize = 10000
    val pri = Curation.q132(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(3), r.getLong(4), r.getDouble(5))).toMap
    val rows = Curation.q133(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet === pri.keySet)
    // driver-side recomputation of the exact-int64 denominator
    val denom = pri.values.map { case (_, _, adj) =>
      math.floor(adj * 1e9).toLong }.sum
    rows.foreach { r =>
      val (verdict, tier, adj) = pri(r.getLong(0))
      assert(r.getString(3) === verdict)
      assert(r.getLong(4) === tier)
      val want = adj * sampleSize.toDouble / (denom.toDouble / 1e9)
      assert(r.getDouble(5) === want, s"doc ${r.getLong(0)} rate")
      // non-kept docs never draw
      if (verdict != "kept")
        assert(r.getDouble(5) === 0.0 && r.getLong(6) === 0L)
      // copies is floor(rate) or floor(rate)+1, nothing else
      assert(r.getLong(6) === math.floor(want).toLong ||
        r.getLong(6) === math.floor(want).toLong + 1)
    }
    // the PRIOR changes the draw: among kept docs, rate*(1+tier) is
    // constant per lang (the undamped lang rate), and at least one
    // lang draws at MORE than one distinct tier — so two equal-weight
    // docs of one language provably realize at different rates
    val kept = rows.filter(_.getString(3) == "kept")
    val byLang = kept.groupBy(_.getString(1))
    byLang.foreach { case (lang, ks) =>
      val undamped = ks.map(r => r.getDouble(5) * (1.0 + r.getLong(4)))
      assert(undamped.max - undamped.min <= 1e-9 * undamped.max,
        s"lang $lang: rate*(1+tier) not constant")
    }
    assert(byLang.values.exists(_.map(_.getLong(4)).distinct.length > 1),
      "no lang draws at two tiers — the prior changed nothing")
    // conservation: E[sum copies] = sum rate ~= sampleSize; the
    // deterministic hash-bump realization stays within a few dozen
    val total = kept.map(_.getLong(6)).sum
    assert(math.abs(total - sampleSize) < 200,
      s"realized $total of $sampleSize")
  }

  test("q136 planted corpus: exact hand-computed economics at two caps; zero-token doc conventions") {
    import spark.implicits._
    // docs of 3, 20, 70 and 0 tokens; ladder {8, 64}. Hand values:
    //   cap 8:  fit 2/4 (3-tok + empty), chunks 1+3+9+0 = 13,
    //           pad 13*8-93 = 11 (ppm 11e6//104 = 105769),
    //           trunc 0+12+62+0 = 74 (ppm 74e6//93 = 795698)
    //   cap 64: fit 3/4, chunks 1+1+2+0 = 4, pad 256-93 = 163
    //           (ppm 163e6//256 = 636718), trunc 6 (ppm 64516)
    val docs = Seq(
      "a b c",
      (1 to 20).map(i => s"w$i").mkString(" "),
      (1 to 70).map(i => s"x$i").mkString(" "),
      "").toDF("text")
    val got = Curation.ctxSweepOn(docs, Seq(8L, 64L)).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got(8L) === Seq(4L, 2L, 500000L, 93L, 13L, 11L, 105769L,
      74L, 795698L))
    assert(got(64L) === Seq(4L, 3L, 750000L, 93L, 4L, 163L, 636718L,
      6L, 64516L))
  }

  test("q136 real corpus: ladder discriminates and the curves are monotone") {
    val rows = operators.Curation.q136(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(7), r.getLong(9)))
      .sortBy(_._1)
    assert(rows.map(_._1) === Curation.CtxLadder)
    // bottom rung forces truncation/chunking, top rung saturates —
    // the ladder brackets the (SF-stable) token distribution
    assert(rows.head._2 < 1000000L, "every doc fits at rung 16?!")
    assert(rows.last._2 === 1000000L && rows.last._4 === 0L)
    // fit share rises with cap; truncation loss falls
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._4 >= b._4 })
  }
}
