package graft
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

object Bench {

  /** One query's bench sample: min wall, per-run-averaged shuffle and
    * spill, MARGINAL codegen footprint (generated classes + JIT ms
    * beyond the sf0.001 warmup), error if any.
    */
  private case class QRes(name: String, wall: Double, shMb: Double,
      spMb: Double, cgClasses: Long, jitMs: Long, err: Option[String],
      runs: Seq[Double] = Seq.empty)

  /** (wall_sec, shuffle_mb) per query from a bench detail line —
    * the tolerant inverse of the writer below (numeric sections only;
    * our own keys carry no escapes).
    */
  private[graft] def parseDetail(json: String): Map[String, (Double, Double)] = {
    def section(key: String): Map[String, Double] =
      (s""""$key":\\{([^}]*)\\}""").r.findFirstMatchIn(json)
        .map(_.group(1)).getOrElse("").split(",").iterator
        .map(_.trim).filter(_.nonEmpty)
        .flatMap { kv =>
          kv.split(":") match {
            case Array(k, v) =>
              try Some(k.replace("\"", "") -> v.toDouble)
              catch { case _: NumberFormatException => None }
            case _ => None
          }
        }.toMap
    val walls = section("queries")
    val sh = section("shuffle_mb")
    walls.map { case (k, w) => k -> (w, sh.getOrElse(k, 0.0)) }
  }

  /** The "sf" stamp of a detail line — deltas are only meaningful
    * against a run at the same scale factor.
    */
  private[graft] def sfOf(json: String): Option[String] =
    """"sf":"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1))

  /** Regression classification vs the previous committed detail,
    * per the round-6 phantom-regression analysis: a SHUFFLE delta is
    * a plan change (kind "plan" — bytes through the exchange don't
    * move with env noise); a wall blow-up at EQUAL shuffle is kind
    * "wall" — deliberately NEUTRAL, not "noise": equal shuffle means
    * the PLAN didn't change, but the cause can be either environment
    * (JIT storm / shared box, the common case here) or a genuine
    * same-plan compute regression (slower closure/expression, bigger
    * driver collect), and the tripwire cannot tell them apart from
    * one sample. Reading rule: a "wall" trip that persists across
    * consecutive runs is real — re-run before dismissing. A query
    * present before and absent now is kind "gone". New queries are
    * not regressions. Values are (prev, cur) of the tripping metric:
    * shuffle MB for "plan", wall seconds for "wall"/"gone".
    */
  private[graft] def regressionsOf(
      prev: Map[String, (Double, Double)],
      cur: Map[String, (Double, Double)]): Seq[(String, String, Double, Double)] = {
    val tripped = cur.toSeq.sortBy(_._1).flatMap { case (q, (w, s)) =>
      prev.get(q).flatMap { case (pw, ps) =>
        val shuffleMoved = math.abs(s - ps) > math.max(0.05, 0.02 * ps)
        if (shuffleMoved) Some((q, "plan", ps, s))
        else if (w > pw * 1.5 && w - pw > 0.5) Some((q, "wall", pw, w))
        else None
      }
    }
    tripped ++ prev.keySet.diff(cur.keySet).toSeq.sorted
      .map(q => (q, "gone", prev(q)._1, 0.0))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // 94 queries × ~10 generated classes × (warmup + 2 timed runs)
      // overflows the old 2000-entry cache — evicted giants (q31 pair
      // emission, q75 pipeline segments) then recompile INSIDE the
      // timed runs, reading as multi-second query regressions
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // shuffle/spill telemetry: wall time says WHETHER a query got
    // slower, bytes-through-the-shuffle says WHY
    val shuffleBytes = new AtomicLong
    val spilledBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          spilledBytes.addAndGet(m.memoryBytesSpilled)
        }
      }
    })
    // warm-up at the smallest SF: JIT, codegen cache, parquet reader,
    // shuffle machinery — so timed runs below measure steady state
    // optional single/subset-query mode for iterating on one operator
    // (comma-separated names); full runs leave it unset
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queryList = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      queryList.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    // codegen/JIT telemetry (round 9): the 2 GiB code cache is the
    // HotSpot maximum and the §8g q39 storm showed it is now the
    // binding resource at 109 queries — so the detail file records,
    // per query, how many classes Janino generated (cumulative count
    // of Spark's generated-class histogram) and how much JIT compile
    // time elapsed (CompilationMXBean, ms). The class counts rank the
    // codegen producers to shrink; a jit_ms spike at stable shuffle is
    // the storm signature, now measurable instead of inferred.
    val codegenHist = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_GENERATED_CLASS_BYTECODE_SIZE
    val jitBean = java.lang.management.ManagementFactory.getCompilationMXBean
    val results = queryList.map { case (name, fn) =>
      // min of two timed executions: this box is shared (background
      // load spikes showed up as multi-second stalls on trivial
      // queries), and min-of-N is the standard steady-state estimator
      // under external noise
      val sh0 = shuffleBytes.get(); val sp0 = spilledBytes.get()
      val cg0 = codegenHist.getCount; val jit0 = jitBean.getTotalCompilationTime
      // a failing query must surface as err, never as a bogus timing
      var err: Option[String] = None
      def timedRun(): Double = {
        // Spark's ContextCleaner is GC-driven: with a large pinned
        // heap the JVM never collects, so shuffle registrations /
        // broadcasts / checkpoint blocks pile up and tax later
        // queries. Collect (untimed) between measurements.
        System.gc()
        Thread.sleep(200) // let the async cleaner drain before timing
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            err = Some(s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").take(120))
        }
        (System.nanoTime() - t0) / 1e9
      }
      var times = List(timedRun(), timedRun())
      // JIT warmup storms are nondeterministic and can cover BOTH
      // default runs: a new-at-this-SF plan's generated classes run
      // interpreted until C2 catches up (observed on q31 — 80 s stage
      // CPU vs 6.5 s steady, zero GC; pairs like 2.8 s/2.7 s settling
      // at 0.6 s). Buy up to two more samples while the minimum still
      // looks stormy (> 2 s) or the two runs disagree badly;
      // min-of-N converges on steady state where min-of-2 reported
      // the storm. Genuinely-slow queries pay ≤ 2 extra runs.
      while (err.isEmpty && times.size < 4 && (times.min > 2.0 ||
          (times.min > 0.75 &&
            (times.max - times.min) / times.min > 0.5)))
        times = timedRun() :: times
      // metric deltas cover every run → report the per-run average
      val shMb = (shuffleBytes.get() - sh0) / times.size.toDouble / 1e6
      val spMb = (spilledBytes.get() - sp0) / times.size.toDouble / 1e6
      // codegen/JIT deltas are NOT averaged: classes compile once per
      // plan (the warmup at sf0.001 already absorbed most), so the
      // raw delta over all runs IS the query's marginal footprint
      QRes(name, times.min, shMb, spMb,
        codegenHist.getCount - cg0,
        jitBean.getTotalCompilationTime - jit0, err,
        times.reverse)
    }
    val ok = results.filter(_.err.isEmpty)
    val qs = ok.map(q => s"\"" + q.name + "\":" + q.wall)
      .mkString("{", ",", "}")
    val sh = ok.map(q =>
      s"\"" + q.name + "\":" + f"${q.shMb}%.1f").mkString("{", ",", "}")
    val errsList = results.collect { case QRes(k, _, _, _, _, _, Some(e), _) =>
      // exception text can carry ANY control char (Netty/Hadoop
      // messages embed NULs and ESC) — strip the whole C0 range, not
      // just \n\r\t, or the one-line bench JSON stops parsing
      s"\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1f]", " ") + "\""
    }
    val errs = errsList.mkString("{", ",", "}")
    // compact line: at most 5 errors so a mass failure can't push the
    // final line past the driver's tail window
    val errsCompact = errsList.take(5).mkString("{", ",", "}")
    val totalSpill = ok.map(_.spMb).sum
    val total = ok.map(_.wall).sum
    // regression tripwire: diff (wall, shuffle) against the PREVIOUS
    // committed detail — read before this run overwrites it, compared
    // only when the scale factor matches. Each SF keeps its OWN
    // detail snapshot (bench_detail_<sf>.json) so an sf1 run diffs
    // the last sf1 run even when sf0.1 ran in between (round-10
    // verdict: the sf1 gate compared only totals, so a 10×-scale
    // per-query regression could hide in the sum).
    val sfKey = new java.io.File(sfDir).getName
    def readFile(p: String): Option[String] = try {
      val src = scala.io.Source.fromFile(p)
      try Some(src.mkString) finally src.close()
    } catch { case _: Throwable => None }
    val prevRun = readFile(s"bench_detail_$sfKey.json")
      .orElse(readFile("bench_detail_last.json"))
    val prevMap = prevRun.filter(p => sfOf(p).contains(sfDir))
      .map(parseDetail).getOrElse(Map.empty)
    val curMap = ok.map(q =>
      // shuffle at the file's 0.1 MB grain
      q.name -> (q.wall, math.rint(q.shMb * 10) / 10)).toMap
    // subset runs skip the tripwire: every unrun query would read as
    // "gone" against the full baseline
    val regs =
      if (only.isDefined) Seq.empty else regressionsOf(prevMap, curMap)
    def regsJson(n: Int): String = regs.take(n).map { case (q, kind, p, c) =>
      s"""{"q":"$q","kind":"$kind","prev":${math.rint(p * 1000) / 1000},""" +
      s""""cur":${math.rint(c * 1000) / 1000}}"""
    }.mkString("[", ",", "]")
    // Full detail (per-query seconds + shuffle for every query) goes
    // to STDERR + a file, never stdout: it's >4 KB, and four rounds of
    // BENCH artifacts came back "parsed": null because stdout grew
    // past what the driver captures (r4's artifact shows the capture
    // cut mid-way through this very line). stdout carries exactly one
    // payload line — the compact JSON below — so no cap, tail window,
    // or footer can separate the parser from it.
    // per-query codegen class counts + JIT ms, and end-state code
    // cache occupancy: the §7d audit data (detail-only — stdout stays
    // under the driver's tail window)
    val cg = ok.map(q => s"\"" + q.name + "\":" + q.cgClasses)
      .mkString("{", ",", "}")
    val jit = ok.map(q => s"\"" + q.name + "\":" + q.jitMs)
      .mkString("{", ",", "}")
    // every timed sample in run order (detail-only): min hides the
    // variance the q39 JIT-replay probes need to see
    val runsJ = ok.map(q => s"\"" + q.name + "\":" +
      q.runs.map(t => math.rint(t * 1000) / 1000)
        .mkString("[", ",", "]"))
      .mkString("{", ",", "}")
    val codeCacheMb = scala.jdk.CollectionConverters
      .ListHasAsScala(java.lang.management.ManagementFactory
        .getMemoryPoolMXBeans).asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .map(_.getUsage.getUsed).sum / 1e6
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""shuffle_mb":$sh,"spill_mb":${f"$totalSpill%.1f"},""" +
      s""""codegen_classes":$cg,"jit_ms":$jit,"runs":$runsJ,""" +
      s""""code_cache_mb":${f"$codeCacheMb%.1f"},""" +
      s""""errors":$errs,"regressions":${regsJson(8)},""" +
      s""""n_reg":${regs.size},"sf":"$sfDir"}"""
    Console.err.println(detail)
    // subset runs (SPARK_GRAFT_ONLY) never overwrite the committed
    // baselines — a 1-query detail would make every other query read
    // as "gone" on the next full run
    if (only.isEmpty) Seq("bench_detail_last.json",
        s"bench_detail_$sfKey.json").foreach { p =>
      try {
        val w = new java.io.PrintWriter(p)
        try w.println(detail) finally w.close()
      } catch { case _: Throwable => () }
    }
    // The LAST stdout line must carry the graded numbers on its own:
    // the driver keeps only a 2000-char tail, so this line stays
    // compact — total, slowest 12 queries, biggest 5 shuffles,
    // errors, sf — guaranteed well under 1500 chars, and it is the
    // ONLY line this process writes to stdout.
    def r3(v: Double) = math.rint(v * 1000) / 1000
    val slow = ok.sortBy(-_.wall).take(12)
      .map(q => s"\"" + q.name + "\":" + r3(q.wall))
      .mkString("{", ",", "}")
    val shTop = ok.sortBy(-_.shMb).take(5)
      .map(q => s"\"" + q.name + "\":" + f"${q.shMb}%.1f")
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
      s""""n":${ok.size},"queries":$slow,"shuffle_mb":$shTop,""" +
      s""""spill_mb":${f"$totalSpill%.1f"},"errors":$errsCompact,""" +
      s""""n_err":${errsList.size},"regressions":${regsJson(4)},""" +
      s""""n_reg":${regs.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
