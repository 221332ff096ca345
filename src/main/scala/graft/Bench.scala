package graft
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

object Bench {
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
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min of two timed executions: this box is shared (background
      // load spikes showed up as multi-second stalls on trivial
      // queries), and min-of-N is the standard steady-state estimator
      // under external noise
      val sh0 = shuffleBytes.get(); val sp0 = spilledBytes.get()
      // a failing query must surface as err, never as a bogus timing
      var err: Option[String] = None
      val times = (1 to 2).map { _ =>
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
      // metric deltas cover both runs → report the per-run average
      val shMb = (shuffleBytes.get() - sh0) / 2.0 / 1e6
      val spMb = (spilledBytes.get() - sp0) / 2.0 / 1e6
      (name, times.min, shMb, spMb, err)
    }
    val ok = results.filter(_._5.isEmpty)
    val qs = ok.map { case (k, v, _, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sh = ok.map { case (k, _, s, _, _) =>
      s"\"" + k + "\":" + f"$s%.1f" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, _, Some(e)) =>
      // exception text can carry ANY control char (Netty/Hadoop
      // messages embed NULs and ESC) — strip the whole C0 range, not
      // just \n\r\t, or the one-line bench JSON stops parsing
      s"\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1f]", " ") + "\""
    }.mkString("{", ",", "}")
    val totalSpill = ok.map(_._4).sum
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""shuffle_mb":$sh,"spill_mb":${f"$totalSpill%.1f"},""" +
      s""""errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
