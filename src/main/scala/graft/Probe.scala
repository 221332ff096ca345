package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level measurement harness for the optimization rounds
  * (guide §1: measure first, noop sink, labeled jobs). Each scenario
  * times the sub-steps of one expensive query or session-cache fill
  * so changes attack the measured phase, not a guess. Never part of
  * the bench contract; results print to stderr.
  *
  * Usage: runMain graft.Probe <sfDir> <scenario>[,<scenario>...]
  */
object Probe {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timed[T](spark: SparkSession, label: String)(f: => T): T = {
    spark.sparkContext.setJobDescription(label)
    val t0 = System.nanoTime()
    val r = f
    val s = (System.nanoTime() - t0) / 1e9
    Console.err.println(f"[probe] $label%-46s $s%8.3f s")
    spark.sparkContext.setJobDescription(null)
    r
  }

  /** Time `f` twice and report both walls — the second sample is the
    * JIT-warm one phase attribution should read (the bench's min-of-N
    * rationale at phase grain).
    */
  private def timed2(spark: SparkSession, label: String)(f: => Unit): Unit = {
    timed(spark, label + " (cold)")(f)
    timed(spark, label + " (warm)")(f)
  }

  /** Pre-run the named registry queries at sf0.001 — the bench's JIT
    * warmup, so scenario phases measure steady state.
    */
  private def warmup(spark: SparkSession, qs: Seq[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    if (!new java.io.File(dir).isDirectory) return
    val all = SparkEntry.queries
    qs.foreach { q =>
      try all(q)(spark, dir).count()
      catch { case _: Throwable => () }
    }
    Console.err.println(s"[probe] warmup done: ${qs.mkString(",")}")
  }

  /** The tri-fill phases, replicated from Graph.coPurchaseGraph. */
  private def tri(spark: SparkSession, dir: String): Unit = {
    warmup(spark, Seq("q122_triangles", "q135_ktruss"))
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    timed(spark, "tri/li-distinct")(noop(li))
    val pairsPlan = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("lo"), col("b.pk").as("hi"))
      .distinct()
    timed(spark, "tri/pairs-join-distinct")(noop(pairsPlan))
    val pairs = timed(spark, "tri/pairs-checkpoint")(pairsPlan.localCheckpoint())
    val nPairs = timed(spark, "tri/pairs-count")(pairs.count())
    Console.err.println(s"[probe] nPairs = $nPairs")
    val deg = pairs.select(col("lo").as("node"))
      .unionAll(pairs.select(col("hi").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val oriented = pairs
      .join(broadcast(deg).withColumnRenamed("node", "lo")
        .withColumnRenamed("deg", "dlo"), Seq("lo"))
      .join(broadcast(deg).withColumnRenamed("node", "hi")
        .withColumnRenamed("deg", "dhi"), Seq("hi"))
      .select(
        when(col("dlo") < col("dhi") ||
          (col("dlo") === col("dhi") && col("lo") < col("hi")),
          col("lo")).otherwise(col("hi")).as("src"),
        when(col("dlo") < col("dhi") ||
          (col("dlo") === col("dhi") && col("lo") < col("hi")),
          col("hi")).otherwise(col("lo")).as("dst"))
      .repartition(col("src")).persist()
    timed(spark, "tri/oriented-materialize")(noop(oriented))
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.src").as("apex"),
        col("x.dst").as("lo"), col("y.dst").as("hi"))
    timed(spark, "tri/wedges-count-only") {
      Console.err.println("  wedges = " + wedges.count())
    }
    val tris = wedges.join(broadcast(pairs), Seq("lo", "hi"))
    timed2(spark, "tri/wedges+close-noop")(noop(tris))
    val trisMat = timed(spark, "tri/tris-checkpoint")(tris.localCheckpoint())
    Console.err.println(s"[probe] nTris = ${trisMat.count()}")
    oriented.unpersist(blocking = false)
  }

  /** photoTable generation vs decode split for q119/q71. */
  private def img(spark: SparkSession, dir: String): Unit = {
    import graft.operators.Multimodal
    warmup(spark, Seq("q119_phash_neardup"))
    timed2(spark, "img/photoTable-generate")(
      noop(Multimodal.photoTable(spark, dir).toDF()))
    timed2(spark, "img/generate+hash-decode")(
      noop(Multimodal.imageHashes(Multimodal.photoTable(spark, dir)).toDF()))
    timed2(spark, "img/q119-full")(
      Multimodal.q119(spark, dir).count(): Unit)
  }

  /** q119 pair-machinery attribution: band bucket histogram and the
    * candidate-pair volume the capped inverted index emits.
    */
  private def img2(spark: SparkSession, dir: String): Unit = {
    import graft.operators.Multimodal
    warmup(spark, Seq("q119_phash_neardup"))
    val hs = Multimodal.imageHashes(Multimodal.photoTable(spark, dir))
      .toDF().localCheckpoint()
    Console.err.println("  hashes = " + hs.count())
    val banded = hs.select(col("img_id"),
      posexplode(array((0 until 8).map(j =>
        shiftrightunsigned(col("phash"), 8 * j)
          .bitwiseAND(lit(0xFFL))): _*)).as(Seq("band", "chunk")))
    val sizes = banded.groupBy(col("band"), col("chunk"))
      .agg(count(lit(1)).as("df"))
      .select(col("df")).as[Long](spark.implicits.newLongEncoder).collect()
    val capped = sizes.filter(_ <= 1000)
    Console.err.println(s"  buckets=${sizes.length} " +
      s"tombstoned=${sizes.count(_ > 1000)} maxdf=${sizes.max} " +
      s"pairsEmitted=${capped.map(d => d * (d - 1) / 2).sum}")
  }

  /** ccLabels fill phases: the q31 edge pass vs the propagation. */
  private def cc(spark: SparkSession, dir: String): Unit = {
    warmup(spark, Seq("q31_ngram_jaccard", "q35_dup_clusters"))
    val edges = timed(spark, "cc/q31-edges") {
      val e = graft.operators.Dedup.q31(spark, dir)
        .select(col("ia"), col("ib")).localCheckpoint()
      Console.err.println("  edges = " + e.count())
      e
    }
    timed(spark, "cc/label-propagation") {
      val sym = edges.unionAll(
        edges.select(col("ib").as("ia"), col("ia").as("ib")))
        .toDF("a", "b")
      var labels = sym.select(col("a").as("node")).distinct()
        .withColumn("comp", col("node")).localCheckpoint()
      var labelSum = Long.MaxValue
      var converged = false
      var rounds = 0
      while (!converged && rounds < 20) {
        val viaEdges = sym.join(labels, sym("a") === labels("node"))
          .select(col("b").as("node"), col("comp"))
        val next = labels.select(col("node"), col("comp")).unionAll(viaEdges)
          .groupBy(col("node")).agg(min(col("comp")).as("comp"))
          .localCheckpoint()
        val nextSum = next.agg(sum(col("comp"))).head.getLong(0)
        converged = nextSum == labelSum
        labelSum = nextSum
        labels = next
        rounds += 1
      }
      Console.err.println(s"  rounds = $rounds")
    }
  }

  /** q76 phases: variant emission vs pair emission vs rejoin+sort. */
  private def fuzzy(spark: SparkSession, dir: String): Unit = {
    warmup(spark, Seq("q76_fuzzy_match2"))
    graft.functions.GraftFunctions.register(spark)
    val nameDim = Tables.spread(Tables(spark, dir, "customer")
        .select(col("c_name"))).distinct()
      .select(col("c_name").as("name"), xxhash64(col("c_name")).as("nid"))
      .localCheckpoint()
    Console.err.println("  names = " + nameDim.count())
    val pairsRel = graft.operators.Dedup.fastssPairs(spark, nameDim, 2, 1000)
    timed(spark, "fuzzy/fastss-pairs-noop")(noop(pairsRel))
    Console.err.println("  pairs = " + pairsRel.count())
    timed(spark, "fuzzy/q76-full")(
      graft.operators.Dedup.q76(spark, dir).count(): Unit)
  }

  /** fastssPairs stage split: variants, capped index, emission, min. */
  private def fuzzy2(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    warmup(spark, Seq("q76_fuzzy_match2"))
    graft.functions.GraftFunctions.register(spark)
    val nameDim = Tables.spread(Tables(spark, dir, "customer")
        .select(col("c_name"))).distinct()
      .select(col("c_name").as("name"), xxhash64(col("c_name")).as("nid"))
      .localCheckpoint()
    val variants = nameDim.select(col("name"), col("nid"))
      .as[(String, Long)]
      .flatMap { case (n, id) =>
        graft.operators.Dedup.variantHashes(n, 2)
          .map { case (vh, meta) => (vh, id, meta) } }
      .toDF("vh", "nid", "meta")
      .select(col("vh"),
        struct(col("nid").as("_1"), col("meta").as("_2")).as("e"))
    timed2(spark, "fuzzy2/variants-noop")(noop(variants))
    val grouped = variants.groupBy(col("vh"))
      .agg(expr(s"collect_capped(e, 1000)").as("dsr"))
      .filter(col("dsr").isNotNull && size(col("dsr")) > 1)
      .select(col("dsr"))
    timed2(spark, "fuzzy2/capped-index-noop")(noop(grouped))
    Console.err.println("  buckets = " + grouped.count())
    val emitted = grouped.as[Seq[(Long, Long)]].flatMap { members =>
      val arr = members.toArray
      java.util.Arrays.sort(arr, Ordering.by((x: (Long, Long)) => x))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
      var i = 0
      while (i < arr.length) {
        val (ia, ma) = arr(i)
        var j = i + 1
        while (j < arr.length) {
          val (ib, mb) = arr(j)
          if (ia != ib) {
            val dist = graft.operators.Dedup.witnessDist(ma, mb)
            if (dist >= 1 && dist <= 2) out += ((ia, ib, dist))
          }
          j += 1
        }
        i += 1
      }
      out
    }.toDF("ida", "idb", "dist")
    timed2(spark, "fuzzy2/emit-noop")(noop(emitted))
    Console.err.println("  emitted = " + emitted.count())
    timed2(spark, "fuzzy2/min-groupBy-noop")(noop(
      emitted.groupBy(col("ida"), col("idb"))
        .agg(min(col("dist")).as("dist"))))
  }

  private def one(spark: SparkSession, dir: String, q: String): Unit = {
    warmup(spark, Seq(q))
    val fn = SparkEntry.queries(q)
    timed2(spark, s"$q/full")(fn(spark, dir).count(): Unit)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val scenarios = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scenarios.foreach {
      case "tri" => tri(spark, dir)
      case "img" => img(spark, dir)
      case "img2" => img2(spark, dir)
      case "cc" => cc(spark, dir)
      case "fuzzy" => fuzzy(spark, dir)
      case "fuzzy2" => fuzzy2(spark, dir)
      case s if SparkEntry.queries.contains(s) => one(spark, dir, s)
      case s => Console.err.println(s"[probe] unknown scenario $s")
    }
    spark.stop()
  }
}
