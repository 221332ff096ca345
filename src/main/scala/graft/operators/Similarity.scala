package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * q40 is the exact baseline: a tiny query set broadcast against the
  * full scan, cosine in codegen (`zip_with`+`aggregate`, double math),
  * top-k per query via window rank — at 1000 executors this is one
  * pass over the vectors with no shuffle of the big side.
  *
  * q41 is the scale path: 8 tables × 4 deterministic random-hyperplane
  * sign bits bucket the vectors; a query probes its own bucket in
  * every table and the per-table unions form the candidate set —
  * ~16× fewer candidates per table with multi-table union holding
  * recall. Probabilistic ⇒ rows-only; SimilaritySpec measures recall
  * vs q40.
  */
object Similarity {

  /** Query vector ids — a fixed, deterministic probe set. */
  val QueryIds: Seq[Long] = Seq(1L, 101L, 201L, 301L, 401L)
  val K = 10

  private def vectors(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(expr("dot_d(v, v)")))
  }

  /** Native codegen dot product — see [[graft.functions.DotProductD]]. */
  private val dot = expr("dot_d(qv, v)")

  /** q40: brute-force cosine top-k for the fixed query set. */
  def q40(spark: SparkSession, dir: String): DataFrame = {
    val base = vectors(spark, dir)
    val queries = base.filter(col("vec_id").isInCollection(QueryIds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    base.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot / (col("nrm") * col("qnrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val q40Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                          CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM e
       |      WHERE vec_id IN (${QueryIds.mkString(", ")})),
       |scored AS (
       |  SELECT q.query_id, e.vec_id,
       |    list_dot_product(q.qv, e.v) / (e.nrm * q.qnrm) AS cosine
       |  FROM e JOIN q ON e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, cosine FROM ranked
       |WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  private val NumTables = 8
  private val PlanesPerTable = 4

  /** Deterministic Rademacher hyperplanes (seeded), one flat list of
    * NumTables × PlanesPerTable literal arrays so every dot product
    * stays in codegen.
    */
  private def planeArrays(dims: Int): Seq[Column] = {
    val rng = new scala.util.Random(42)
    (0 until NumTables * PlanesPerTable).map { _ =>
      array((0 until dims).map(_ =>
        lit(if (rng.nextBoolean()) 1.0 else -1.0)): _*)
    }
  }

  /** (table, bucket) hash entries for vector column `v`: per table, a
    * PlanesPerTable-bit sign pattern.
    */
  private def tableBuckets(planes: Seq[Column]): Column = {
    val buckets = (0 until NumTables).map { t =>
      (0 until PlanesPerTable).map { j =>
        when(expr(s"dot_d(v, plane_${t * PlanesPerTable + j})") > 0,
          shiftleft(lit(1L), j)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }
    array(buckets: _*)
  }

  /** q41: multi-table hyperplane-LSH ANN — the 100 TB path. Each of 8
    * tables buckets every vector by a 4-bit sign pattern; a query
    * probes its own bucket in every table, the per-table unions form
    * the candidate set, exact cosine ranks it. At scale: candidates
    * shrink ~16× per table while multi-table union keeps recall; the
    * big side is scanned once and never shuffled (queries broadcast).
    */
  def q41(spark: SparkSession, dir: String): DataFrame = {
    val dims = 64
    val planes = planeArrays(dims)
    val withPlanes = (df: DataFrame) =>
      planes.zipWithIndex.foldLeft(df) { case (d, (p, i)) =>
        d.withColumn(s"plane_$i", p)
      }
    // barriers (round 14): the vector relation fed three separate
    // embeddings scans and the plane-hashed relation two consumers —
    // now the scan + norm runs once, the 64-plane dot products run
    // once, and the bucket relation carries only (id, table, bucket)
    // so its checkpoint never pins the vectors per table row (the
    // query side's qv/qnrm rejoin from vecs; candidates only ever
    // needed the bucket keys)
    val vecs = vectors(spark, dir).localCheckpoint()
    val bucketed = withPlanes(vecs)
      .withColumn("buckets", tableBuckets(planes))
      .select(col("vec_id"),
        posexplode(col("buckets")).as(Seq("table", "bucket")))
      .localCheckpoint()
    val queries = bucketed
      .filter(col("vec_id").isInCollection(QueryIds))
      .select(col("vec_id").as("query_id"), col("table").as("qtable"),
        col("bucket").as("qbucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    // candidate ids first (8-byte pairs through the distinct), vectors
    // re-attached once per surviving candidate
    val candidates = bucketed.join(broadcast(queries),
      col("table") === col("qtable") && col("bucket") === col("qbucket")
        && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct() // union of per-table candidate sets
    val qset = vecs
      .filter(col("vec_id").isInCollection(QueryIds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    candidates
      .join(vecs.select(col("vec_id"), col("v"), col("nrm")),
        Seq("vec_id"))
      .join(broadcast(qset), Seq("query_id"))
      .withColumn("cosine", dot / (col("nrm") * col("qnrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF granularity scales with the corpus instead of being a fixed
    * constant (the round-3 `weak`): cells ≈ n / [[TargetCellRows]],
    * clamped to [[MinCells]]..[[MaxCells]]. Per-cell row counts stay
    * ~[[TargetCellRows]] as the corpus grows, so SemDeDup's per-cell
    * greedy chain and each probe's candidate volume are bounded by a
    * CONSTANT, not by corpus size — at 10⁹ vectors the clamp gives
    * 65536 cells (~15k rows/cell; SemDeDup's paper uses 50k clusters
    * at that scale), while the driver-visible quantizer state stays
    * k×dims rows (65536×64 ≈ 32 MB at the cap — broadcast territory,
    * never a plan literal; see [[assignCells]]).
    *
    * Local scale factors (500–20k vectors) all resolve to the 16-cell
    * floor except the sf1 rehearsal, which exercises the derivation.
    */
  private[operators] val TargetCellRows = 1024L
  private[operators] val MinCells = 16
  private[operators] val MaxCells = 65536
  private val NProbe = 4
  private val KMeansIters = 5
  /** Exposed for specs comparing the refined quantizer to the seed. */
  val KMeansItersDefault: Int = KMeansIters

  /** Pure derivation: cells for an n-vector corpus. */
  def numCellsFor(n: Long): Int =
    math.max(MinCells,
      math.min(MaxCells.toLong, (n + TargetCellRows - 1) / TargetCellRows))
      .toInt

  private val corpusCellCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Int]

  /** Corpus-derived cell count for `dir` (one metadata-only count per
    * content version, memoized). Every quantizer consumer —
    * ivf_index/append/probe, q42/q43, q99 SemDeDup, semdedup_incr —
    * resolves its k here, so they agree on granularity per corpus.
    * Keyed on (dir, [[Tables.versionStamp]]): replacing the data
    * under a dir re-derives k automatically (spec-asserted).
    */
  def numCells(spark: SparkSession, dir: String): Int = {
    val stamp = Tables.versionStamp(spark, dir, "embeddings")
    corpusCellCache.getOrElseUpdate((dir, stamp),
      numCellsFor(Tables(spark, dir, "embeddings").count()))
  }

  /** Probes per query: fixed floor at small k, √k growth above it —
    * probing 4 of 16 cells and 4 of 65536 are very different recall
    * regimes, so the probe count tracks granularity (√k keeps probed
    * fraction shrinking while absolute candidate volume
    * ~√k×TargetCellRows stays modest). The candidate-budget form
    * ([[ivfProbesAdaptive]]) remains the principled alternative.
    */
  private[operators] def nProbeFor(k: Int): Int =
    math.max(NProbe, math.round(math.sqrt(k.toDouble)).toInt min k)

  /** q42: IVF (inverted-file) ANN — the coarse-quantizer alternative
    * to q41's hyperplane LSH. The quantizer is a deterministic
    * spherical k-means (see [[centroidArrays]]); every vector is
    * assigned to its max-cosine cell by an argmax over literal-array
    * dot products — pure codegen, map-only, the corpus never shuffles
    * for assignment. Queries probe their NProbe nearest cells and rank
    * candidates by exact cosine. At scale the assignment is a
    * write-once partitioning of the corpus (store `cell` as a
    * partition column) and each query touches nprobe/k of the
    * data. Probabilistic recall ⇒ rows-only; SimilaritySpec measures
    * recall against exact q40 and the quantizer's balance vs the
    * unrefined seed.
    */
  def q42(spark: SparkSession, dir: String,
      iters: Int = KMeansIters, kOverride: Int = 0): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    ivfAssigned(spark, dir, iters, kOverride)
      .join(broadcast(ivfProbes(spark, dir, iters, kOverride)), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot / (col("nrm") * col("qnrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** q44: per-label embedding statistics — count plus min/max of the
    * L2 norm and of the cosine against a fixed probe vector. Min/max
    * are exactly associative (unlike float sums), so this aggregate
    * hash-matches the oracle with plain double math: one scan, one
    * narrow shuffle of (label, norm, cos) triples.
    */
  def q44(spark: SparkSession, dir: String): DataFrame = {
    val base = vectors(spark, dir)
    val probe = base.filter(col("vec_id") === QueryIds.head)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    base.join(broadcast(probe))
      .withColumn("cos", expr("dot_d(qv, v)") / (col("nrm") * col("qnrm")))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"),
        min(col("cos")).as("min_cos"),
        max(col("cos")).as("max_cos"))
      .orderBy(col("label"))
  }

  val q44Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                          CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |q AS (SELECT v AS qv, nrm AS qnrm FROM e
       |      WHERE vec_id = ${QueryIds.head})
       |SELECT label, COUNT(*) AS n,
       |  MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
       |  MIN(list_dot_product(qv, v) / (nrm * qnrm)) AS min_cos,
       |  MAX(list_dot_product(qv, v) / (nrm * qnrm)) AS max_cos
       |FROM e CROSS JOIN q
       |GROUP BY label
       |ORDER BY label""".stripMargin

  /** Memo for refined centroids: they are deterministic functions of
    * (dir, iters, k) — see [[centroidArrays]] — so reuse across the
    * assign/probe/index call sites is safe and saves k-means rescans.
    */
  private val centroidCache =
    scala.collection.concurrent.TrieMap
      .empty[(String, Int, Int), Seq[Seq[Double]]]

  /** Coarse-quantizer training: spherical k-means, driver-orchestrated
    * but corpus-distributed. Seeds are the k smallest vec_ids
    * (unit-normalized); each of `iters` Lloyd's rounds is ONE corpus
    * scan — all k cosines evaluate as literal-array dot
    * products in codegen and the argmax picks the cell, so the only
    * shuffle is k×dims exact partial sums. Per-dimension sums go
    * through [[trainSum]] — scale-dispatched int64 fixed-point or
    * DECIMAL(28,12), both exact and associative — so the update,
    * unlike float k-means, cannot be perturbed by partitioning or
    * aggregation order, and the trained centroids are bit-identical
    * on every run at every parallelism.
    * The driver only ever sees the k×(dims+1) aggregate row set.
    * Empty cells keep their previous centroid.
    */
  private[operators] def centroidArrays(spark: SparkSession, dir: String,
      iters: Int = KMeansIters, kOverride: Int = 0): Seq[Seq[Double]] = {
    val k = if (kOverride > 0) kOverride else numCells(spark, dir)
    centroidCache.getOrElseUpdate((dir, iters, k),
      centroidArraysOn(vectors(spark, dir), k, iters))
  }

  /** Fixed-point scale for the int64 training-sum arm: 1e-12 grid,
    * the same granularity DECIMAL(28,12) keeps.
    */
  private[operators] val FixedPointScale = 1e12

  /** Corpus-size bound for the int64 arm: every summed element is a
    * unit-vector coordinate (|x| ≤ 1 ⇒ |scaled| ≤ 1e12), so a cell of
    * n members sums to at most n × 1e12 — 4e6 rows stays ≥ 2300× under
    * Long.MaxValue. Above the bound training dispatches to the decimal
    * arm, whose 16 integer digits absorb billions of rows per cell
    * (the 100 TB path).
    */
  private[operators] val FixedPointMaxRows = 4000000L

  /** One per-dimension training sum — the hot aggregate of every
    * Lloyd's round, scale-dispatched (round 9, the §7d candidate):
    *
    *  - `fixedPoint`: `sum(CAST(x × 1e12 AS LONG))` — exact,
    *    associative int64 sums (the q105 scaled-contribution trick)
    *    that stay entirely in whole-stage codegen: no Decimal boxing,
    *    no BigDecimal.add per row. Profiled ~10× cheaper per round at
    *    the sf1 chunk corpus (69k × 64).
    *  - otherwise: the original DECIMAL(28,12) sums.
    *
    * Both arms are exact and order-independent, so trained centroids
    * are bit-identical at any parallelism EITHER way; the arms differ
    * only in the 1e-12-grid rounding of each element (truncation
    * toward zero vs the decimal cast's HALF_UP), so the dispatch is
    * by CORPUS SIZE — deterministic for a given corpus, the q34
    * exact/LSH precedent — never by environment.
    */
  private def trainSum(x: Column, fixedPoint: Boolean): Column =
    if (fixedPoint) sum((x * lit(FixedPointScale)).cast("long"))
    else sum(x.cast(org.apache.spark.sql.types.DecimalType(28, 12)))

  /** Read back one [[trainSum]] aggregate as a double. */
  private def trainSumValue(r: org.apache.spark.sql.Row, idx: Int,
      fixedPoint: Boolean): Double =
    if (fixedPoint) r.getLong(idx).toDouble / FixedPointScale
    else r.getDecimal(idx).doubleValue()

  /** The k-means body of [[centroidArrays]] over an ARBITRARY
    * `(vec_id, v, nrm)` relation — the form [[Rag]] trains chunk-level
    * quantizers with (round 9). Same determinism contract: decimal
    * partial sums, k-smallest-vec_id seeds, bit-identical at any
    * parallelism. Uncached — callers that rebuild per corpus version
    * (the `dir` form above) layer their own memo.
    */
  private[operators] def centroidArraysOn(base: DataFrame, k: Int,
      iters: Int = KMeansIters): Seq[Seq[Double]] = {
    val spark = base.sparkSession
    def unit(v: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    locally {
      var cs: Seq[Seq[Double]] = base.orderBy(col("vec_id")).limit(k)
        .select(col("v")).collect()
        .map(r => unit(r.getSeq[Double](0))).toSeq
      val dims = cs.head.size
      // one count decides the sum arm for ALL rounds (see trainSum)
      val fixedPoint = base.count() <= FixedPointMaxRows
      for (_ <- 1 to iters) {
        // the BROADCAST assignment arm, unconditionally: each Lloyd's
        // round has NEW centroid values, so the literal arm would
        // generate (and Janino-compile) a fresh k×dims-literal argmax
        // class per round — profiled at 137 s for 5 rounds at k=68 /
        // 69k rows (round 9), vs ~1 s through the closure arm, which
        // compiles once and only rebroadcasts the matrix. Results are
        // identical: the arms are spec-asserted bit-equal, so the
        // trained centroids cannot differ. Single-shot consumers keep
        // the dispatched assignment (one compile amortizes there).
        val sums = assignCellsBroadcast(spark, base, cs)
          .groupBy(col("cell"))
          .agg(count(lit(1)).as("n"),
            (0 until dims).map(i =>
              trainSum(element_at(col("v"), i + 1) / col("nrm"),
                fixedPoint).as(s"s$i")): _*)
          .collect()
          .map(r => r.getAs[Int]("cell") ->
            ((r.getAs[Long]("n"),
              (0 until dims).map(i =>
                trainSumValue(r, 2 + i, fixedPoint)))))
          .toMap
        cs = cs.zipWithIndex.map { case (old, cell) =>
          sums.get(cell) match {
            case Some((n, s)) if n > 0 => unit(s.map(_ / n))
            case _ => old
          }
        }
      }
      cs
    }
  }

  /** Argmax-cosine cell id as a codegen expression: centroids are unit
    * literals, the row norm is a positive constant across cells, so
    * `argmax_i dot(v, c_i)` picks the max-cosine cell with no division
    * and no window — `greatest` over (dot, -cell) structs keeps the
    * whole assignment map-side. The negated cell makes ties resolve
    * to the SMALLEST cell id, matching the probe ranking's
    * (cosine desc, cell asc) order — an asymmetric tie-break would
    * let a duplicated centroid send vectors to the cell the probe
    * ranks last.
    */
  /** How many centroids may become plan LITERALS. `greatest` over k
    * literal structs is pure codegen and beats everything at small k,
    * but the expression tree (and the generated method) grows linearly
    * with k — at the 65536-cell clamp it would be a ~32 MB plan that
    * Janino can't even compile. Above this threshold assignment
    * dispatches to [[assignCells]]'s broadcast path. Measured AT the
    * boundary (round 8, k=256 × dims=64, 200k rows, local[32]):
    * literal 0.76 s vs broadcast 0.70 s, no Janino fallback warnings —
    * Spark's expression splitting keeps the generated methods under
    * the JIT limits, so 256 sits comfortably below any codegen cliff
    * (the arms cross over near here, which is exactly where a
    * dispatch constant should sit).
    */
  private[graft] val LiteralAssignMaxCells = 256

  /** Append the max-cosine `cell` column to `rows` (which must carry
    * `v: array<double>` and `nrm: double`; all other columns pass
    * through). Scale-dispatched:
    *
    *  - k ≤ [[LiteralAssignMaxCells]]: centroids inline as literals,
    *    argmax evaluates in whole-stage codegen ([[argmaxCell]]).
    *  - larger k: the centroid matrix ships as a TorrentBroadcast
    *    (k×dims doubles — 32 MB at the 65536-cell clamp, exactly what
    *    broadcast exists for) and a `mapPartitions` computes the
    *    argmax imperatively — still map-only, no join, no shuffle, and
    *    the plan stays KB-sized at any k.
    *
    * Both paths break cosine ties to the SMALLEST cell id (the probe
    * ranking's order), and the broadcast path is spec-asserted
    * bit-equal to the literal path.
    */
  private[graft] def assignCells(spark: SparkSession, rows: DataFrame,
      cs: Seq[Seq[Double]]): DataFrame =
    if (cs.size <= LiteralAssignMaxCells)
      rows.withColumn("cell", argmaxCell(cs))
    else assignCellsBroadcast(spark, rows, cs)

  /** Session-lifetime centroid-broadcast cache: one TorrentBroadcast
    * per distinct centroid matrix (content-fingerprinted), not one
    * per call — round-7 advice: each [[assignCellsBroadcast]] call
    * re-broadcast the matrix and the handle lingered until the next
    * GC-driven ContextCleaner sweep. Keyed on (context, fingerprint);
    * the value carries its owning SparkContext so every lookup can
    * (a) purge entries whose context has stopped — a long-lived JVM
    * restarting sessions no longer pins dead broadcast blocks forever
    * — and (b) detect an identityHashCode collision between a new
    * context and a dead one (the stored context is compared by
    * REFERENCE, so a colliding key re-broadcasts instead of
    * resurrecting a destroyed handle). Size is bounded by the purge:
    * live entries are one per distinct quantizer of the live session.
    */
  private val centroidBcCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Long), (org.apache.spark.SparkContext,
      org.apache.spark.broadcast.Broadcast[Array[Array[Double]]])]()

  private[graft] def centroidBroadcast(spark: SparkSession, cs: Seq[Seq[Double]])
      : org.apache.spark.broadcast.Broadcast[Array[Array[Double]]] = {
    var h = 1125899906842597L
    cs.foreach(_.foreach { d =>
      h = h * 1000003L + java.lang.Double.doubleToLongBits(d)
    })
    val it = centroidBcCache.entrySet().iterator()
    while (it.hasNext) if (it.next().getValue._1.isStopped) it.remove()
    val sc = spark.sparkContext
    centroidBcCache.compute((System.identityHashCode(sc), h), (_, cur) =>
      if (cur != null && (cur._1 eq sc)) cur
      else (sc, sc.broadcast(cs.map(_.toArray).toArray)))._2
  }

  /** The large-k arm of [[assignCells]], exposed for the bit-equality
    * spec (dispatch thresholds must never change results).
    */
  private[graft] def assignCellsBroadcast(spark: SparkSession,
      rows: DataFrame, cs: Seq[Seq[Double]]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val bc = centroidBroadcast(spark, cs)
    val vIdx = rows.schema.fieldIndex("v")
    val out = StructType(rows.schema.fields :+
      StructField("cell", IntegerType, nullable = false))
    rows.mapPartitions { it =>
      val cents = bc.value
      it.map { r =>
        val v = r.getSeq[Double](vIdx).toArray
        // row norm is constant across cells ⇒ argmax dot = argmax
        // cosine; strict `>` keeps the first (smallest) cell on ties,
        // matching the literal path's struct ordering
        var best = 0
        var bestD = Double.NegativeInfinity
        var i = 0
        while (i < cents.length) {
          val c = cents(i)
          var s = 0.0
          var j = 0
          while (j < v.length) { s += v(j) * c(j); j += 1 }
          if (s > bestD) { bestD = s; best = i }
          i += 1
        }
        Row.fromSeq(r.toSeq :+ best)
      }
    }(Encoders.row(out))
  }

  private def argmaxCell(cs: Seq[Seq[Double]]): Column =
    -greatest(cs.zipWithIndex.map { case (c, i) =>
      struct(
        call_function("dot_d", col("v"), array(c.map(lit): _*)).as("d"),
        lit(-i).as("ncell"))
    }: _*).getField("ncell")

  /** Centroid relation (cell, cv, cnrm=1) for the tiny probe-side join. */
  private def ivfCentroidDf(spark: SparkSession, dir: String,
      iters: Int, kOverride: Int = 0): DataFrame = {
    import spark.implicits._
    centroidArrays(spark, dir, iters, kOverride).zipWithIndex
      .map { case (c, i) => (i, c) }
      .toDF("cell", "cv")
      .withColumn("cnrm", lit(1.0))
  }

  /** Corpus with its IVF cell assignment (max-cosine centroid) —
    * map-only, no join, no shuffle at any k (see [[assignCells]]).
    */
  def ivfAssigned(spark: SparkSession, dir: String,
      iters: Int = KMeansIters, kOverride: Int = 0): DataFrame =
    assignCells(spark, vectors(spark, dir),
      centroidArrays(spark, dir, iters, kOverride))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))

  /** Query probe set: each query's nProbeFor(k) nearest cells. */
  def ivfProbes(spark: SparkSession, dir: String,
      iters: Int = KMeansIters, kOverride: Int = 0): DataFrame =
    ivfProbesWith(spark, dir, ivfCentroidDf(spark, dir, iters, kOverride),
      // centroidArrays is session-cached — its length is free here
      kCells = centroidArrays(spark, dir, iters, kOverride).length)

  /** Probe ranking against an explicit centroid relation (cell, cv,
    * cnrm) — the stored-quantizer path for on-disk indexes. The probe
    * count tracks the quantizer's OWN granularity ([[nProbeFor]] of
    * its cell count — index metadata, KBs at any corpus size), so a
    * 65536-cell index probes √k cells, not a constant 4. Callers who
    * already KNOW the cell count (the in-flight path holds the
    * centroid seq; loaders just collected the quantizer) pass it via
    * `kCells` and no counting job runs — the count() here is the
    * fallback for an opaque relation, a metadata-only job on a
    * parquet quantizer (round-7 advice: derive nprobe lazily).
    */
  def ivfProbesWith(spark: SparkSession, dir: String,
      cents: DataFrame, kCells: Int = -1): DataFrame = {
    val nprobe = nProbeFor(
      if (kCells > 0) kCells else cents.count().toInt)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cell"))
    vectors(spark, dir).filter(col("vec_id").isInCollection(QueryIds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
      .join(broadcast(cents))
      .withColumn("ccos", expr("dot_d(cv, qv)") / (col("qnrm") * col("cnrm")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("qv"), col("qnrm"), col("cell"))
  }

  /** Adaptive nprobe (the §7b candidate): instead of a FIXED probe
    * count, each query probes cells in cosine-rank order until the
    * cumulative CANDIDATE count reaches `budget` — a query whose
    * nearest cells are dense stops at 1–2 probes, one pointed at
    * sparse cells keeps going, so work per query is uniform in
    * candidates (the thing that costs), not in cells.
    *
    * No custom iterator needed: the per-cell population histogram is
    * index metadata (k rows — KBs at any corpus size; computed
    * here with one narrow count aggregate), it broadcast-joins onto
    * the probe ranking, and a per-query cumulative-sum window over
    * that tiny relation keeps exactly the minimal ranked prefix whose
    * total meets the budget (`cum − size < budget`: a cell survives
    * only if the cells ranked before it haven't already met the
    * budget; rank 1 always survives). Everything runs on
    * queries × k rows — the corpus is untouched until the
    * selected cells scan.
    */
  def ivfProbesAdaptive(spark: SparkSession, dir: String, budget: Long,
      iters: Int = KMeansIters): DataFrame = {
    val cellSizes = ivfAssigned(spark, dir, iters)
      .groupBy(col("cell")).agg(count(lit(1)).as("cell_n"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cell"))
    val wCum = wProbe.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vectors(spark, dir).filter(col("vec_id").isInCollection(QueryIds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
      .join(broadcast(ivfCentroidDf(spark, dir, iters)))
      .withColumn("ccos", expr("dot_d(cv, qv)") / (col("qnrm") * col("cnrm")))
      .join(broadcast(cellSizes), Seq("cell"))
      .withColumn("prank", row_number().over(wProbe))
      .withColumn("cum", sum(col("cell_n")).over(wCum))
      .filter(col("cum") - col("cell_n") < budget || col("prank") === 1)
      .select(col("query_id"), col("qv"), col("qnrm"), col("cell"),
        col("prank"), col("cell_n"), col("cum"))
  }

  /** q42 with adaptive probes — same ranking stage, candidate set
    * bounded by `budget` per query instead of a fixed cell count.
    */
  def q42Adaptive(spark: SparkSession, dir: String, budget: Long,
      iters: Int = KMeansIters): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    ivfAssigned(spark, dir, iters)
      .join(broadcast(ivfProbesAdaptive(spark, dir, budget, iters)
        .select(col("query_id"), col("qv"), col("qnrm"), col("cell"))),
        Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot / (col("nrm") * col("qnrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------
  // q43: IVF + product-quantization re-rank
  // ---------------------------------------------------------------

  private val PqM = 8 // subspaces
  private val PqKsub = 16 // centroids per subspace (4-bit codes)
  private val PqRerankFloor = 50 // minimum exact re-rank depth per query

  /** Exact re-rank depth tracks the candidate volume instead of being
    * a fixed constant (the q34/numCells lesson): a query's PQ stage
    * ranks ~nprobe × [[TargetCellRows]] candidates, and re-ranking a
    * fixed 50 of them lets the 16-centroid LUT approximation bury
    * true neighbors as the pool grows (measured at sf1: recall@10
    * 0.18 at depth 50 over ~4k candidates). Holding the re-rank at
    * 1/16 of the candidate estimate keeps the exact-fetch:code-scan
    * ratio — the IO trade PQ exists for — constant at every corpus
    * size.
    */
  private[operators] def pqRerankFor(k: Int): Int =
    math.max(PqRerankFloor,
      nProbeFor(k) * TargetCellRows.toInt / 16)

  /** Memo for PQ sub-quantizers, deterministic per (dir, iters). */
  private val pqCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int),
      Seq[Seq[Seq[Double]]]]

  /** PQ training (Jégou/Douze/Schmid, TPAMI'11): an independent
    * k-means per 8-dim subspace over the unit-normalized corpus.
    * Same determinism contract as [[centroidArrays]]: seeds are the
    * PqKsub smallest vec_ids' subvectors, each Lloyd's round is one
    * corpus scan whose per-dimension sums go through [[trainSum]],
    * so the trained codebooks are bit-identical at any parallelism.
    * All M subspaces train in the SAME scan: the exploded (m, code,
    * subvector) relation is 8 narrow rows per vector, aggregated to
    * M×Ksub×(8+1) cells.
    */
  private[operators] def pqCodebooks(spark: SparkSession, dir: String,
      iters: Int = KMeansIters): Seq[Seq[Seq[Double]]] =
    pqCache.getOrElseUpdate((dir, iters), {
      val dsub = 64 / PqM
      val base = vectors(spark, dir)
        .withColumn("u", expr("transform(v, (x, i) -> x / nrm)"))
      val fixedPoint = base.count() <= FixedPointMaxRows
      var books: Seq[Seq[Seq[Double]]] =
        base.orderBy(col("vec_id")).limit(PqKsub)
          .select(col("u")).collect()
          .map(_.getSeq[Double](0)).toSeq
          .map(u => (0 until PqM).map(m =>
            u.slice(m * dsub, (m + 1) * dsub)))
          .transpose // → [m][k][dsub]
      for (_ <- 1 to iters) {
        val assignCols = (0 until PqM).map { m =>
          struct(
            lit(m).as("m"),
            pqArgmin(books(m), expr(s"slice(u, ${m * dsub + 1}, $dsub)"))
              .as("code"),
            expr(s"slice(u, ${m * dsub + 1}, $dsub)").as("sub"))
        }
        val sums = base
          .select(explode(array(assignCols: _*)).as("a"))
          .select(col("a.m").as("m"), col("a.code").as("code"),
            col("a.sub").as("sub"))
          .groupBy(col("m"), col("code"))
          .agg(count(lit(1)).as("n"),
            (0 until dsub).map(i =>
              trainSum(element_at(col("sub"), i + 1), fixedPoint)
                .as(s"s$i")): _*)
          .collect()
          .map(r => (r.getAs[Int]("m"), r.getAs[Int]("code")) ->
            (r.getAs[Long]("n"),
              (0 until dsub).map(i =>
                trainSumValue(r, 3 + i, fixedPoint))))
          .toMap
        books = books.zipWithIndex.map { case (cb, m) =>
          cb.zipWithIndex.map { case (old, j) =>
            sums.get((m, j)) match {
              case Some((n, s)) if n > 0 => s.map(_ / n)
              case _ => old
            }
          }
        }
      }
      books
    })

  /** Nearest-centroid code for one subspace as a codegen expression:
    * argmin_j ||x − c_j||² = argmax_j (2x·c_j − ||c_j||²) over literal
    * centroids — ties to the smallest j via struct ordering.
    */
  private def pqArgmin(cb: Seq[Seq[Double]], sub: Column): Column =
    greatest(cb.zipWithIndex.map { case (c, j) =>
      val cn = c.map(x => x * x).sum
      struct(
        (call_function("dot_d", sub, array(c.map(lit): _*)) * 2 - cn).as("s"),
        lit(-j).as("nj"))
    }: _*).getField("nj") * -1

  /** Corpus PQ codes: (vec_id, cell, code[M]) — 8 bytes of code per
    * vector instead of 256 bytes of floats. At 100 TB this relation
    * IS the serving index: candidate ranking scans codes only (32×
    * less IO than the embeddings) and full vectors are fetched for
    * the top-[[pqRerankFor]] per query alone.
    */
  private[operators] def pqEncoded(spark: SparkSession, dir: String,
      iters: Int = KMeansIters): DataFrame = {
    val dsub = 64 / PqM
    val books = pqCodebooks(spark, dir, iters)
    val codeCols = (0 until PqM).map { m =>
      pqArgmin(books(m), expr(s"slice(u, ${m * dsub + 1}, $dsub)"))
    }
    ivfAssigned(spark, dir, iters)
      .withColumn("u", expr("transform(v, (x, i) -> x / nrm)"))
      .select(col("vec_id"), col("cell"),
        array(codeCols: _*).as("code"))
  }

  /** q43: IVF + PQ asymmetric-distance re-rank — the full 100 TB ANN
    * serving shape. Queries probe NProbe IVF cells (as q42); inside
    * the probed cells candidates are ranked by the PQ lookup-table
    * approximation of cosine (per-query LUT = dot of each query
    * subvector with each codebook centroid, evaluated as literal
    * arrays in codegen on the tiny broadcast side; candidate score =
    * Σ_m LUT[m][code_m], touching only the 8-byte code); the top
    * [[pqRerankFor]] per query re-rank EXACTLY against their true
    * vectors. Approximate ⇒ rows-only; SimilaritySpec measures
    * recall@10 vs exact q40 and asserts the PQ stage beats
    * approximation-free truncation at equal depth.
    */
  def q43(spark: SparkSession, dir: String,
      iters: Int = KMeansIters): DataFrame = {
    val dsub = 64 / PqM
    val books = pqCodebooks(spark, dir, iters)
    // per-query LUT: lut[m][j] = q̂_m · c_{m,j} (M×Ksub doubles on the
    // broadcast side only)
    val lutCol = array((0 until PqM).map { m =>
      array(books(m).map(c =>
        call_function("dot_d",
          expr(s"slice(qu, ${m * dsub + 1}, $dsub)"),
          array(c.map(lit): _*))): _*)
    }: _*)
    val probes = ivfProbes(spark, dir, iters)
      .withColumn("qu", expr("transform(qv, (x, i) -> x / qnrm)"))
      .withColumn("lut", lutCol)
      .select(col("query_id"), col("cell"), col("lut"))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("vec_id"))
    val shortlist = pqEncoded(spark, dir, iters)
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("approx", expr(
        s"""aggregate(sequence(0, ${PqM - 1}), CAST(0.0 AS DOUBLE),
           |  (acc, m) -> acc + lut[m][code[m]])""".stripMargin))
      .withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= pqRerankFor(numCells(spark, dir)))
      .select(col("query_id"), col("vec_id"))
    // exact re-rank: true vectors are read for shortlist rows only
    val qset = vectors(spark, dir)
      .filter(col("vec_id").isInCollection(QueryIds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    shortlist
      .join(vectors(spark, dir).select(col("vec_id"), col("v"), col("nrm")),
        Seq("vec_id"))
      .join(broadcast(qset), Seq("query_id"))
      .withColumn("cosine", dot / (col("nrm") * col("qnrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Materialize the IVF index on disk: the corpus written ONCE,
    * partitioned by cell — at 100 TB this is the difference between an
    * ANN query scanning everything and scanning nprobe/k of the
    * data via plain partition pruning (no serving system needed; any
    * Spark reader gets the pruning for free).
    */
  def buildIvfIndex(spark: SparkSession, dir: String, indexPath: String,
      kOverride: Int = 0): Unit = {
    val assigned = ivfAssigned(spark, dir, KMeansIters, kOverride)
      .localCheckpoint()
    assigned.write.partitionBy("cell").mode("overwrite").parquet(indexPath)
    // persist the coarse quantizer WITH the index (the underscore
    // prefix hides it from data-file discovery): probes and appends
    // must use the exact centroids the index was built with — a
    // recompute from a since-changed corpus would silently re-route
    // cells and break partition pruning's correctness. Each centroid
    // row also records its BUILD-TIME assignment quality (member
    // count + avg cosine-to-centroid): the yardstick appendIvfIndex
    // measures drift against.
    val cents = ivfCentroidDf(spark, dir, KMeansIters, kOverride)
    val quality = assigned.join(broadcast(cents), Seq("cell"))
      .withColumn("cos", expr("dot_d(v, cv)") / (col("nrm") * col("cnrm")))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("build_n"), avg(col("cos")).as("build_avg_cos"))
    cents.join(quality, Seq("cell"), "left")
      .write.mode("overwrite").parquet(s"$indexPath/_quantizer")
  }

  /** Drift beyond which [[appendIvfIndex]] recommends retraining a
    * cell's quantizer: appended members sitting this much further
    * (in avg cosine) from their centroid than the build-time members
    * did means the cell no longer describes its data — time to re-run
    * Lloyd's and rebuild (and if the CORPUS grew past
    * numCellsFor(n)'s current answer, rebuild at the new k).
    */
  val DriftRetrainTolerance = 0.05

  /** Incremental index maintenance — §7b: append a batch of new
    * vectors WITHOUT retraining the quantizer. Assign-only: the
    * stored centroids become literals, the batch gets its argmax cell
    * map-side and appends into the existing cell partitions (no
    * rewrite of standing data — daily cost scales with the batch).
    * Returns a per-cell drift report (n_appended, avg cosine of the
    * appended vectors to their centroid): when drift sags below the
    * build-time assignment quality, it is time to re-run Lloyd's and
    * rebuild.
    */
  def appendIvfIndex(spark: SparkSession, indexPath: String,
      newVectors: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val cs = spark.read.parquet(s"$indexPath/_quantizer")
      .select(col("cell"), col("cv")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
      .sortBy(_._1).map(_._2).toSeq
    val assigned = assignCells(spark,
      newVectors
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .withColumn("nrm", sqrt(expr("dot_d(v, v)"))),
      cs)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
      .localCheckpoint() // pin: written below AND reported on
    assigned.write.partitionBy("cell").mode("append").parquet(indexPath)
    // schema-version guard: a quantizer persisted before the build-
    // quality columns existed (pre-r6 index) lacks build_avg_cos —
    // treat every cell as yardstick-less (retrain on sight, the same
    // rule as a never-populated cell) instead of failing resolution
    val centDf0 = spark.read.parquet(s"$indexPath/_quantizer")
    val centDf =
      if (centDf0.columns.contains("build_avg_cos")) centDf0
      else centDf0.withColumn("build_avg_cos", lit(null).cast("double"))
    assigned.join(broadcast(centDf), Seq("cell"))
      .withColumn("cos", expr("dot_d(v, cv)") / (col("nrm") * col("cnrm")))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_appended"), avg(col("cos")).as("avg_cos"),
        first(col("build_avg_cos")).as("build_avg_cos"))
      // the named re-train trigger: appended members drifted beyond
      // [[DriftRetrainTolerance]] of the build-time fit (a cell the
      // build never populated has no yardstick — retrain on sight)
      .withColumn("retrain",
        col("build_avg_cos").isNull ||
          col("avg_cos") < col("build_avg_cos") - lit(DriftRetrainTolerance))
      .orderBy(col("cell"))
  }

  /** Probe the on-disk index: query cells become LITERAL partition
    * predicates (the probe set is tiny by definition — collecting it
    * is what turns cell membership into prunable filters), so the scan
    * touches only the probed cell directories. Same ranking math as
    * q42 — results are identical to the in-flight form.
    */
  def probeIvfIndex(spark: SparkSession, dir: String,
      indexPath: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // rank probe cells against the STORED quantizer, not a recompute —
    // the index's partitioning is defined by the centroids it was
    // built (and appended) with
    val probes = ivfProbesWith(spark, dir,
      spark.read.parquet(s"$indexPath/_quantizer"))
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    spark.read.parquet(indexPath)
      .filter(col("cell").isInCollection(probedCells))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot / (col("nrm") * col("qnrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }
}
