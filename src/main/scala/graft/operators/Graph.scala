package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics — the family beyond connected components
  * ([[Dedup.q35]]/`ccLargeSmallStar`): global importance scores over a
  * relation-derived graph. The production use in a training-data
  * pipeline is the CommonCrawl recipe — a link/host-graph centrality
  * score becomes a per-document quality prior that mixture weighting
  * (q47/q113) and quality filtering (q111) consume as a feature.
  *
  * Spark shape (the classic one): the edge relation is built ONCE,
  * pre-joined with out-degrees, and `localCheckpoint`ed — every
  * Lloyd's-style round is then one hash join (ranks ⨝ edges on src)
  * plus one groupBy(dst) sum, i.e. two graph-sized shuffles per
  * round, never a corpus-sized one. Ranks are 16-byte (node, pr)
  * rows. On a 1000-executor cluster both sides hash-partition on the
  * node id; AQE's skew split handles hub nodes (a supplier joined by
  * every customer) without salting because the per-round join is
  * key-balanced after the edge pre-aggregation collapses multi-edges
  * into one weighted row.
  */
object Graph {

  /** Fixed-point scale: ranks live on a 1e-12 grid (pr = rank × 1e12
    * as int64), the [[Similarity.FixedPointScale]] discipline. All
    * arithmetic below is int64 ⇒ exact and order-independent, so the
    * scores are bit-identical at any parallelism AND across engines —
    * what makes an iterative float algorithm DuckDB-oracle-able at
    * all. Headroom: `85 × Σpr` must stay under Long.MaxValue, which
    * holds while total graph mass (n_nodes × 1e12) × any one node's
    * share × 85 < 9.2e18 — comfortable through ~1e5-node graphs with
    * hub shares <1e-2 (sf1 is 1.6e16 total). The documented knob for
    * a 1e9-node host graph is dropping the scale to 1e6 (µ-rank
    * grid): same algorithm, 1e6× more headroom, still exact.
    */
  val PrScale: Long = 1000000000000L

  /** Damping d = 0.85 as the exact rational 85/100 — never a double. */
  private val DampNum = 85L
  private val DampDen = 100L

  /** q121: PageRank over the customer–supplier purchase graph.
    *
    * Graph: node per customer (custkey×2) and supplier (suppkey×2+1);
    * an undirected edge (two directed rows) per (customer, supplier)
    * pair that traded, weighted by lineitem count — `lineitem ⨝
    * orders` pre-aggregated to one row per pair BEFORE any iteration,
    * so the per-round work is graph-sized (48k edges at sf0.01), not
    * fact-table-sized (60k lineitems — 100× more at sf1). The
    * symmetric closure makes every node's out-degree positive, so
    * there are no dangling nodes and no teleport-mass redistribution
    * term — the base (1−d) term alone conserves the fixpoint.
    *
    * Update (all int64, positive, so Spark `DIV` ≡ DuckDB `//`):
    *   contrib(u→v) = w(u,v) × ((85 × pr(u)) DIV (100 × deg(u)))
    *   pr'(v)       = (15 × SCALE) DIV 100  +  Σ_in contrib
    * where deg(u) = Σ w(u,·). The per-unit-weight quotient is floored
    * once and multiplied by the collapsed edge weight — the floor
    * placement is part of the cross-engine contract (flooring after
    * the multiply would differ). Five rounds from pr₀ = SCALE.
    *
    * The oracle is the SAME five rounds unrolled as chained DuckDB
    * CTEs — exact integer arithmetic is what lets an iterative
    * algorithm hash-match across engines (the q105 int64-contribution
    * trick applied to a fixpoint loop).
    */
  def q121(spark: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("cnode"),
        (col("l_suppkey") * 2 + 1).as("snode"))
      .groupBy(col("cnode"), col("snode"))
      .agg(count(lit(1)).as("w"))
    val edges = pairs.select(col("cnode").as("src"), col("snode").as("dst"),
        col("w"))
      .unionAll(pairs.select(col("snode").as("src"), col("cnode").as("dst"),
        col("w")))
    val deg = edges.groupBy(col("src")).agg(sum(col("w")).as("deg"))
    // (src, dst, w, deg) — the one relation every round joins; built
    // once, checkpointed so five rounds don't re-run the fact join
    val ew = edges.join(deg, Seq("src")).localCheckpoint()

    val base = (15L * PrScale) / DampDen
    var ranks = deg.select(col("src").as("node"), lit(PrScale).as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      ranks = ew.join(ranks, ew("src") === ranks("node"))
        .selectExpr("dst",
          s"w * (($DampNum * pr) div ($DampDen * deg)) AS contrib")
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("inflow"))
        .select(col("dst").as("node"), (lit(base) + col("inflow")).as("pr"))
        .localCheckpoint()
    }
    ranks
      .select(col("node"),
        when(col("node") % 2 === 0, lit("cust")).otherwise(lit("supp"))
          .as("kind"),
        (col("node") / 2).cast("long").as("key"),
        col("pr"))
      .orderBy(col("pr").desc, col("node"))
  }

  val q121Sql: String = {
    val base = (15L * PrScale) / DampDen
    def round(i: Int): String =
      s"""it$i AS (
         |  SELECT dst AS node,
         |    $base + CAST(SUM(w * ((85 * pr) // (100 * deg))) AS BIGINT) AS pr
         |  FROM ew JOIN it${i - 1} ON ew.src = it${i - 1}.node
         |  GROUP BY dst)""".stripMargin
    s"""WITH pairs AS (
       |  SELECT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode,
       |    COUNT(*) AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2
       |), edges AS (
       |  SELECT cnode AS src, snode AS dst, w FROM pairs
       |  UNION ALL
       |  SELECT snode AS src, cnode AS dst, w FROM pairs
       |), deg AS (
       |  SELECT src, CAST(SUM(w) AS BIGINT) AS deg FROM edges GROUP BY src
       |), ew AS (
       |  SELECT e.src, e.dst, e.w, d.deg FROM edges e JOIN deg d USING (src)
       |), it0 AS (
       |  SELECT src AS node, CAST($PrScale AS BIGINT) AS pr FROM deg
       |),
       |${(1 to 5).map(round).mkString(",\n")}
       |SELECT node,
       |  CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind,
       |  node // 2 AS key, pr
       |FROM it5
       |ORDER BY pr DESC, node""".stripMargin
  }
}
