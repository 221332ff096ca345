package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** q121 PageRank: driver brute-force bit-equality on the real graph,
  * determinism across parallelism, and the structural sanity a
  * centrality score must have (mass bounds, hub ordering).
  */
class GraphSpec extends SparkSpec {

  /** The exact integer update q121 contracts, recomputed imperatively
    * in the driver — an independent yardstick (per-node loop over an
    * adjacency map, no SQL, no Spark).
    */
  private def brutePr(edges: Seq[(Long, Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val out = edges.groupBy(_._1)
    val deg = out.map { case (s, es) => s -> es.map(_._3).sum }
    var pr: Map[Long, Long] = deg.keys.map(_ -> Graph.PrScale).toMap
    val base = 15L * Graph.PrScale / 100L
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for ((src, dst, w) <- edges) {
        val q = (85L * pr(src)) / (100L * deg(src))
        inflow(dst) += w * q
      }
      pr = deg.keys.map(n => n -> (base + inflow(n))).toMap
    }
    pr
  }

  private def edgesOf(dir: String): Seq[(Long, Long, Long)] = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.flatMap { case (c, s, w) => Seq((c, s, w), (s, c, w)) }.toSeq
  }

  test("q121 bit-equals an imperative driver PageRank on the real graph") {
    val got = Graph.q121(spark, sf).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    val want = brutePr(edgesOf(sf), iters = 5)
    assert(got.keySet == want.keySet)
    val diff = got.collect { case (n, p) if want(n) != p => n }
    assert(diff.isEmpty, s"ranks differ at nodes: ${diff.take(5)}")
  }

  test("q121 is bit-identical at different parallelism") {
    val a = Graph.q121(spark, sf).collect().map(_.toSeq)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = Graph.q121(spark, sf).collect().map(_.toSeq)
      assert(a.toSeq == b.toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q121 mass and shape: base floor holds; suppliers out-rank customers") {
    val rows = Graph.q121(spark, sf).collect()
    val base = 15L * Graph.PrScale / 100L
    assert(rows.forall(_.getAs[Long]("pr") >= base))
    // integer floors only ever DROP mass vs the conserved fixpoint
    val total = rows.map(_.getAs[Long]("pr")).sum
    assert(total <= rows.length * Graph.PrScale)
    // ~15 customers trade with each supplier: every supplier hub must
    // out-rank every customer in a bipartite purchase graph
    val (supp, cust) = rows.partition(_.getAs[String]("kind") == "supp")
    assert(supp.map(_.getAs[Long]("pr")).min >
      cust.map(_.getAs[Long]("pr")).max)
    // kind/key decode round-trips the node id
    assert(rows.forall { r =>
      val n = r.getAs[Long]("node")
      val k = r.getAs[Long]("key")
      if (r.getAs[String]("kind") == "cust") n == 2 * k else n == 2 * k + 1
    })
  }
}
