package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed BPE tokenizer training (Sennrich et al. '16) — the
  * vocabulary-learning step of an LLM data pipeline, run where the
  * data lives instead of sampling to one machine.
  *
  * The classic trick makes this tractable at 100 TB: BPE statistics
  * depend only on the WORD FREQUENCY TABLE, not the corpus — so the
  * corpus is scanned ONCE into (word, freq) (one shuffle, vocab-sized
  * result), and every merge round runs over that tiny relation:
  * weighted adjacent-pair counts (one aggregation), a 1-ROW argmax to
  * the driver (count desc, then lexicographic — total order, so the
  * learned merge table is deterministic at any parallelism), and a
  * map-side merge application. Driver traffic per round is one row;
  * `localCheckpoint` truncates the growing lineage every few rounds.
  */
object Bpe {

  /** End-of-word sentinel (kept multi-char so it can't collide with a
    * real character symbol).
    */
  val Eow = "</w>"

  /** Memo for trained merge tables: deterministic per (dir, merges)
    * — same contract as Similarity's centroid cache — so q97 (emit
    * the table) and q98 (encode with it) share one training run.
    */
  private val mergeCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int), Seq[(Long, String, String, String, Long)]]

  def trainCached(spark: SparkSession, dir: String,
      numMerges: Int): Seq[(Long, String, String, String, Long)] =
    mergeCache.getOrElseUpdate((dir, numMerges),
      train(spark, dir, numMerges))

  /** Learn `numMerges` merges from the documents table. Returns the
    * merge table (rank, left, right, merged, pair_count) — the
    * artifact a tokenizer ships.
    */
  def train(spark: SparkSession, dir: String, numMerges: Int): Seq[(Long, String, String, String, Long)] = {
    import spark.implicits._
    var words = Tables.spread(Tables(spark, dir, "documents")
        .select(col("text")))
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => ((w.map(_.toString): Seq[String]) :+ Eow, f) }
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var rank = 0L
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // weighted adjacent-pair counts over the word-vocab relation;
      // the argmax is ONE row — total-order tie-break keeps the
      // result independent of partitioning
      val top = words.flatMap { case (syms, freq) =>
        syms.iterator.sliding(2).withPartial(false)
          .map(p => ((p.head, p(1)), freq))
      }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((l, r), c) => (l, r, c) }
        .toDF("l", "r", "c")
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, l + r, c))
        val (bl, br) = (l, r) // stable locals for the closure
        words = words.map { case (syms, freq) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length
                && syms(i) == bl && syms(i + 1) == br) {
              out += bl + br; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toSeq: Seq[String], freq)
        }
        // truncate lineage: 1 round = 1 map, but 50 rounds of stacked
        // maps would recompute from the scan on every pair count
        if (rank % 5 == 4) words = words.localCheckpoint()
        rank += 1
      }
    }
    merges.toSeq
  }

  /** q97: the learned merge table as a DataFrame (30 merges — enough
    * to exercise multi-char symbols on the synthetic vocabulary).
    * Deterministic (total-order argmax) but not SQL-expressible
    * (iterative argmax) ⇒ rows-only; the spec proves bit-equality
    * with a single-machine reference implementation.
    */
  def q97(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainCached(spark, dir, 30)
      .toDF("rank", "left", "right", "merged", "pair_count")
      .orderBy(col("rank"))
  }

  /** Apply a learned merge table to one word: merges fire in RANK
    * order, each replacing every (left-to-right, non-overlapping)
    * occurrence — exactly how training itself rewrote the vocabulary,
    * so encoding a training word reproduces its final training
    * segmentation. BpeSpec proves this equivalent to the greedy
    * lowest-rank-pair formulation on the whole corpus vocabulary.
    */
  def encodeWord(word: String,
      merges: Seq[(Long, String, String, String, Long)]): Seq[String] = {
    var syms: Array[String] =
      (word.map(_.toString) :+ Eow).toArray
    merges.foreach { case (_, l, r, m, _) =>
      if (syms.length > 1) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += m; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
    }
    syms.toSeq
  }

  /** q98: tokenize the corpus with the q97-trained merge table — the
    * APPLY step of the tokenizer pipeline. Per document: word count,
    * BPE token count, distinct-token count, and the tokens-per-word
    * compression ratio the vocabulary buys.
    *
    * Scale shape: the merge table is KBs and ships inside the typed
    * flatMap's closure (broadcast-by-serialization — no join, no
    * shuffle on the corpus side); encoding is map-only with a
    * per-partition word→tokens memo, so each DISTINCT word per
    * partition is encoded once (word frequency is Zipfian — the memo
    * hit rate climbs with partition size). The only shuffle is the
    * final per-doc stats relation, rows already narrow.
    * Deterministic but not SQL-expressible (the merge table is a
    * training artifact) ⇒ rows-only; BpeSpec pins the semantics.
    */
  def q98(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val merges = trainCached(spark, dir, 30)
    Tables.spread(Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, text) =>
          val words = text.trim.split("\\s+").filter(_.nonEmpty)
          var nTok = 0L
          val distinct = new java.util.HashSet[String]()
          words.foreach { w =>
            var toks = memo.get(w)
            if (toks == null) {
              toks = encodeWord(w, merges).toArray
              memo.put(w, toks)
            }
            nTok += toks.length
            toks.foreach(distinct.add)
          }
          (id, words.length.toLong, nTok, distinct.size.toLong,
            if (words.isEmpty) 0.0 else nTok.toDouble / words.length)
        }
      }
      .toDF("doc_id", "n_words", "n_tokens", "n_distinct_tokens",
        "tokens_per_word")
      .orderBy(col("doc_id"))
  }

  /** Single-machine reference BPE over a (word → freq) map — the spec
    * oracle: same tie-break, same sentinel, no Spark.
    */
  def referenceTrain(wordFreq: Map[String, Long],
      numMerges: Int): Seq[(Long, String, String, String, Long)] = {
    var words: Seq[(Seq[String], Long)] = wordFreq.toSeq.map { case (w, f) =>
      ((w.map(_.toString): Seq[String]) :+ Eow, f)
    }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var rank = 0L
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.iterator.sliding(2).withPartial(false).foreach { p =>
          val k = (p.head, p(1))
          counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((rank, l, r, l + r, c))
        words = words.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toSeq, f)
        }
        rank += 1
      }
    }
    merges.toSeq
  }
}
