package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine BPE tokenizer induction (Sennrich, Haddow & Birch, ACL 2016
  * — "Neural Machine Translation of Rare Words with Subword Units") —
  * train the subword vocabulary ON the corpus the engine curates, so the
  * tokenizer and the data it tokenizes come from one pipeline.
  *
  * Classic BPE iterates: count adjacent symbol pairs over the word-
  * frequency table, merge the most frequent pair everywhere, repeat.
  * The distributed shape:
  *
  *  - The corpus collapses ONCE to the distinct-word frequency table
  *    (one aggregation; at 100 TB the word table is orders of magnitude
  *    smaller than the corpus and hash-partitions by word).
  *  - Each round is one codegen'd zip_with pair explode + one
  *    sum-aggregation shuffle; only the TOP candidate rows (4·batch)
  *    are collected — bounded driver state, like the IVF index builds.
  *  - `batch` merges are applied per round. Merges in one batch are
  *    greedily chosen to share NO symbol, so applying them in a single
  *    pass over each word equals applying them sequentially. batch=1 IS
  *    classic BPE exactly (spec-verified against a local reference);
  *    batch>1 is the standard industrial approximation — pair counts
  *    are only recounted between batches, so merge RANKS can deviate
  *    from classic order while the vocab quality is preserved.
  *  - Ties break (count desc, left, right) — fully deterministic: two
  *    runs, or a re-train after an engine migration, produce the
  *    identical merge table.
  *
  * Rounds are bounded by ceil(numMerges/batch); each round persists its
  * word table and unpersists the previous (Components-style memoization)
  * so the typed-map lineage stays linear in rounds.
  */
object BpeTrainer {

  /** (symbol sequence, corpus frequency) — one row per DISTINCT word. */
  case class WordSyms(sym: Seq[String], n: Long)
  /** One learned merge: rank is application priority (0 first). */
  case class Merge(rank: Int, left: String, right: String, cnt: Long)

  /** End-of-word marker (kept as its own symbol, per the paper). */
  val EndOfWord = "</w>"

  /** Distinct-word frequency table of a whitespace-tokenized corpus. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Train `numMerges` merges over the corpus; returns the ranked merge
    * table (rank, left, right, cnt). `minCount` stops early when no pair
    * reaches it (vocab saturated). */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      batch: Int = 1,
      minCount: Long = 2L): Seq[Merge] = {
    require(numMerges > 0 && batch > 0 && minCount >= 1, "bad BPE params")
    val spark = docs.sparkSession
    import spark.implicits._

    var words: Dataset[WordSyms] = wordCounts(docs, textCol)
      .as[(String, Long)]
      .map { case (w, n) => WordSyms(w.map(_.toString) :+ EndOfWord, n) }
      .persist()
    words.count() // materialize before the loop

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val want = math.min(batch, numMerges - rank)
      // adjacent-pair counts: one codegen'd explode + one agg shuffle
      val pairCounts = words.toDF()
        .filter(size(col("sym")) >= 2)
        .select(col("n"), explode(zip_with(
          slice(col("sym"), lit(1), size(col("sym")) - 1),
          slice(col("sym"), lit(2), size(col("sym")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("n").as("cnt"))
        .filter(col("cnt") >= minCount)
      // bounded collect: enough rows that `want` non-interacting merges
      // survive the greedy symbol-disjointness filter
      val top = pairCounts
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(math.max(4 * want, 16))
        .as[(String, String, Long)].collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val chosen = top.iterator.filter { case (l, r, _) =>
          val ok = !used(l) && !used(r) && !used(l + r)
          if (ok) { used += l; used += r; used += (l + r) }
          ok
        }.take(want).toSeq
        chosen.foreach { case (l, r, c) =>
          merges += Merge(rank, l, r, c); rank += 1
        }
        val batchMerges = chosen.map { case (l, r, _) => (l, r) }
        val prev = words
        words = prev.map(w => WordSyms(applyMerges(w.sym, batchMerges), w.n))
          .persist()
        words.count()
        prev.unpersist()
        if (chosen.isEmpty) exhausted = true
      }
    }
    words.unpersist()
    merges.result()
  }

  /** Apply symbol-disjoint merges in one left-to-right pass each. */
  private[operators] def applyMerges(
      sym: Seq[String], merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(sym)((s, m) => mergeOnce(s, m._1, m._2))

  private def mergeOnce(sym: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word with a trained merge table: repeatedly merge the
    * LOWEST-rank adjacent pair (the paper's greedy application order). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var sym: Seq[String] = word.map(_.toString) :+ EndOfWord
    var done = false
    while (!done && sym.length >= 2) {
      val best = sym.zip(sym.tail).flatMap(p => ranks.get(p).map(p -> _))
        .sortBy(_._2).headOption
      best match {
        case Some(((l, r), _)) => sym = mergeOnce(sym, l, r)
        case None              => done = true
      }
    }
    sym
  }

  /** Per-document subword token counts under a trained vocabulary —
    * the "token accounting with the real tokenizer" step. The merge
    * table broadcasts (numMerges entries); encoding is a shuffle-free
    * typed map. Output: (id, n_subwords). */
  def tokenizeCount(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val n = t.split(" ").iterator.filter(_.nonEmpty)
          .map(w => encodeWord(w, bc.value).length).sum
        (id, n.toLong)
      }
      .toDF("id", "n_subwords")
  }
}
