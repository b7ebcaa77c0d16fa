package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitters sketch — the frequent-items
  * member of the "sketch as data" family ([[HllSketch]] is the
  * distinct-count member). Tracks at most `k` candidate items in O(k)
  * space with the classic guarantees (Misra-Gries 1982; merge rule and
  * its preserved error bound from Agarwal et al., "Mergeable
  * Summaries", PODS 2012 — both public):
  *
  *  - every item with true frequency f > n/(k+1) IS in the sketch;
  *  - a reported count c under-counts only: f − n/(k+1) ≤ c ≤ f.
  *
  * At 100 TB this replaces a full `groupBy(token).count()` (a shuffle
  * of the corpus' token multiset) with one O(k)-state partial
  * aggregate per partition plus an O(k) merge — hot-token / hot-key /
  * hot-domain monitoring at fixed memory, and the finished map<string,
  * long> column is STORABLE: write per batch, merge later, same
  * never-rescan shape as the HLL sketches.
  *
  * Partial-aggregation note: `reduce` is amortized O(1) (the
  * decrement-all touches k counters only once per k insertions);
  * `merge` sums the two maps then subtracts the (k+1)-st largest
  * count, which is exactly the pairwise rule that keeps the summed
  * error bounded by n₁/(k+1) + n₂/(k+1).
  *
  * DETERMINISM CAVEAT — unlike [[HllSketch]] (whose register state is
  * bit-identical regardless of partitioning), a stored MG map's exact
  * contents depend on partitioning and merge order: which
  * sub-threshold keys survive and every residual count can differ
  * between two runs over the same data. Only the theorem-backed
  * predicates are stable — retention of every f > n/(k+1) item and
  * the per-item bound f − n/(k+1) ≤ c ≤ f (what q_heavy_hitters pins).
  * Never hash-compare, oracle, or differential-config-test the raw map
  * column; compare bound predicates derived from it instead.
  */
object MgSketch {

  val DefaultK = 64

  class SketchAgg(k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
    require(k >= 1)
    override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    override def reduce(
        b: mutable.HashMap[String, Long], item: String): mutable.HashMap[String, Long] = {
      if (item == null) return b
      b.get(item) match {
        case Some(c) => b.update(item, c + 1); b
        case None if b.size < k => b.update(item, 1L); b
        case None =>
          // decrement-all: the new item and one count of every tracked
          // item annihilate (k+1 distinct items cancel one occurrence
          // of each) — the core MG step. Keys are snapshotted first:
          // Scala 2.13 HashMap.put0 grows (and rehashes) the table
          // preemptively when contentSize+1 >= threshold even for an
          // update of an EXISTING key, so mutating under a live
          // keysIterator can skip entries mid-loop.
          val ks = b.keysIterator.toArray
          var i = 0
          while (i < ks.length) {
            val key = ks(i)
            val c = b(key) - 1
            if (c == 0L) b.remove(key) else b.update(key, c)
            i += 1
          }
          b
      }
    }

    override def merge(
        a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      val out = a
      b.foreach { case (key, c) => out.update(key, out.getOrElse(key, 0L) + c) }
      if (out.size > k) {
        // subtract the (k+1)-st largest count, drop non-positives —
        // the mergeable-summaries rule that preserves the error bound
        val counts = out.values.toArray
        java.util.Arrays.sort(counts)
        val sub = counts(counts.length - (k + 1))
        // snapshot keys before mutating — same preemptive-growth hazard
        // as the reduce decrement loop (see comment there)
        val ks = out.keysIterator.toArray
        var i = 0
        while (i < ks.length) {
          val key = ks(i)
          val c = out(key) - sub
          if (c <= 0L) out.remove(key) else out.update(key, c)
          i += 1
        }
      }
      out
    }

    override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap
    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** string column → heavy-hitters sketch (map<string,long>, ≤ k keys). */
  def sketch(item: Column, k: Int = DefaultK): Column =
    org.apache.spark.sql.functions.udaf(new SketchAgg(k), Encoders.STRING).apply(item)

  /** Driver-side merge of finished sketches (for stored artifacts). */
  def mergeMaps(k: Int, maps: Seq[Map[String, Long]]): Map[String, Long] = {
    val agg = new SketchAgg(k)
    maps.map { m => val h = mutable.HashMap.empty[String, Long]; h ++= m; h }
      .foldLeft(agg.zero)(agg.merge).toMap
  }
}
