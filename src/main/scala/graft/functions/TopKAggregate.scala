package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate flowing into the bounded top-k aggregate.
  * Public top-level case class: the encoder's generated code must reach
  * the accessors. */
case class ScoredId(score: Double, id: Long)

/** Bounded top-k aggregate: keeps the `k` best (score desc, id asc)
  * entries seen so far in a sorted buffer.
  *
  * The point is PARTIAL AGGREGATION: as a typed `Aggregator` this runs as
  * an ObjectHashAggregate with map-side combine, so each input partition
  * reduces to at most k entries per group key BEFORE the shuffle — a
  * brute-force scorer over N corpus rows × Q queries shuffles
  * ≤ partitions·Q·k entries instead of N·Q scored rows. The common case
  * (candidate worse than the current k-th) is a constant-time reject with
  * no allocation.
  *
  * Ordering matches `row_number() OVER (ORDER BY score DESC, id ASC)`,
  * so results are byte-identical to the window form it replaces.
  */
final class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, "top-k needs k > 0")

  /** strict "a ranks before b" under (score desc, id asc). Scores compare
    * via `Double.compare`, whose total order (NaN greatest, NaN == NaN)
    * matches Spark's sort — primitive >/== would rank NaN candidates
    * worst and diverge from the rank-window form on any scorer that can
    * emit NaN. */
  private def before(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  private def insert(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] =
    if (buf.size >= k && !before(in, buf.last)) buf
    else {
      val i = buf.indexWhere(e => before(in, e)) match {
        case -1 => buf.size
        case x  => x
      }
      val grown = (buf.take(i) :+ in) ++ buf.drop(i)
      if (grown.size > k) grown.take(k) else grown
    }

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] = insert(buf, in)
  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    b2.foldLeft(b1)(insert)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
}

object TopKAggregate {
  /** topK(k)(scoreCol, idCol) → array<struct<score,id>> of the k best. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), ExpressionEncoder[ScoredId]())
    (score, id) => fn(score, id)
  }
}
