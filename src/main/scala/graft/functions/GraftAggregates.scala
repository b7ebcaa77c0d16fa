package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, bool_and, bool_or}

/** Exact product aggregate.
  *
  * The reference registers a Python step/finalize aggregate `PROD` on its
  * SQLite connection (reference: pandasql/sql_utils.py:56-66, core.py:1081).
  * Spark has no built-in product aggregate (`exp(sum(log))` breaks on zeros
  * and negatives), so this is a typed `Aggregator` — it participates in
  * partial aggregation (map-side combine before the shuffle), so at cluster
  * scale only one partial value per partition crosses the wire.
  */
object ProductAgg extends Aggregator[Double, Double, Double] {
  override def zero: Double = 1.0
  override def reduce(b: Double, a: Double): Double = b * a
  override def merge(b1: Double, b2: Double): Double = b1 * b2
  override def finish(r: Double): Double = r
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Aggregate functions beyond `org.apache.spark.sql.functions`. */
object GraftAggregates {
  private lazy val prodUdf = udaf(ProductAgg)

  /** prod(col) — exact running product (reference sql_utils.py:56-66). */
  def prod(c: Column): Column = prodUdf(c.cast("double"))

  /** any(col) — true if any value is true (reference AGG_ANY,
    * sql_utils.py:69-77; bool cast core.py:1116-1119). */
  def anyAgg(c: Column): Column = bool_or(c.cast("boolean"))

  /** all(col) — true if every value is true (reference AGG_ALL,
    * sql_utils.py:80-87). */
  def allAgg(c: Column): Column = bool_and(c.cast("boolean"))
}
