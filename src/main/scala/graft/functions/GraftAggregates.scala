package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact product aggregate (null-skipping fold).
  *
  * The reference registers a Python step/finalize aggregate `PROD` on its
  * SQLite connection (reference: pandasql/sql_utils.py:56-66, core.py:1081)
  * that folds only PRESENT values — SQL aggregates skip NULLs. The input
  * type is `java.lang.Double` so a null row reaches `reduce` as `null` and
  * is skipped rather than deserialized to 0.0 (which would zero the whole
  * product). Participates in partial aggregation: map-side combine before
  * the shuffle, one partial double per partition crosses the wire.
  */
object ProductAgg extends Aggregator[java.lang.Double, Double, Double] {
  override def zero: Double = 1.0
  override def reduce(b: Double, a: java.lang.Double): Double =
    if (a == null) b else b * a.doubleValue()
  override def merge(b1: Double, b2: Double): Double = b1 * b2
  override def finish(r: Double): Double = r
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Aggregate functions beyond `org.apache.spark.sql.functions`. */
object GraftAggregates {
  private lazy val prodUdf = udaf(ProductAgg)

  /** prod(col) — product of non-null values (reference sql_utils.py:56-66).
    *
    * Declarative sign/zero/exp-sum-log decomposition: every piece is a
    * built-in aggregate, so the whole thing runs inside whole-stage codegen
    * with partial (map-side) aggregation — no object-serde UDAF on the hot
    * path. NULLs are skipped (SQL semantics), a zero short-circuits to 0.0,
    * an empty/all-null group yields NULL, sign comes from the parity of
    * negative inputs. Relative error is ~n·ulp from the log/exp round-trip;
    * for bit-exact folds use [[prodExact]].
    */
  def prod(c: Column): Column = prodExpr(c.cast("double"), identity)

  /** prod over a window frame — the running/cumulative product (pandas
    * `cumprod`). The same decomposition with every piece windowed over
    * ONE shared frame, so Spark computes all four running aggregates in
    * a single Window pass. */
  def prodOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    prodExpr(c.cast("double"), _.over(w))

  private def prodExpr(x: Column, place: Column => Column): Column = {
    val nonNull = place(count(x))
    val zeros = place(count(when(x === 0.0, 1)))
    val negs = place(count(when(x < 0.0, 1)))
    val logSum = place(sum(log(abs(nullif(x, lit(0.0))))))
    val signed = (lit(1.0) - lit(2.0) * (negs % 2).cast("double")) * exp(logSum)
    when(nonNull === 0, lit(null).cast("double"))
      .when(zeros > 0, lit(0.0))
      .otherwise(signed)
  }

  /** prod(col) — bit-exact multiplication fold via a typed Aggregator
    * (object-serde path; prefer [[prod]] unless exactness matters). */
  def prodExact(c: Column): Column = prodUdf(c.cast("double"))

  /** any(col) — true if any non-null value is true (reference AGG_ANY,
    * sql_utils.py:69-77; bool cast core.py:1116-1119). */
  def anyAgg(c: Column): Column = bool_or(c.cast("boolean"))

  /** all(col) — true if every non-null value is true (reference AGG_ALL,
    * sql_utils.py:80-87). */
  def allAgg(c: Column): Column = bool_and(c.cast("boolean"))
}
