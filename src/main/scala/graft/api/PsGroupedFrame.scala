package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, NumericType}
import graft.functions.GraftAggregates

/** Grouped intermediate — not executable until an aggregate is applied.
  *
  * The reference models this as `GroupByDataFrame`/`GroupByProjection`
  * (reference: pandasql/core.py:1003-1071), skipped during CTE assembly
  * until an `Aggregator` lands on it; Spark's `RelationalGroupedDataset`
  * has exactly the same contract. Aggregates keep the original column name
  * (grouped SQL `SELECT g, SUM(c) AS c ...`, core.py:1094-1110).
  *
  * Physical execution is `HashAggregateExec` with partial (map-side)
  * aggregation before the shuffle — at 100 TB the shuffle carries one
  * partial row per (partition × group), not the raw data.
  */
final class PsGroupedFrame(
    df: DataFrame,
    keys: Seq[String],
    selected: Option[Seq[String]]) {

  /** `groupby(k)[['a','b']]` — project the grouped frame
    * (reference GroupByProjection, core.py:1044-1071). */
  def apply(cols: String*): PsGroupedFrame =
    new PsGroupedFrame(df, keys, Some(cols))

  /** pandas `groupby(keys).head(n)`: first `n` rows per group under
    * `orderBy` — delegates to [[PsDataFrame.headPerGroup]] (map-side
    * WindowGroupLimit; the shuffle never carries more than n rows per
    * key per task). */
  def head(n: Int, orderBy: Seq[PsColumn]): PsDataFrame =
    new PsDataFrame(df).headPerGroup(n, keys, orderBy)

  /** pandas `pivot_table(index=keys, columns=pivotCol, values=valueCol,
    * aggfunc=fn)`: one output column per pivot value. Values are REQUIRED
    * (not discovered): Spark's value-less pivot runs an eager distinct
    * scan at compose time, which breaks the declare-then-act contract —
    * and at scale an unbounded pivot width is a bug, not a convenience.
    * Still one partial-aggregating pass. */
  def pivotAgg(pivotCol: String, values: Seq[Any],
      valueCol: String, fn: String): PsDataFrame = {
    require(values.nonEmpty, "pivotAgg needs explicit pivot values")
    new PsDataFrame(df.groupBy(keys.map(df(_)): _*)
      .pivot(pivotCol, values)
      .agg(PsGroupedFrame.fnCol(fn, df(valueCol))))
  }

  /** pandas `groupby(keys)[valueCol].quantile(q)` — EXACT linear-
    * interpolation percentile (Spark `percentile`; DuckDB/pandas
    * `quantile_cont` semantics). Exact percentile buffers each group's
    * values for the final sort; for a cheap fixed-error sketch at scale
    * use Sketches.approxPercentiles instead. */
  def quantile(valueCol: String, q: Double, as: String): PsDataFrame = {
    require(q >= 0 && q <= 1, "quantile q must be in [0, 1]")
    new PsDataFrame(grouped(Seq(
      percentile(df(valueCol), lit(q)).as(as))))
  }

  def sum(): PsDataFrame   = aggAllColumns("sum")
  def mean(): PsDataFrame  = aggAllColumns("mean")
  def count(): PsDataFrame = aggAllColumns("count")
  def min(): PsDataFrame   = aggAllColumns("min")
  def max(): PsDataFrame   = aggAllColumns("max")
  def prod(): PsDataFrame  = aggAllColumns("prod")
  def any(): PsDataFrame   = aggAllColumns("any")
  def all(): PsDataFrame   = aggAllColumns("all")
  def std(): PsDataFrame    = aggAllColumns("std")
  def variance(): PsDataFrame = aggAllColumns("var")
  def median(): PsDataFrame = aggAllColumns("median")

  /** One aggregate function over every value column, names preserved
    * (reference Aggregator, core.py:1075-1160). */
  def aggAllColumns(fn: String): PsDataFrame = {
    val vals = valueColumns(fn)
    require(vals.nonEmpty, s"no aggregatable columns for $fn")
    val aggs = vals.map(c => PsGroupedFrame.fnCol(fn, df(c)).as(c))
    new PsDataFrame(grouped(aggs))
  }

  /** Explicit per-column aggregates with explicit output names:
    * `agg("l_quantity" -> "sum" -> "sum_qty", ...)`. */
  def agg(specs: ((String, String), String)*): PsDataFrame = {
    val aggs = specs.map { case ((c, fn), out) =>
      PsGroupedFrame.fnCol(fn, df(c)).as(out)
    }
    new PsDataFrame(grouped(aggs))
  }

  /** `groupby(g).agg([f1,f2])` — every (column × fn) in ONE pass with flat
    * `col_fn` names. The reference runs one Aggregator per fn and
    * self-joins them back on the group keys (GroupedMultiAggregator,
    * core.py:1230-1258) — on Spark a single HashAggregate computes all of
    * them together, so the N-way self-join (N extra shuffles) disappears.
    */
  def aggFns(fns: Seq[String]): PsDataFrame = {
    val aggs = for {
      fn <- fns
      c  <- valueColumns(fn)
    } yield PsGroupedFrame.fnCol(fn, df(c)).as(s"${c}_$fn")
    new PsDataFrame(grouped(aggs))
  }

  private def grouped(aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty,
      "no aggregate expressions: agg() needs specs and aggFns() needs a " +
        "function matching at least one value column")
    if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(keys.map(df(_)): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def valueColumns(fn: String): Seq[String] = {
    val base = selected.getOrElse(df.columns.toSeq.filterNot(keys.contains))
    fn match {
      // numeric-only aggregates (pandas drops non-numeric for these)
      case "sum" | "mean" | "prod" | "std" | "var" | "median" | "p25" | "p75" =>
        base.filter(isNumeric)
      case "any" | "all"           => base.filter(c => isNumeric(c) || isBoolean(c))
      case _                       => base
    }
  }

  private def isNumeric(c: String): Boolean =
    df.schema(c).dataType.isInstanceOf[NumericType]
  private def isBoolean(c: String): Boolean =
    df.schema(c).dataType == BooleanType
}

object PsGroupedFrame {
  def numericColumns(df: DataFrame): Seq[String] =
    df.schema.fields.filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq

  /** Aggregate-function dispatch (reference fn→SQL map, core.py:1076-1085). */
  def fnCol(fn: String, c: Column): Column = fn match {
    case "sum"   => sum(c)
    case "count" => count(c)
    case "mean"  => avg(c)
    case "min"   => min(c)
    case "max"   => max(c)
    case "prod"  => GraftAggregates.prod(c)
    // pandas std/var (ddof=1 → *_samp) and exact median (extension; the
    // reference stops at sum/count/mean/min/max/prod/any/all). Bit-parity
    // with DuckDB stddev_samp/var_samp/quantile_cont verified on the
    // integer-valued testdata — safe for the hash oracle.
    case "std"    => stddev_samp(c)
    case "var"    => var_samp(c)
    case "median" => median(c)
    case "p25"    => percentile(c, lit(0.25))
    case "p75"    => percentile(c, lit(0.75))
    case "nunique" => count_distinct(c) // pandas nunique (extension; the
    // reference has no distinct-agg, SURVEY §2.6)
    case "any"   => GraftAggregates.anyAgg(c)
    case "all"   => GraftAggregates.allAgg(c)
    case other   => throw new IllegalArgumentException(s"unsupported aggregate: $other")
  }
}
