package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, NumericType}
import graft.functions.GraftAggregates
import org.apache.spark.sql.{functions => F}

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
    selected: Option[Seq[String]],
    kind: PsGroupedFrame.Kind = PsGroupedFrame.KindGroupBy) {

  /** `groupby(k)[['a','b']]` — project the grouped frame
    * (reference GroupByProjection, core.py:1044-1071). */
  def apply(cols: String*): PsGroupedFrame =
    new PsGroupedFrame(df, keys, Some(cols), kind)

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

  /** Ordered aggregates — pandas `idxmax/idxmin/first/last` — ALL in one
    * partial-aggregating pass (no window, O(1) agg state per spec) via
    * the struct-extrema trick. Physically a SortAggregate pair (struct
    * buffers are not hash-aggregable): each map task sorts its partition
    * by the group key, but the exchange still carries one pre-reduced
    * row per (partition, key) — never the corpus (plan-asserted in
    * PlanShapeSpec):
    *
    *   - `idxmax`: `anchorCol` of the row with the max value —
    *     `max(struct(value, anchor))`; ties take the LARGEST anchor
    *   - `idxmin`: anchor of the min value; ties take the SMALLEST anchor
    *   - `first`:  value at the smallest anchor — `min(struct(anchor, value))`
    *   - `last`:   value at the largest anchor
    *
    * pandas' own tie rule ("first row encountered") has no distributed
    * meaning, so ties resolve through struct ordering instead — a
    * deterministic convention the DuckDB oracle mirrors exactly. Pass a
    * unique anchor (e.g. the primary key) for a total order. */
  def aggOrdered(anchorCol: String, specs: ((String, String), String)*): PsDataFrame = {
    val anchor = df(anchorCol)
    val aggs = specs.map { case ((c, fn), out) =>
      val v = df(c)
      (fn match {
        case "idxmax" => F.max(struct(v, anchor)).getField(anchorCol)
        case "idxmin" => F.min(struct(v, anchor)).getField(anchorCol)
        case "first"  => F.min(struct(anchor, v)).getField(c)
        case "last"   => F.max(struct(anchor, v)).getField(c)
        case other => throw new IllegalArgumentException(
          s"aggOrdered: unsupported fn $other (idxmax/idxmin/first/last)")
      }).as(out)
    }
    new PsDataFrame(grouped(aggs))
  }

  /** pandas `groupby(keys)[valueCol].idxmax()` sugar over [[aggOrdered]]. */
  def idxmax(valueCol: String, idCol: String, as: String): PsDataFrame =
    aggOrdered(idCol, (valueCol, "idxmax") -> as)

  /** pandas `idxmin()` sugar over [[aggOrdered]]. */
  def idxmin(valueCol: String, idCol: String, as: String): PsDataFrame =
    aggOrdered(idCol, (valueCol, "idxmin") -> as)

  /** pandas `groupby(keys)[[c1,c2]].corr()` / `.cov()`: Pearson
    * correlation and sample covariance (ddof=1) in ONE native pass
    * (streaming co-moments, partial+final). The co-moment merge order
    * makes the low bits partition-dependent — fine for analytics; use
    * [[corrExact]] where bit-exact cross-engine parity matters. */
  def corrCov(c1: String, c2: String, corrAs: String, covAs: String): PsDataFrame =
    new PsDataFrame(grouped(Seq(
      corr(df(c1), df(c2)).as(corrAs),
      covar_samp(df(c1), df(c2)).as(covAs))))

  /** Bit-portable Pearson correlation + sample covariance: the five
    * co-sums are EXACT decimal aggregates (merge-order-free by
    * exactness), and the closing arithmetic is a fixed left-to-right
    * sequence of IEEE double ops that the DuckDB oracle replays verbatim
    * — so the hash compare holds bit-for-bit. One partial-aggregating
    * pass, O(1) state; decimal(38,4) sums hold ~1e34 row-value products,
    * far past 100 TB-scale row counts. Inputs are cast to decimal(18,2) —
    * two fractional digits, matching money/quantity columns; a wider
    * input scale would push the product past both engines' 38-digit
    * decimal width (DuckDB overflows, Spark silently rounds). */
  def corrExact(c1: String, c2: String, corrAs: String, covAs: String): PsDataFrame = {
    val x = df(c1).cast("decimal(18,2)")
    val y = df(c2).cast("decimal(18,2)")
    val g = grouped(Seq(
      F.count(lit(1)).as("__n"),
      F.sum(x).as("__sx"), F.sum(y).as("__sy"),
      F.sum(x * x).as("__sxx"), F.sum(y * y).as("__syy"),
      F.sum(x * y).as("__sxy")))
    val n   = col("__n").cast("double")
    val sx  = col("__sx").cast("double");  val sy  = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double"); val syy = col("__syy").cast("double")
    val sxy = col("__sxy").cast("double")
    val covNum = n * sxy - sx * sy
    new PsDataFrame(g
      .withColumn(corrAs, covNum / sqrt(n * sxx - sx * sx) / sqrt(n * syy - sy * sy))
      .withColumn(covAs, covNum / n / (n - lit(1.0)))
      .drop("__n", "__sx", "__sy", "__sxx", "__syy", "__sxy"))
  }

  /** Ordered string aggregation (pandas `' '.join` under groupby; SQL
    * `string_agg(v, sep ORDER BY ord)`): concatenate each group's values
    * in `orderCol` order. collect_list is partial-aggregating but
    * UNORDERED distributed, so the order rides inside the collected
    * structs and one `array_sort` restores it deterministically (ties
    * break by value). The whole group buffers in one aggregation row —
    * the right tool for bounded groups (document reassembly, pack
    * assembly), not for unbounded key cardinalities. */
  def strJoin(valueCol: String, orderCol: String, sep: String, as: String): PsDataFrame = {
    val collected = array_sort(collect_list(struct(df(orderCol), df(valueCol))))
    val joined = array_join(
      transform(collected, x => x.getField(valueCol)), sep)
    new PsDataFrame(grouped(Seq(joined.as(as))))
  }

  /** pandas `groupby(keys).filter(lambda g: fn(g[c]) <pred>)`: keep ALL
    * rows of groups whose aggregate satisfies `pred`. ONE unordered
    * window aggregate — hash shuffle on the keys, no sort, no self-join
    * (the naive agg-then-join form would shuffle twice). */
  def filterAgg(valueCol: String, fn: String, pred: Column => Column): PsDataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tmp = Iterator.from(0).map(i => s"__gagg$i")
      .find(!df.columns.contains(_)).get
    val w = Window.partitionBy(keys.map(df(_)): _*)
    val out = df.withColumn(tmp, PsGroupedFrame.fnCol(fn, df(valueCol)).over(w))
      .filter(pred(col(tmp)))
      .drop(tmp)
    new PsDataFrame(out)
  }

  /** pandas `groupby(keys).filter(lambda g: len(g) >= n)` sugar. */
  def filterSize(minSize: Long): PsDataFrame = {
    require(keys.nonEmpty, "filterSize needs group keys")
    filterAgg(keys.head, "count", _ >= minSize)
  }

  /** pandas `groupby(keys)[valueCol].agg(pd.Series.mode)` — the modal
    * value per group, ties resolving to the SMALLEST value (pandas mode
    * returns all tied values sorted; distributed we keep the first).
    * Two partial-aggregating passes — (keys, value) counts, then a
    * struct-extrema argmax — never a per-group sort. */
  def mode(valueCol: String, as: String): PsDataFrame = {
    val counted = df.groupBy((keys :+ valueCol).map(df(_)): _*)
      .agg(F.count(lit(1)).as("__cnt"))
    // min(struct(-cnt, value)): largest count first, smallest value on ties
    val pick = F.min(struct((-col("__cnt")).as("nc"), col(valueCol).as("v")))
      .getField("v").as(as)
    val out =
      if (keys.isEmpty) counted.agg(pick)
      else counted.groupBy(keys.map(counted(_)): _*).agg(pick)
    new PsDataFrame(out)
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

  /** Multi-granularity aggregate: the same one-pass agg, but with
    * `grouping_id()` exposed as `gidAs` so subtotal strata are labeled
    * (0 = most detailed; bit set = that key aggregated away, leftmost
    * key = most significant bit — same convention as SQL `GROUPING()`).
    * Only meaningful on [[PsDataFrame.cube]]/[[PsDataFrame.rollup]]/
    * [[PsDataFrame.groupingSets]] frames. */
  def aggWithGroupingId(gidAs: String, specs: ((String, String), String)*): PsDataFrame = {
    require(kind != PsGroupedFrame.KindGroupBy,
      "grouping_id() labels cube/rollup/groupingSets strata; a plain " +
        "groupby has exactly one stratum — use agg()")
    val aggs = specs.map { case ((c, fn), out) =>
      PsGroupedFrame.fnCol(fn, df(c)).as(out)
    } :+ grouping_id().cast("long").as(gidAs)
    new PsDataFrame(grouped(aggs))
  }

  private def grouped(aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty,
      "no aggregate expressions: agg() needs specs and aggFns() needs a " +
        "function matching at least one value column")
    val keyCols = keys.map(df(_))
    kind match {
      case PsGroupedFrame.KindGroupBy =>
        if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
        else df.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
      case PsGroupedFrame.KindCube =>
        df.cube(keyCols: _*).agg(aggs.head, aggs.tail: _*)
      case PsGroupedFrame.KindRollup =>
        df.rollup(keyCols: _*).agg(aggs.head, aggs.tail: _*)
      case PsGroupedFrame.KindGroupingSets(sets) =>
        df.groupingSets(sets.map(_.map(df(_))), keyCols: _*)
          .agg(aggs.head, aggs.tail: _*)
    }
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

  /** Which grouping the frame performs when an aggregate lands on it.
    * Cube/rollup/grouping-sets plan as ONE Expand (input replicated once
    * per stratum) feeding ONE partial+final HashAggregate pair — a single
    * shuffle regardless of stratum count, never one job per granularity. */
  sealed trait Kind
  case object KindGroupBy extends Kind
  case object KindCube extends Kind
  case object KindRollup extends Kind
  final case class KindGroupingSets(sets: Seq[Seq[String]]) extends Kind

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
