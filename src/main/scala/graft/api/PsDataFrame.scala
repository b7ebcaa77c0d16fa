package graft.api

import scala.language.dynamics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pandas-flavored lazy frame over an immutable Spark `DataFrame`.
  *
  * The reference's `DataFrame` is a node in a hand-built operator DAG that
  * compiles to SQLite CTEs (reference: pandasql/core.py:497-531, 34-278);
  * here the "DAG" IS the Catalyst logical plan, so every method is a 1-5
  * line delegation and Catalyst provides pushdown/pruning/join-selection.
  *
  * Mutation semantics: `set` (the reference's `df['c'] = expr`,
  * core.py:545-578 + Update core.py:667-726) re-points this wrapper at a
  * new plan; any previously handed-out `PsDataFrame`/`PsColumn` keeps the
  * old plan — exactly the reference's copy-on-write versioning, obtained
  * for free from DataFrame immutability.
  */
final class PsDataFrame(private var _df: DataFrame) extends scala.Dynamic {

  def df: DataFrame = _df
  def columns: Seq[String] = _df.columns.toSeq

  /** pandas attribute-style column access (`df.n` for `df['n']`,
    * reference core.py:534-543 `__getattr__`). Scala's `Dynamic` gives
    * the same sugar: any name that isn't a real method resolves to a
    * column reference. Same caveat as pandas — names shadowed by real
    * API methods (`sum`, `count`, ...) need the bracket form. */
  def selectDynamic(name: String): PsColumn = apply(name)

  /** pandas `df.dtypes` — (column, type) pairs; metadata-only, no job. */
  def dtypes: Seq[(String, String)] =
    _df.schema.fields.toSeq.map(f => f.name -> f.dataType.typeName)

  /** Scale guardrails for THIS frame's plan — [[graft.plans.PlanLint]]
    * as an API facade, so user-composed queries get the same plan-shape
    * checks the library's own operators are spec'd against (cartesian
    * products, single-partition windows, unpushed filters, wide-payload
    * broadcasts, shuffle counts). No job runs; findings, not failures —
    * only the caller knows whether a flagged shape is over 100 rows or
    * 100 TB. */
  def lintPlan(): Seq[graft.plans.PlanLint.Finding] =
    graft.plans.PlanLint.lint(_df)

  /** `explain()` with the lint attached: prints the formatted physical
    * plan followed by [[lintPlan]]'s findings (or an all-clear line). */
  def explainLint(): Unit = {
    _df.explain("formatted")
    val r = graft.plans.PlanLint.report(_df)
    println(if (r.isEmpty) "PlanLint: no findings" else r)
  }

  /** pandas `len(df)` — EAGER (runs a count job), exactly like the
    * reference's compute-forcing `__len__` (core.py:623-625). */
  def len: Long = _df.count()

  /** pandas `df.shape` — (rows, cols); the row side is eager like [[len]]. */
  def shape: (Long, Int) = (len, _df.columns.length)

  /** pandas `df.memory_usage(deep=True)` analogue: content bytes per
    * column, as ONE distributed aggregate (no collect of data). Variable-
    * width columns (string/binary) report their summed byte length;
    * fixed-width columns report rows × type width. The exact resident
    * size is representation-dependent (Tungsten vs pandas object dtype),
    * so content size is the portable measure — the reference's own
    * numbers are pandas-representation-specific too (core.py:617-621). */
  def memoryUsage(): Seq[(String, Long)] = {
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val fields = _df.schema.fields.toSeq
    if (fields.isEmpty) return Nil
    // `functions.`-qualified: the frame's own nullary sum()/count()
    // shadow the sql.functions aggregates inside this class
    val F = org.apache.spark.sql.functions
    val aggCols = fields.map { f =>
      (f.dataType match {
        case StringType | BinaryType =>
          coalesce(F.sum(octet_length(col(f.name)).cast("long")), lit(0L))
        case dt => F.count(lit(1)) * dt.defaultSize.toLong
      }).as(f.name)
    }
    val row = _df.agg(aggCols.head, aggCols.tail: _*).head()
    fields.zipWithIndex.map { case (f, i) =>
      f.name -> (if (row.isNullAt(i)) 0L else row.getLong(i))
    }
  }

  private def toCol(x: Any): Column = x match {
    case p: PsColumn => p.col
    case c: Column   => c
    case v           => lit(v)
  }

  // ---- projection / filter (reference Projection core.py:761-796,
  //      Selection core.py:799-815) ----

  /** `df['c']` / `df.c` — single-column expression; carries the owning
    * frame so per-column aggregate sugar (`df("n").sum()`) and type-aware
    * `~` dispatch work (reference core.py:219-241, 360/440). */
  def apply(c: String): PsColumn = PsColumn(_df(c), Some(_df))

  /** `df[['a','b']]` — multi-column projection. */
  def apply(cols: Seq[String]): PsDataFrame =
    new PsDataFrame(_df.select(cols.map(_df(_)): _*))

  /** `df[criterion]` — row filter. */
  def apply(crit: PsColumn): PsDataFrame = new PsDataFrame(_df.filter(crit.col))

  def select(cols: String*): PsDataFrame = apply(cols)
  def where(crit: PsColumn): PsDataFrame = apply(crit)

  /** Free-standing expression projection: `SELECT <exprs> FROM df`
    * (reference Arithmetic-as-relation, core.py:1430-1431). */
  def selectExprs(exprs: PsColumn*): PsDataFrame =
    new PsDataFrame(_df.select(exprs.map(_.col): _*))

  // ---- dedup / sort / limit (reference core.py:597-607, 818-849, 978-995) ----

  /** Full-row DISTINCT (the only dedup the reference supports). */
  def dropDuplicates(): PsDataFrame = new PsDataFrame(_df.distinct())

  /** pandas `drop(columns=...)` — projection without the named columns. */
  def drop(cols: String*): PsDataFrame = new PsDataFrame(_df.drop(cols: _*))

  /** `sort_values(by, ascending)` — multi-column, per-column direction. */
  def sortValues(by: Seq[String], ascending: Seq[Boolean] = Nil): PsDataFrame = {
    val asc = if (ascending.isEmpty) Seq.fill(by.size)(true) else ascending
    require(asc.size == by.size, "ascending must match by")
    val ord = by.zip(asc).map { case (c, a) => if (a) _df(c).asc else _df(c).desc }
    new PsDataFrame(_df.orderBy(ord: _*))
  }
  def sortValues(by: String): PsDataFrame = sortValues(Seq(by))

  /** `head(n)` / `df[:n]`. */
  def head(n: Int): PsDataFrame = new PsDataFrame(_df.limit(n))

  /** nlargest/nsmallest — the reference's only pandas-fallback ops
    * (api_status.py:24-28); on Spark just a sort+limit, fully distributed
    * (Catalyst plans a TakeOrderedAndProject: per-partition top-k, no full
    * sort, no full shuffle). */
  def nlargest(n: Int, cols: Seq[String]): PsDataFrame =
    new PsDataFrame(_df.orderBy(cols.map(_df(_).desc): _*).limit(n))
  def nsmallest(n: Int, cols: Seq[String]): PsDataFrame =
    new PsDataFrame(_df.orderBy(cols.map(_df(_).asc): _*).limit(n))

  // ---- join (reference Join core.py:852-945, MultiJoin core.py:948-955) ----

  /** Inner equi-join with the reference's column semantics: output is the
    * union of columns; a name present on both sides is sourced from the
    * LEFT (core.py:884-886); with `leftOn != rightOn` both key columns are
    * kept (tests/test_data_frame.py:156-173). Physical strategy (broadcast
    * vs shuffled hash vs sort-merge) is Catalyst's choice; pass
    * `broadcast(right.df)` upstream or rely on AQE for small dims.
    *
    * Deliberate divergence: output column ORDER is left-then-right (Spark
    * convention), not the reference's lexicographically-sorted union
    * (pd.Index.union, core.py:879-886) — relational comparisons are
    * column-order-insensitive, and positional stability is more useful.
    */
  def merge(
      right: PsDataFrame,
      on: Seq[String] = Nil,
      leftOn: Seq[String] = Nil,
      rightOn: Seq[String] = Nil,
      how: String = "inner",
      suffixes: Option[(String, String)] = None): PsDataFrame = {
    val l = _df
    val r = right.df
    if (on.nonEmpty) {
      val dupes = r.columns.filter(c => l.columns.contains(c) && !on.contains(c))
      suffixes match {
        // pandas suffixes=('_x','_y'): keep BOTH copies of overlapping
        // non-key columns under suffixed names (extension; the reference
        // always sources duplicates from the left, the default below)
        case Some((ls, rs)) =>
          val l2 = dupes.foldLeft(l)((d, c) => d.withColumnRenamed(c, s"$c$ls"))
          val r2 = dupes.foldLeft(r)((d, c) => d.withColumnRenamed(c, s"$c$rs"))
          new PsDataFrame(l2.join(r2, on, how))
        // same-name keys collapse to one column (like the reference's SQL
        // which projects the key once); right's other duplicate names drop.
        case None =>
          val r2 = dupes.foldLeft(r)((d, c) => d.drop(c))
          new PsDataFrame(l.join(r2, on, how))
      }
    } else {
      require(leftOn.nonEmpty && leftOn.size == rightOn.size,
        "merge needs on= or leftOn=/rightOn= of equal arity")
      val cond = leftOn.zip(rightOn).map { case (lk, rk) => l(lk) === r(rk) }
        .reduce(_ && _)
      var joined = l.join(r, cond, how)
      for (c <- r.columns if l.columns.contains(c))
        joined = joined.drop(r(c))
      new PsDataFrame(joined)
    }
  }

  /** Left-deep N-ary join on shared keys (reference MultiJoin). */
  def multiJoin(others: Seq[PsDataFrame], on: Seq[String]): PsDataFrame =
    others.foldLeft(this)((acc, o) => acc.merge(o, on = on))

  /** pandas `merge_asof(left, right, on=time, by=keys)` — backward-
    * inclusive as-of join, delegating to the native Catalyst operator
    * ([[graft.operators.AsOfJoin.asof]] → AsOfJoinExec). `valueCols`
    * default: every right column that is neither a key nor the time. */
  def mergeAsof(
      right: PsDataFrame,
      on: String,
      by: Seq[String],
      valueCols: Seq[String] = Nil,
      how: String = "left",
      rightPrefix: String = "r_",
      direction: String = "backward",
      tolerance: Option[Long] = None): PsDataFrame = {
    val values =
      if (valueCols.nonEmpty) valueCols
      else right.columns.filterNot(c => c == on || by.contains(c))
    val out =
      if (direction == "backward" && tolerance.isEmpty)
        graft.operators.AsOfJoin.asof(_df, right.df, by, on, on, values, how, rightPrefix)
      else
        graft.operators.AsOfJoin.asofDirectional(
          _df, right.df, by, on, on, values, how, rightPrefix, direction, tolerance)
    new PsDataFrame(out)
  }

  /** pandas `resample(freq, on=ts).agg(...)` — tumbling event-time
    * windows as a groupBy on `window()` (the batch face of the streaming
    * window aggregation; identical partial-agg shuffle shape). `freq` is
    * a Spark interval string ("1 hour", "15 minutes"). */
  def resample(freq: String, on: String, aggs: ((String, String), String)*): PsDataFrame = {
    require(aggs.nonEmpty, "resample needs at least one (col, fn) -> name aggregate")
    val f = org.apache.spark.sql.functions
    val cols = aggs.map { case ((c, fn), as) =>
      (fn match {
        case "sum"   => f.sum(_df(c))
        case "mean"  => f.avg(_df(c))
        case "min"   => f.min(_df(c))
        case "max"   => f.max(_df(c))
        case "count" => f.count(_df(c))
        case other   => sys.error(s"resample: unsupported fn $other")
      }).as(as)
    }
    new PsDataFrame(_df
      .groupBy(f.window(_df(on), freq))
      .agg(cols.head, cols.tail: _*)
      .select(col("window.start").as("window_start") +: aggs.map(a => col(a._2)): _*))
  }

  // ---- union (reference Union core.py:958-975) ----

  /** `concat` — UNION ALL by column NAME (the reference checks column-set
    * equality, core.py:963-965; Spark's positional `union` would silently
    * mis-align, so this is `unionByName`). */
  def concat(others: PsDataFrame*): PsDataFrame =
    new PsDataFrame(others.foldLeft(_df)((acc, o) => acc.unionByName(o.df)))

  /** pandas `concat` with NON-identical column sets: the output schema is
    * the union of columns, absent cells null (pandas NaN). The reference
    * rejects this shape (symmetric-difference check); the strict form
    * stays as [[concat]]. */
  def concatOuter(others: PsDataFrame*): PsDataFrame =
    new PsDataFrame(others.foldLeft(_df)((acc, o) =>
      acc.unionByName(o.df, allowMissingColumns = true)))

  // ---- set ops / cross join (designed extensions — the reference has
  //      no INTERSECT/EXCEPT and fakes cross joins with a dummy=1 key,
  //      SURVEY §2.4-2.5) ----

  /** SQL INTERSECT (distinct rows in both). Spark plans a partial-
    * aggregating hash join — both sides shuffle once on the full row. */
  def intersect(other: PsDataFrame): PsDataFrame =
    new PsDataFrame(_df.intersect(other.df))

  /** SQL EXCEPT (distinct rows of this not in `other`). */
  def exceptRows(other: PsDataFrame): PsDataFrame =
    new PsDataFrame(_df.except(other.df))

  /** True Cartesian product (pandas `merge(how="cross")`). The benchmark
    * shape the reference fakes via a `dummy=1` equi-key; Spark broadcasts
    * the small side (BroadcastNestedLoopJoin) instead of hash-shuffling
    * everything to one dummy-key partition. */
  def crossJoin(other: PsDataFrame): PsDataFrame =
    new PsDataFrame(_df.crossJoin(other.df))

  /** pandas `rolling(window, min_periods=window).mean()` within groups,
    * ordered by `orderBy`: a rowsBetween frame — one window pass, no
    * self-join. Emits null for the first window-1 rows of each group
    * (pandas min_periods default). */
  def rollingMean(valueCol: String, window: Int, partitionBy: Seq[String],
      orderBy: Seq[String], as: String): PsDataFrame =
    rollingAgg(valueCol, "mean", window, partitionBy, orderBy, as)

  /** pandas `cut(x, bins, labels)` — explicit-edge binning, right-closed
    * `(lo, hi]` like pandas' default; values outside the edges (and
    * nulls) get a null band. One codegen'd CASE chain per row: no
    * shuffle, no lookup join, safe at any scale. */
  def cut(valueCol: String, edges: Seq[Double], labels: Seq[String],
      as: String): PsDataFrame = {
    require(edges.size >= 2 && edges == edges.sorted, "cut needs sorted bin edges")
    require(labels.size == edges.size - 1, "cut needs one label per bin")
    val v = _df(valueCol)
    val first = when(v > lit(edges(0)) && v <= lit(edges(1)), lit(labels(0)))
    val assigned = (1 until labels.size).foldLeft(first) { (acc, i) =>
      acc.when(v > lit(edges(i)) && v <= lit(edges(i + 1)), lit(labels(i)))
    } // no .otherwise -> null, pandas' NaN for out-of-range
    new PsDataFrame(_df.withColumn(as, assigned))
  }

  /** pandas `qcut(x, q)` — equal-frequency binning. NOT ntile: a global
    * ntile needs a total order, which Spark can only give one partition.
    * Instead: one distributed `percentile` aggregate computes the q-1
    * interior edges (exact, linear interpolation — pandas' definition),
    * broadcast back, and the band is 1 + (#edges strictly below x) — a
    * codegen'd comparison chain. Two passes over the data, zero sorts,
    * works at any scale. Boundary semantics match pandas' right-closed
    * bins. */
  def qcut(valueCol: String, q: Int, as: String): PsDataFrame = {
    require(q >= 2, "qcut needs q >= 2")
    require(!_df.columns.contains("__edges"),
      "qcut: input must not already have a __edges column")
    val probs = (1 until q).map(_.toDouble / q)
    val edges = _df.agg(
      percentile(_df(valueCol), typedLit(probs)).as("__edges"))
    val joined = _df.crossJoin(broadcast(edges))
    val band = (0 until q - 1).foldLeft(lit(1)) { (acc, i) =>
      acc + when(col(valueCol) > col("__edges").getItem(i), 1).otherwise(0)
    }
    new PsDataFrame(joined.withColumn(as, band).drop("__edges"))
  }

  /** [[qcut]] within groups (pandas `groupby(...).transform(qcut)`):
    * per-group exact quantile edges via ONE unordered window aggregate
    * (hash shuffle on the group keys, no sort), then the same comparison
    * chain. The per-stratum form is what a mixing pipeline actually runs
    * ("quartile within each source/language"). */
  def qcutBy(valueCol: String, q: Int, groupBy: Seq[String], as: String): PsDataFrame = {
    require(q >= 2, "qcutBy needs q >= 2")
    require(!_df.columns.contains("__edges"),
      "qcutBy: input must not already have a __edges column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupBy.map(_df(_)): _*)
    val probs = (1 until q).map(_.toDouble / q)
    val withE = _df.withColumn("__edges",
      percentile(_df(valueCol), typedLit(probs)).over(w))
    val band = (0 until q - 1).foldLeft(lit(1)) { (acc, i) =>
      acc + when(col(valueCol) > col("__edges").getItem(i), 1).otherwise(0)
    }
    new PsDataFrame(withE.withColumn(as, band).drop("__edges"))
  }

  /** pandas `groupby(keys)[col].transform(fn)` — the group aggregate
    * broadcast back onto every member row. An unordered window aggregate:
    * one hash shuffle on the keys, NO sort (no orderBy in the frame), and
    * the original row count is preserved. */
  def transformCol(valueCol: String, fn: String, partitionBy: Seq[String],
      as: String): PsDataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionBy.map(_df(_)): _*)
    val f = org.apache.spark.sql.functions
    val agg = fn match {
      case "mean"  => f.avg(_df(valueCol))
      case "sum"   => f.sum(_df(valueCol))
      case "min"   => f.min(_df(valueCol))
      case "max"   => f.max(_df(valueCol))
      case "count" => f.count(_df(valueCol))
      case other   => sys.error(s"transform: unsupported fn $other")
    }
    new PsDataFrame(_df.withColumn(as, agg.over(w)))
  }

  // ---- column mutation / rename (reference core.py:545-578, 729-758) ----

  /** `df['c'] = value` — copy-on-write column assignment. Existing columns
    * keep their position, new columns append (core.py:676-688; exactly
    * `withColumn` semantics). Returns this wrapper, now pointing at the
    * new plan; previously handed-out frames keep the old plan. */
  def set(name: String, value: Any): PsDataFrame = {
    _df = _df.withColumn(name, toCol(value))
    this
  }

  /** `rename(columns=...)` — order-preserving (core.py:729-758). */
  def rename(mapping: Map[String, String]): PsDataFrame =
    new PsDataFrame(_df.withColumnsRenamed(mapping))

  /** pandas `astype({col: dtype})` — per-column cast, order-preserving.
    * Spark type names ("long", "double", "string", "decimal(18,2)", ...). */
  def astype(mapping: Map[String, String]): PsDataFrame = {
    mapping.keys.foreach(c => require(_df.columns.contains(c), s"astype: no column $c"))
    new PsDataFrame(_df.select(_df.columns.map(c =>
      mapping.get(c).fold(col(c))(t => col(c).cast(t).as(c))): _*))
  }

  /** pandas `sample(frac, random_state)` — DETERMINISTIC hash sample on
    * an id column (growth-stable: a row's membership never changes as the
    * corpus grows, unlike Spark's `sample` whose per-partition RNG
    * reshuffles membership on repartition). Thin facade over
    * [[graft.operators.Sampling.sampleByHash]]. */
  def sample(idCol: String, frac: Double, seed: String = ""): PsDataFrame = {
    require(frac >= 0 && frac <= 1, "sample frac must be in [0,1]")
    new PsDataFrame(graft.operators.Sampling.sampleByHash(_df, idCol, frac, seed))
  }

  // ---- analytic windows (extension; the reference lists rolling/rank/
  //      cumsum as unsupported, api_status.py) ----

  private def rowWindow(partitionBy: Seq[String], orderBy: Seq[String]) = {
    import org.apache.spark.sql.expressions.Window
    Window.partitionBy(partitionBy.map(_df(_)): _*)
      .orderBy(orderBy.map(_df(_)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  /** pandas `groupby(...).cumsum()`: running sum per group in row order. */
  def cumsum(valueCol: String, partitionBy: Seq[String], orderBy: Seq[String],
      as: String): PsDataFrame =
    cumAgg(valueCol, "sum", partitionBy, orderBy, as)

  /** pandas `groupby(...).rank(method=...)`: SQL rank over the given
    * order. Methods: "min" (SQL rank, the prior default), "dense",
    * "first" (row_number — requires a total order to be deterministic),
    * "average" (pandas' default: ties share the mean of their positions
    * — min-rank + (ties-1)/2, one extra count over the tie frame). */
  def rankIn(partitionBy: Seq[String], orderBy: Seq[PsColumn], as: String,
      method: String = "min"): PsDataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionBy.map(_df(_)): _*).orderBy(orderBy.map(_.col): _*)
    val f = org.apache.spark.sql.functions
    val ranked = method match {
      case "min"   => f.rank().over(w)
      case "dense" => f.dense_rank().over(w)
      case "first" => f.row_number().over(w)
      case "average" =>
        // ties = rows at the same order position: count over the frame of
        // equal peers = (peers up to current) - (rank-1) ... expressed as
        // min-rank + (tieCount - 1)/2 where tieCount comes from a count
        // over a RANGE frame (peers of the current order value)
        val ties = f.count(lit(1)).over(
          w.rangeBetween(Window.currentRow, Window.currentRow))
        f.rank().over(w) + (ties - lit(1)) / lit(2.0)
      case "pct" =>
        // pandas rank(pct=True, na_option='keep'): average-method rank /
        // NON-NaN count, with NaN rows excluded from both. Expressed with
        // non-null counts instead of rank() so it's immune to where Spark
        // sorts nulls: avg-rank = (non-null rows at-or-before current,
        // RANGE frame so peers count) - (ties-1)/2; null-order rows get a
        // null rank, as in pandas.
        val nonNull = orderBy.map(c => c.sortBase.getOrElse(c.col).isNotNull)
          .reduce(_ && _)
        val upTo = f.count(when(nonNull, 1)).over(
          w.rangeBetween(Window.unboundedPreceding, Window.currentRow))
        val ties = f.count(when(nonNull, 1)).over(
          w.rangeBetween(Window.currentRow, Window.currentRow))
        val total = f.count(when(nonNull, 1))
          .over(Window.partitionBy(partitionBy.map(_df(_)): _*))
        when(nonNull, (upTo - (ties - lit(1)) / lit(2.0)) / total)
      case other => sys.error(s"rankIn: unsupported method $other")
    }
    new PsDataFrame(_df.withColumn(as, ranked))
  }

  /** pandas `groupby(...).cumcount()`: 0-based position within the group
    * under the given order (pass a unique tie-break for determinism). */
  def cumcount(partitionBy: Seq[String], orderBy: Seq[PsColumn], as: String): PsDataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionBy.map(_df(_)): _*)
      .orderBy(orderBy.map(_.col): _*)
    new PsDataFrame(_df.withColumn(as, row_number().over(w) - 1))
  }

  /** pandas `groupby(...).shift(n)`: value from n rows earlier in group order. */
  def lagCol(valueCol: String, n: Int, partitionBy: Seq[String], orderBy: Seq[PsColumn],
      as: String): PsDataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionBy.map(_df(_)): _*).orderBy(orderBy.map(_.col): _*)
    // pandas shift(n) with negative n looks forward: lead
    val shifted = if (n >= 0) lag(_df(valueCol), n) else lead(_df(valueCol), -n)
    new PsDataFrame(_df.withColumn(as, shifted.over(w)))
  }

  /** pandas `groupby(...).diff(n)`: value minus the value n rows earlier
    * in group order (null while the shifted row is out of range);
    * negative n diffs against a later row, as in pandas. */
  def diffCol(valueCol: String, n: Int, partitionBy: Seq[String],
      orderBy: Seq[PsColumn], as: String): PsDataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionBy.map(_df(_)): _*)
      .orderBy(orderBy.map(_.col): _*)
    val prev = if (n >= 0) lag(_df(valueCol), n) else lead(_df(valueCol), -n)
    new PsDataFrame(_df.withColumn(as, _df(valueCol) - prev.over(w)))
  }

  /** pandas `pct_change(n)`: x / shift(n) - 1 in group order. Both sides
    * cast to double so the result is ONE IEEE division (bit-portable
    * across engines) rather than an engine-specific decimal division. */
  def pctChange(valueCol: String, n: Int, partitionBy: Seq[String],
      orderBy: Seq[PsColumn], as: String): PsDataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionBy.map(_df(_)): _*)
      .orderBy(orderBy.map(_.col): _*)
    val prev = (if (n >= 0) lag(_df(valueCol), n) else lead(_df(valueCol), -n)).over(w)
    new PsDataFrame(_df.withColumn(as,
      _df(valueCol).cast("double") / prev.cast("double") - lit(1.0)))
  }

  /** pandas `cummax/cummin/cumcount` (generalizes [[cumsum]]): one
    * running rows-frame window pass — hash shuffle on the group key only,
    * running state is O(1) per row for all four functions. */
  def cumAgg(valueCol: String, fn: String, partitionBy: Seq[String],
      orderBy: Seq[String], as: String): PsDataFrame = {
    val f = org.apache.spark.sql.functions
    val w = rowWindow(partitionBy, orderBy)
    // cumprod: sign/zero/log-sum decomposition, all four running
    // aggregates in one Window pass (float via the exp∘log round-trip —
    // unit-tested, not oracle-hashed)
    if (fn == "prod")
      return new PsDataFrame(_df.withColumn(as,
        graft.functions.GraftAggregates.prodOver(_df(valueCol), w)))
    val agg = fn match {
      case "sum"   => f.sum(_df(valueCol))
      case "max"   => f.max(_df(valueCol))
      case "min"   => f.min(_df(valueCol))
      case "count" => f.count(_df(valueCol))
      case other   => sys.error(s"cumAgg: unsupported fn $other")
    }
    new PsDataFrame(_df.withColumn(as, agg.over(w)))
  }

  /** pandas `ffill()` within groups under an explicit order: nulls take
    * the most recent non-null value — ONE IGNORE-NULLS running window
    * pass (O(1) state per row). */
  def ffill(valueCol: String, partitionBy: Seq[String], orderBy: Seq[String],
      as: String): PsDataFrame =
    new PsDataFrame(_df.withColumn(as,
      last(_df(valueCol), ignoreNulls = true)
        .over(rowWindow(partitionBy, orderBy))))

  /** pandas `bfill()`: nulls take the NEXT non-null value (the mirrored
    * current-row..unbounded-following frame). */
  def bfill(valueCol: String, partitionBy: Seq[String], orderBy: Seq[String],
      as: String): PsDataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionBy.map(_df(_)): _*)
      .orderBy(orderBy.map(_df(_)): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    new PsDataFrame(_df.withColumn(as,
      first(_df(valueCol), ignoreNulls = true).over(w)))
  }

  /** pandas `interpolate(method='linear')` within groups: interior nulls
    * fill linearly between the surrounding non-null values by ROW
    * position (pandas 'linear' treats rows as equally spaced); leading
    * and trailing nulls stay null. Two IGNORE-NULLS window frames over
    * one sort; the closing arithmetic is a fixed IEEE sequence —
    * `prev + (next-prev)·(pos-prevPos)/(nextPos-prevPos)` on exact
    * integer positions — that the oracle replays bit-for-bit. */
  def interpolate(valueCol: String, partitionBy: Seq[String],
      orderBy: Seq[String], as: String): PsDataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rn = Iterator.from(0).map(i => if (i == 0) "__ipos" else s"__ipos$i")
      .find(!_df.columns.contains(_)).get
    val wBase = Window.partitionBy(partitionBy.map(_df(_)): _*)
      .orderBy(orderBy.map(_df(_)): _*)
    val d1 = _df.withColumn(rn, row_number().over(wBase))
    val wPrev = Window.partitionBy(partitionBy.map(d1(_)): _*)
      .orderBy(orderBy.map(d1(_)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(partitionBy.map(d1(_)): _*)
      .orderBy(orderBy.map(d1(_)): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = d1(valueCol).cast("double")
    val pv = last(v, ignoreNulls = true).over(wPrev)
    val pp = last(when(v.isNotNull, col(rn)), ignoreNulls = true).over(wPrev)
    val nv = first(v, ignoreNulls = true).over(wNext)
    val np = first(when(v.isNotNull, col(rn)), ignoreNulls = true).over(wNext)
    val fill = pv + (nv - pv) * (col(rn) - pp) / (np - pp)
    val out = when(v.isNotNull, v)
      .otherwise(when(pv.isNotNull && nv.isNotNull, fill)) // edges stay null
    new PsDataFrame(d1.withColumn(as, out).drop(rn))
  }

  /** Shared rolling-agg dispatch: the framed aggregate for `fn` over
    * window spec `w`. "var"/"std" are the SAMPLE (ddof=1) moments via
    * the sum/sumsq identity — (Σx² − (Σx)²/n)/(n−1) with the division
    * LAST, so on integer-valued inputs whose windowed sums stay below
    * 2^53 the result is a deterministic function of exact integers
    * (what the DuckDB oracle replays term-for-term; a per-engine
    * Welford recurrence would differ in ulps). Null when n < 2, pandas'
    * ddof=1 behavior. Catalyst's CollapseWindow folds the sums into the
    * same single WindowExec pass as the other fns. */
  private def rollingFrameAgg(
      fn: String, valueCol: String,
      w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val f = org.apache.spark.sql.functions
    val x = _df(valueCol)
    fn match {
      case "mean"  => f.avg(x).over(w)
      case "sum"   => f.sum(x).over(w)
      case "min"   => f.min(x).over(w)
      case "max"   => f.max(x).over(w)
      case "count" => f.count(x).over(w)
      case "var" | "std" =>
        val n = f.count(x).over(w)
        val nd = n.cast("double")
        val sm = f.sum(x).over(w).cast("double")
        val ss = f.sum(x * x).over(w).cast("double")
        val v = (ss - sm * sm / nd) / (nd - lit(1.0))
        when(n > 1, if (fn == "std") f.sqrt(v) else v)
      case other => sys.error(s"rolling agg: unsupported fn $other")
    }
  }

  /** pandas `rolling(window, min_periods=window).agg(fn)` within groups:
    * one `rowsBetween` frame pass, null until the window fills
    * (generalizes [[rollingMean]]). fn ∈ mean/sum/min/max/count/var/std
    * (var/std are sample moments, ddof=1 — see [[rollingFrameAgg]]). */
  def rollingAgg(valueCol: String, fn: String, window: Int,
      partitionBy: Seq[String], orderBy: Seq[String], as: String): PsDataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window > 0, "rollingAgg needs window > 0")
    val w = Window.partitionBy(partitionBy.map(_df(_)): _*)
      .orderBy(orderBy.map(_df(_)): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val f = org.apache.spark.sql.functions
    val cnt = f.count(_df(valueCol)).over(w)
    new PsDataFrame(_df.withColumn(as,
      when(cnt >= window, rollingFrameAgg(fn, valueCol, w))
        .otherwise(lit(null))))
  }

  /** pandas `rolling("5min", on=ts).agg(fn)` — TIME-based rolling
    * window, the rolling variant time-series users actually reach for
    * (a ROWS frame counts rows; sensor/event data wants "the last five
    * minutes" whatever the row density). One `rangeBetween` frame pass
    * per partition — same single-shuffle shape as [[rollingAgg]], no
    * self-join, no driver loop; at 100 TB the cost is one hash exchange
    * on `partitionBy` plus a per-partition sort, identical to the
    * row-count variant.
    *
    * `on` must be a NUMERIC time axis — this library's normalized
    * event-time representation is ns-since-epoch longs
    * ([[graft.sources.PsIO.readEventsNs]]); pass the window as a
    * duration string ("250ms", "30s", "5min", "2h", "1d").
    *
    * Frame semantics: [t-Δ, t], inclusive both ends — SQL RANGE-frame
    * semantics (what DuckDB/Spark can express and oracle exactly),
    * equal to pandas `closed='both'`. pandas' own default is the
    * left-open (t-Δ, t]; rows exactly Δ apart differ between the two.
    * min_periods follows pandas' TIME-rolling default of 1 (every row
    * emits — unlike [[rollingAgg]], which nulls until the count window
    * fills, pandas' default for integer windows). */
  def rollingTimeAgg(valueCol: String, fn: String, window: String,
      on: String, partitionBy: Seq[String], as: String): PsDataFrame =
    rollingTimeAggs(Seq((valueCol, fn, as)), window, on, partitionBy)

  /** Multi-aggregate form of [[rollingTimeAgg]]: every (valueCol, fn,
    * outName) spec over the SAME time frame in ONE select, so Catalyst
    * plans exactly one WindowExec — one shuffle on `partitionBy` + one
    * per-partition sort however many aggregates ride the frame
    * (StrDateSpec plan-asserts this; a CHAIN of single-agg calls leaves
    * conditional projections between the Window nodes that CollapseWindow
    * cannot always fold). Prefer this form for multi-metric rollups. */
  def rollingTimeAggs(specs: Seq[(String, String, String)], window: String,
      on: String, partitionBy: Seq[String]): PsDataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ns = PsDataFrame.durationNs(window)
    // clash guard (same contract as Checks.flag): a spec output name that
    // repeats or shadows an input column would silently produce a
    // duplicate column name whose later references are ambiguous —
    // unlike rollingAgg's withColumn, select(col("*") +: outs) does NOT
    // replace, it appends
    val outNames = specs.map(_._3)
    require(outNames.distinct.size == outNames.size,
      s"rollingTimeAggs: duplicate output names ${outNames.diff(outNames.distinct).distinct.mkString(", ")}")
    val clash = outNames.filter(_df.columns.contains)
    require(clash.isEmpty,
      s"rollingTimeAggs: output name(s) ${clash.mkString(", ")} already exist as input columns; pick fresh names")
    require(_df.schema(on).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"rollingTimeAgg: time axis '$on' must be numeric ns-since-epoch " +
        s"(see PsIO.readEventsNs), got ${_df.schema(on).dataType.simpleString}")
    val w = Window.partitionBy(partitionBy.map(_df(_)): _*)
      .orderBy(_df(on))
      .rangeBetween(-ns, Window.currentRow)
    val outs = specs.map { case (v, fn, as) => rollingFrameAgg(fn, v, w).as(as) }
    new PsDataFrame(_df.select(col("*") +: outs: _*))
  }

  /** pandas `df[c].value_counts()`: one row per distinct value with its
    * count, most frequent first (ties broken by value so the order is
    * deterministic). Partial-aggregating groupBy + a bounded sort. */
  def valueCounts(c: String, normalize: Boolean = false): PsDataFrame = {
    // pandas raises "cannot insert count, already exists" when counting a
    // column itself named count — mirror that instead of emitting two
    // ambiguous `count` columns
    require(c != "count", "value_counts: cannot count a column named 'count'")
    val counted = _df.groupBy(c)
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("count"))
    // normalize=true -> pandas `proportion` column: count / total. The
    // total is a broadcast 1-row aggregate crossJoined in (same pattern as
    // tfIdf's corpus size N) — an unpartitioned window here would funnel
    // every distinct value through one partition, which for an id-like
    // column is the whole table on one core.
    val out =
      if (!normalize) counted
      else {
        val total = counted.select(
          org.apache.spark.sql.functions.sum("count").as("__total"))
        counted.crossJoin(org.apache.spark.sql.functions.broadcast(total))
          .withColumn("proportion", col("count") / col("__total"))
          .drop("count", "__total")
      }
    val ord = if (normalize) col("proportion") else col("count")
    new PsDataFrame(out.orderBy(ord.desc, col(c)))
  }

  /** pandas `melt(id_vars, value_vars)`: wide-to-long reshape — one
    * output row per (row, value column). Spark's native `unpivot`
    * (codegen'd Expand, no shuffle, no explode of wrapped structs);
    * value columns must share a least common type, as in pandas. */
  def melt(idVars: Seq[String], valueVars: Seq[String],
      varName: String = "variable", valueName: String = "value"): PsDataFrame =
    new PsDataFrame(_df.unpivot(
      idVars.map(_df(_)).toArray, valueVars.map(_df(_)).toArray,
      varName, valueName))

  /** pandas `get_dummies(column)` with EXPLICIT categories: a 0/1
    * indicator column per category appended to the frame. Categories are
    * required, not discovered — a value-less form would run an eager
    * distinct scan at compose time, and unbounded one-hot width is a bug
    * at scale, not a convenience (same contract as
    * [[PsGroupedFrame.pivotAgg]]). One codegen'd projection, shuffle-free;
    * null input rows get all-zeros, as in pandas. */
  def getDummies(c: String, categories: Seq[Any], prefix: String = ""): PsDataFrame = {
    require(categories.nonEmpty, "getDummies needs explicit categories")
    val pre = if (prefix.nonEmpty) prefix else c
    val dummies = categories.map(v =>
      when(_df(c) === lit(v), lit(1)).otherwise(lit(0)).as(s"${pre}_$v"))
    new PsDataFrame(_df.select(_df.columns.map(_df(_)) ++ dummies: _*))
  }

  /** pandas `crosstab(index, columns)`: two-way frequency table — one
    * partial-aggregating pivot pass, empty cells 0 (pandas crosstab
    * yields 0, unlike pivot_table's NaN). Column values explicit, as
    * everywhere pivot-shaped. Null row keys are dropped first (pandas
    * crosstab drops NaN keys), and the zero-fill is restricted to the
    * pivot columns — fill(0) on the row-key column itself would relabel
    * a null key group as a spurious 0 row. */
  def crosstab(rowCol: String, colCol: String, colValues: Seq[Any]): PsDataFrame = {
    require(colValues.nonEmpty, "crosstab needs explicit column values")
    val pivoted = _df
      .filter(_df(rowCol).isNotNull)
      .groupBy(_df(rowCol))
      .pivot(colCol, colValues)
      .agg(org.apache.spark.sql.functions.count(lit(1)))
    new PsDataFrame(
      pivoted.na.fill(0, pivoted.columns.filterNot(_ == rowCol)))
  }

  /** pandas `combine_first(other)` keyed on `on`: self's values win,
    * other fills the gaps — a full outer join + per-column coalesce.
    * Output schema is self's columns (in order) then other's extras;
    * a 100 TB-side note: both sides shuffle once on the key, and the
    * coalesce is codegen'd into the join's projection. */
  def combineFirst(other: PsDataFrame, on: Seq[String]): PsDataFrame = {
    require(on.nonEmpty, "combineFirst needs join keys")
    // name-qualified resolution: both inputs may derive from the SAME
    // source frame (the pandas-typical case), where attribute-id lookup
    // through la(k)/ra(k) is ambiguous by construction
    val la = _df.alias("__cf_l")
    val ra = other.df.alias("__cf_r")
    def lc(c: String) = col(s"__cf_l.`$c`")
    def rc(c: String) = col(s"__cf_r.`$c`")
    val cond = on.map(k => lc(k) === rc(k)).reduce(_ && _)
    val lVals = _df.columns.filterNot(on.contains)
    val rVals = other.df.columns.filterNot(on.contains)
    val keyCols = on.map(k => coalesce(lc(k), rc(k)).as(k))
    val valCols =
      lVals.map(c => if (rVals.contains(c)) coalesce(lc(c), rc(c)).as(c)
                     else lc(c).as(c)) ++
      rVals.filterNot(lVals.contains).map(c => rc(c).as(c))
    new PsDataFrame(la.join(ra, cond, "full_outer")
      .select(keyCols ++ valCols: _*))
  }

  /** pandas `merge(..., indicator=True)`: the merge plus a `_merge`
    * column — 'both' | 'left_only' | 'right_only' — from presence flags
    * carried through the join (no second pass). */
  def mergeIndicator(right: PsDataFrame, on: Seq[String],
      how: String = "outer"): PsDataFrame = {
    require(!_df.columns.contains("_merge") && !right.columns.contains("_merge"),
      "mergeIndicator: input already has a _merge column")
    val fl = Iterator.from(0).map(i => s"__from_l$i")
      .find(n => !_df.columns.contains(n) && !right.columns.contains(n)).get
    val fr = Iterator.from(0).map(i => s"__from_r$i")
      .find(n => !_df.columns.contains(n) && !right.columns.contains(n)).get
    val l2 = new PsDataFrame(_df.withColumn(fl, lit(1)))
    val r2 = new PsDataFrame(right.df.withColumn(fr, lit(1)))
    val j = l2.merge(r2, on = on, how = how).df
    new PsDataFrame(j.withColumn("_merge",
        when(col(fl).isNotNull && col(fr).isNotNull, "both")
          .when(col(fl).isNotNull, "left_only")
          .otherwise("right_only"))
      .drop(fl, fr))
  }

  /** pandas `df[c].replace(mapping)`: literal value mapping, unmatched
    * values pass through. One codegen'd CASE chain, shuffle-free. */
  def replaceVals(c: String, mapping: Seq[(Any, Any)]): PsDataFrame = {
    require(mapping.nonEmpty, "replaceVals needs a non-empty mapping")
    val chain = mapping.foldLeft(Option.empty[Column]) { case (acc, (from, to)) =>
      Some(acc.fold(when(_df(c) === lit(from), lit(to)))(
        _.when(_df(c) === lit(from), lit(to))))
    }.get.otherwise(_df(c))
    new PsDataFrame(_df.withColumn(c, chain))
  }

  /** pandas `fillna(value)`: replace nulls with `value` in the given
    * columns (all type-compatible columns when `subset` is empty). The
    * reference has no null handling at all (no isna/fillna/dropna in its
    * API, reference api_status.py); this is designed extension surface —
    * a pipeline meets nulls the moment it outer-joins or ingests sparse
    * data. Pure projection: codegen'd coalesce, no shuffle. */
  def fillna(value: Any, subset: Seq[String] = Nil): PsDataFrame = {
    val fill = _df.na
    val filled = value match {
      case v: Long   => if (subset.isEmpty) fill.fill(v) else fill.fill(v, subset)
      case v: Int    => if (subset.isEmpty) fill.fill(v.toLong) else fill.fill(v.toLong, subset)
      case v: Double => if (subset.isEmpty) fill.fill(v) else fill.fill(v, subset)
      case v: String => if (subset.isEmpty) fill.fill(v) else fill.fill(v, subset)
      case v: Boolean => if (subset.isEmpty) fill.fill(v) else fill.fill(v, subset)
      case other => throw new IllegalArgumentException(
        s"fillna supports int/long/double/string/boolean, got $other")
    }
    new PsDataFrame(filled)
  }

  /** pandas `dropna()`: drop rows with a null in ANY of the `subset`
    * columns (any column when empty). Filter only — pushes down like any
    * other predicate. */
  def dropna(subset: Seq[String] = Nil, how: String = "any",
      thresh: Option[Int] = None): PsDataFrame = {
    require(how == "any" || how == "all", s"dropna how must be any|all, got $how")
    val cols = if (subset.isEmpty) _df.columns.toSeq else subset
    val dropped = thresh match {
      // pandas thresh: keep rows with at least `thresh` non-null cells
      case Some(t) => _df.na.drop(t, cols)
      case None    => _df.na.drop(how, cols)
    }
    new PsDataFrame(dropped)
  }

  /** pandas `fillna({col: value, ...})` — per-column replacements. */
  def fillnaMap(values: Map[String, Any]): PsDataFrame =
    new PsDataFrame(_df.na.fill(values))

  /** pandas `groupby(keys).head(n)` / per-group nlargest: the first `n`
    * rows of every group under `orderBy`. Plans a map-side
    * WindowGroupLimit (each task keeps ≤ n rows per key BEFORE the
    * shuffle — asserted in PlanShapeSpec), so the exchange carries at
    * most partitions·groups·n rows, never the corpus: the per-group
    * analogue of [[nlargest]]'s TakeOrderedAndProject. */
  def headPerGroup(n: Int, partitionBy: Seq[String], orderBy: Seq[PsColumn]): PsDataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "headPerGroup needs n > 0")
    // collision-free temp name: an input frame may legitimately carry __rn
    val rn = Iterator.from(0).map(i => if (i == 0) "__rn" else s"__rn$i")
      .find(!_df.columns.contains(_)).get
    val w = Window.partitionBy(partitionBy.map(_df(_)): _*).orderBy(orderBy.map(_.col): _*)
    new PsDataFrame(_df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= n)
      .drop(rn))
  }

  // ---- groupby / aggregation (reference core.py:1003-1258) ----

  def groupby(keys: String*): PsGroupedFrame =
    new PsGroupedFrame(_df, keys, None)

  /** Multi-granularity aggregation over every subset of `keys` (the
    * dataset-card report: per source × lang, per source, per lang, and
    * grand total in ONE pass). Extension beyond the reference (SURVEY
    * §2.6 notes it has no grouping sets). Plans as a single Expand +
    * partial/final HashAggregate — the input is replicated ×2^k BEFORE
    * the map-side partial agg, so keep the cubed key set small and
    * low-cardinality (report dimensions), which is exactly its use. */
  def cube(keys: String*): PsGroupedFrame =
    new PsGroupedFrame(_df, keys, None, PsGroupedFrame.KindCube)

  /** Hierarchical subtotals: strata (k1..kn), (k1..kn-1), … , (). Same
    * one-Expand/one-shuffle plan as [[cube]] with n+1 strata instead of
    * 2^n — the right shape for drill-down hierarchies (source → lang). */
  def rollup(keys: String*): PsGroupedFrame =
    new PsGroupedFrame(_df, keys, None, PsGroupedFrame.KindRollup)

  /** Exactly the named strata (each a subset of `keys`) — cube's plan
    * with only the granularities a report actually needs, so the Expand
    * replication factor is `sets.size`, not 2^n. */
  def groupingSets(sets: Seq[Seq[String]], keys: String*): PsGroupedFrame = {
    val bad = sets.flatten.distinct.filterNot(keys.contains)
    require(bad.isEmpty, s"grouping set columns not in keys: ${bad.mkString(", ")}")
    new PsGroupedFrame(_df, keys, None, PsGroupedFrame.KindGroupingSets(sets))
  }

  /** Ungrouped aggregate over all (numeric where required) columns,
    * keeping original column names (reference Aggregator ungrouped SQL
    * `SELECT SUM(c) AS c, ... FROM t`, core.py:1094-1110). */
  def aggAll(fn: String): PsDataFrame =
    new PsGroupedFrame(_df, Nil, None).aggAllColumns(fn)

  /** pandas `df.nunique()`: distinct count per column, ONE agg pass
    * (each count_distinct partial-aggregates; at scale prefer
    * Sketches.approxDistinct for a fixed-size HLL buffer instead of the
    * exact distinct-expansion). */
  def nunique(): PsDataFrame = aggAll("nunique")

  /** pandas `drop_duplicates(subset=…, keep='first'|'last')` under an
    * explicit order column set — the reference supports only full-row
    * first-keep (SURVEY §2.5); this is the keyed form, delegating to
    * [[graft.operators.Dedup.exact]] (map-side WindowGroupLimit keep-1).
    * `keep="last"` flips the order direction. */
  def dropDuplicatesBy(subset: Seq[String], orderCols: Seq[String],
      keep: String = "first"): PsDataFrame = {
    require(keep == "first" || keep == "last",
      s"dropDuplicatesBy: keep must be first|last, got $keep")
    val ord = orderCols.map(c =>
      if (keep == "last") _df(c).desc else _df(c).asc)
    new PsDataFrame(graft.operators.Dedup.exact(_df, subset, ord))
  }

  def sum(): PsDataFrame   = aggAll("sum")
  def mean(): PsDataFrame  = aggAll("mean")
  def count(): PsDataFrame = aggAll("count")
  def min(): PsDataFrame   = aggAll("min")
  def max(): PsDataFrame   = aggAll("max")
  def prod(): PsDataFrame  = aggAll("prod")
  def any(): PsDataFrame   = aggAll("any")
  def all(): PsDataFrame   = aggAll("all")

  /** `df.agg([f1, f2])` ungrouped — one row per function, labeled by an
    * `agg` column (the reference's MultiAggregator UNION ALL shape,
    * core.py:1191-1227, flattened relationally).
    *
    * ONE scan: all fn×col aggregates are computed in a single
    * HashAggregate pass (the reference UNION-ALLs one query per fn, which
    * on 100 TB would be an N× scan-cost bug; here only the 1-row result is
    * unpivoted, driver-side-free, via `stack`). Aggregates are cast to
    * double so every unpivoted row shares one schema (count→long,
    * sum→widened input type otherwise).
    */
  def aggRows(fns: Seq[String]): PsDataFrame = {
    val cols = PsGroupedFrame.numericColumns(_df)
    require(fns.nonEmpty, "aggRows needs at least one aggregate function")
    require(cols.nonEmpty, "aggRows needs at least one numeric column")
    val aggs = for { fn <- fns; c <- cols }
      yield PsGroupedFrame.fnCol(fn, _df(c)).cast("double").as(s"${c}__$fn")
    val one = _df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = fns
      .map(fn => s"'$fn', " + cols.map(c => s"`${c}__$fn`").mkString(", "))
      .mkString(", ")
    val outNames = cols.map(c => s"`$c`").mkString(", ")
    new PsDataFrame(
      one.selectExpr(s"stack(${fns.size}, $stackArgs) AS (agg, $outNames)"))
  }

  /** pandas `describe()` — the eight summary stats as one row each over
    * every numeric column, in ONE aggregation pass ([[aggRows]] computes
    * all stats in a single agg then unpivots with `stack`). Quantile rows
    * are labeled p25/median/p75 (not pandas' `25%` strings, which are
    * awkward as values to filter on). */
  def describe(): PsDataFrame =
    aggRows(Seq("count", "mean", "std", "min", "p25", "median", "p75", "max"))

  /** pandas `explode(column)`: one output row per array element, the
    * column keeps its name and position. `explode_outer`, so a null or
    * empty array keeps its row with a null element (pandas emits NaN),
    * rather than silently dropping it. */
  def explodeCol(c: String): PsDataFrame = {
    val cols = _df.columns.map(x =>
      if (x == c) explode_outer(_df(x)).as(c) else _df(x))
    new PsDataFrame(_df.select(cols.toIndexedSeq: _*))
  }

  /** pandas `duplicated(subset, keep='first')` as a flag column: true for
    * every row after the first of its key group under `orderBy` (pandas
    * uses input order, which a distributed table does not have — the
    * order is explicit here). One window pass, hash-partitioned on the
    * subset keys. */
  def duplicated(subset: Seq[String], orderBy: Seq[String],
      as: String = "duplicated"): PsDataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(subset.nonEmpty, "duplicated needs subset keys")
    val w = Window.partitionBy(subset.map(_df(_)): _*).orderBy(orderBy.map(_df(_)): _*)
    new PsDataFrame(_df.withColumn(as, row_number().over(w) > 1))
  }
}

object PsDataFrame {
  def apply(df: DataFrame): PsDataFrame = new PsDataFrame(df)

  /** Parse a pandas-style offset alias to nanoseconds: "250ms", "30s",
    * "5min", "2h", "1d" (optional space before the unit). Bare "m" is
    * rejected on purpose — pandas deprecated it for exactly the
    * minutes-vs-months ambiguity; write "min". */
  private[graft] def durationNs(s: String): Long = {
    val m = "^\\s*(\\d+)\\s*(ms|s|min|h|d)\\s*$".r.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(
        s"unparseable duration '$s' (expected <int><ms|s|min|h|d>)"))
    val n = m.group(1).toLong
    val perUnit = m.group(2) match {
      case "ms"  => 1000000L
      case "s"   => 1000000000L
      case "min" => 60L * 1000000000L
      case "h"   => 3600L * 1000000000L
      case "d"   => 86400L * 1000000000L
    }
    // an unrepresentable duration (e.g. "106752d"+ in ns) must throw like
    // an unparseable one — a silent Long wrap turns the RANGE frame's
    // lower bound into a future offset and the windows go quietly wrong
    try Math.multiplyExact(n, perUnit)
    catch { case _: ArithmeticException =>
      throw new IllegalArgumentException(
        s"duration '$s' overflows the ns-since-epoch axis (max ~106751d)")
    }
  }

  /** `DataFrame(local data)` — the reference's in-memory constructor
    * (core.py:497-531: dict / list-of-rows / existing frame). Local data
    * is parallelized across the cluster by `createDataFrame`; intended for
    * small dimension/test data, not bulk ingest (use PsIO for files). */
  def fromLocal[T <: Product: scala.reflect.runtime.universe.TypeTag](
      spark: org.apache.spark.sql.SparkSession,
      data: Seq[T]): PsDataFrame =
    new PsDataFrame(spark.createDataFrame(data))

  /** Row-based constructor with an explicit schema (dynamic-schema path of
    * reference core.py:497-531). */
  def fromRows(
      spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      rows: Seq[org.apache.spark.sql.Row]): PsDataFrame = {
    import scala.jdk.CollectionConverters._
    new PsDataFrame(spark.createDataFrame(rows.asJava, schema))
  }
}
