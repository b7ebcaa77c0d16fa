package graft.api

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}
import graft.functions.{GraftAggregates, PyArith}

/** Pandas-flavored column expression.
  *
  * Covers the reference's `ArithmeticMixin` operator surface (reference:
  * pandasql/core.py:379-476) and its `Criterion` predicate tree
  * (core.py:301-376, 1307-1397) as a thin wrapper over Spark's `Column`:
  * every operator stays a Catalyst expression (codegen'd, pushdown-able).
  * Arithmetic follows Python semantics via [[graft.functions.PyArith]].
  *
  * `owner` is the frame the column was selected from (when known): it
  * enables the reference's per-column aggregate sugar (`df['n'].sum()` →
  * scalar, core.py:219-241) and type-aware `~` dispatch. Columns built
  * from literals or free compositions have no owner; aggregates on them
  * throw a meaningful error.
  *
  * Unlike the reference's `Criterion` (which rejects predicates spanning
  * two sources, core.py:318-330), a PsColumn can mix columns from any
  * frames that Catalyst can resolve — a strict superset.
  */
final case class PsColumn(col: Column, owner: Option[DataFrame] = None,
    /** for sort-ordered columns (`asc`/`desc`): the underlying value
      * column, usable in ordinary expressions — a SortOrder itself cannot
      * appear inside e.g. an `isNotNull` (rankIn pct needs this). */
    sortBase: Option[Column] = None) {
  private def o(x: Any): Column = x match {
    case p: PsColumn => p.col
    case c: Column   => c
    case v           => lit(v)
  }
  /** binary ops keep the left operand's owner so chained sugar works */
  private def derive(c: Column): PsColumn = PsColumn(c, owner)

  // arithmetic (reference core.py:1471-1538)
  def +(x: Any): PsColumn  = derive(col + o(x))
  def -(x: Any): PsColumn  = derive(col - o(x))
  def *(x: Any): PsColumn  = derive(col * o(x))
  def /(x: Any): PsColumn  = derive(PyArith.pyDiv(col, o(x)))
  def %(x: Any): PsColumn  = derive(PyArith.pyMod(col, o(x)))
  def **(x: Any): PsColumn = derive(PyArith.pyPow(col, o(x)))
  /** Python `//` (integral). */
  def floorDiv(x: Any): PsColumn = derive(PyArith.pyFloorDiv(col, o(x)))
  def unary_- : PsColumn = derive(negate(col))
  def abs: PsColumn = derive(org.apache.spark.sql.functions.abs(col))

  // bitwise on non-boolean, boolean combinators on predicates
  // (reference overloads & | ^ ~ for both, core.py:354-361, 1513-1533)
  def bitAnd(x: Any): PsColumn = derive(PyArith.bitAnd(col, o(x)))
  def bitOr(x: Any): PsColumn  = derive(PyArith.bitOr(col, o(x)))
  def bitXor(x: Any): PsColumn = derive(PyArith.bitXor(col, o(x)))

  /** `~` — the reference overloads __invert__ as logical NOT on predicates
    * (core.py:360) and bitwise inversion on numerics (core.py:440). We
    * dispatch on the analyzed type: the expression's own type when it is
    * already resolved (covers free/literal compositions and predicates
    * spanning frames), else the owning frame's analysis, else fall back to
    * bitwise (matching the numeric-arithmetic context `~` is documented
    * for). */
  def unary_~ : PsColumn = {
    val isBool = dataTypeIfKnown.contains(BooleanType)
    derive(if (isBool) !col else PyArith.inv(col))
  }

  private def dataTypeIfKnown: Option[DataType] =
    Try(org.apache.spark.sql.GraftColumnBridge.expression(col).dataType).toOption
      .orElse(owner.flatMap(df => Try(df.select(col).schema.head.dataType).toOption))

  // comparisons (reference core.py:449-469, 1307-1341)
  def ===(x: Any): PsColumn = derive(col === o(x))
  def =!=(x: Any): PsColumn = derive(col =!= o(x))
  def <(x: Any): PsColumn   = derive(col < o(x))
  def <=(x: Any): PsColumn  = derive(col <= o(x))
  def >(x: Any): PsColumn   = derive(col > o(x))
  def >=(x: Any): PsColumn  = derive(col >= o(x))

  // boolean combinators (reference And/Or/Not core.py:1343-1361)
  def &&(x: Any): PsColumn = derive(col && o(x))
  def ||(x: Any): PsColumn = derive(col || o(x))
  def unary_! : PsColumn = derive(!col)

  // predicates (reference IsIn/Contains/StartsWith/EndsWith
  // core.py:1364-1397; plain substring — regex rejected, core.py:486-487)
  def isin(values: Any*): PsColumn = derive(col.isin(values: _*))
  def contains(s: String): PsColumn   = derive(col.contains(s))
  def startsWith(s: String): PsColumn = derive(col.startsWith(s))
  def endsWith(s: String): PsColumn   = derive(col.endsWith(s))
  // pandas isna/notna (designed extension — the reference has no null
  // surface; pairs with PsDataFrame.fillna/dropna)
  def isna: PsColumn  = derive(col.isNull)
  def notna: PsColumn = derive(col.isNotNull)

  // pandas clip / between (designed extension): exact comparisons, no
  // float rounding — both stay oracle-hashable. clip preserves nulls
  // (pandas keeps NaN/NA); bare greatest/least would skip the null and
  // return the bound instead.
  def clip(lower: Any, upper: Any): PsColumn = {
    import org.apache.spark.sql.functions.{when, lit, least, greatest}
    derive(when(col.isNull, lit(null)).otherwise(
      least(greatest(col, o(lower)), o(upper))))
  }
  def between(lower: Any, upper: Any): PsColumn =
    derive(col.between(o(lower), o(upper)))

  /** pandas `Series.where(cond, other)`: keep the value where `cond`
    * holds, else `other` (default null, like pandas NaN). `mask` is the
    * complement. Plain when/otherwise — stays codegen'd. */
  def whereCond(cond: PsColumn, other: Any = null): PsColumn =
    derive(when(cond.col, col).otherwise(o(other)))
  def mask(cond: PsColumn, other: Any = null): PsColumn =
    derive(when(cond.col, o(other)).otherwise(col))

  def as(name: String): PsColumn = derive(col.as(name))
  def cast(to: String): PsColumn = derive(col.cast(to))
  def asc: PsColumn = PsColumn(col.asc, owner, sortBase = Some(col))
  def desc: PsColumn = PsColumn(col.desc, owner, sortBase = Some(col))

  /** pandas `.str` accessor (designed extension — the reference has no
    * string functions beyond its three predicates, SURVEY §2.3). All are
    * built-in codegen'd Spark functions; `replace` is LITERAL (pandas ≥2
    * `str.replace` default regex=False), `slice` is 0-based half-open
    * like Python slicing, `splitPart` is 1-based like SQL split_part. */
  object str {
    def upper: PsColumn  = derive(org.apache.spark.sql.functions.upper(col))
    def lower: PsColumn  = derive(org.apache.spark.sql.functions.lower(col))
    def strip: PsColumn  = derive(trim(col))
    def lstrip: PsColumn = derive(ltrim(col))
    def rstrip: PsColumn = derive(rtrim(col))
    def len: PsColumn    = derive(length(col))
    def replace(from: String, to: String): PsColumn =
      derive(org.apache.spark.sql.functions.replace(col, lit(from), lit(to)))
    def slice(start: Int, stop: Int): PsColumn = {
      require(start >= 0 && stop >= start, "slice(start, stop): 0-based, stop >= start")
      derive(substring(col, start + 1, stop - start))
    }
    def padLeft(width: Int, pad: String = " "): PsColumn  = derive(lpad(col, width, pad))
    def padRight(width: Int, pad: String = " "): PsColumn = derive(rpad(col, width, pad))
    /** n-th whitespace/sep-delimited field, 1-based; null when absent
      * (`get`, not `element_at` — the latter errors out of range under
      * ANSI mode). `sep` is a literal, regex-escaped before `split`. */
    def splitPart(sep: String, n: Int): PsColumn = {
      require(n >= 1, "splitPart is 1-based")
      derive(get(split(col, java.util.regex.Pattern.quote(sep)), lit(n - 1)))
    }
    def cat(x: Any, sep: String = ""): PsColumn =
      derive(concat_ws(sep, col, o(x)))

    // regex family (pandas .str.extract/.count/.match / fullmatch).
    // NOTE the reference explicitly rejects regex (core.py:486-487); this
    // is a designed extension — pipelines live on regex extraction.
    /** `.str.extract(pat, group)`: first match's capture group, null when
      * no match (Spark returns "" for no-match; mapped to null to match
      * pandas NaN). */
    def extract(pattern: String, group: Int = 1): PsColumn = {
      val raw = regexp_extract(col, pattern, group)
      derive(when(raw === lit(""), lit(null)).otherwise(raw))
    }
    /** `.str.count(pat)`: number of non-overlapping matches. */
    def countMatches(pattern: String): PsColumn =
      derive(regexp_count(col, lit(pattern)))
    /** `.str.match(pat)`: does the string START with a match (pandas
      * match anchors at the beginning only). */
    def matches(pattern: String): PsColumn =
      derive(regexp_like(col, lit("^(?:" + pattern + ")")))
    /** `.str.fullmatch(pat)`: whole-string match. */
    def fullmatch(pattern: String): PsColumn =
      derive(regexp_like(col, lit("^(?:" + pattern + ")$")))
  }

  /** pandas `.dt` accessor (designed extension). `dayofweek` follows
    * pandas (Monday=0 .. Sunday=6), not Spark's `dayofweek` (Sunday=1). */
  object dt {
    def year: PsColumn    = derive(org.apache.spark.sql.functions.year(col))
    def month: PsColumn   = derive(org.apache.spark.sql.functions.month(col))
    def day: PsColumn     = derive(dayofmonth(col))
    def quarter: PsColumn = derive(org.apache.spark.sql.functions.quarter(col))
    def hour: PsColumn    = derive(org.apache.spark.sql.functions.hour(col))
    def minute: PsColumn  = derive(org.apache.spark.sql.functions.minute(col))
    def dayofweek: PsColumn =
      derive((org.apache.spark.sql.functions.dayofweek(col) + lit(5)) % lit(7))
    def date: PsColumn = derive(to_date(col))
    /** floor to unit ('year'|'quarter'|'month'|'week'|'day'|'hour'|...). */
    def trunc(unit: String): PsColumn = derive(date_trunc(unit, col))
    /** whole days from `earlier` to this (pandas `(a - b).dt.days`). */
    def diffDays(earlier: Any): PsColumn = derive(datediff(col, o(earlier)))
  }

  // ---- per-column aggregate sugar (reference core.py:219-241:
  //      `df['n'].sum()` on a projection yields a scalar) ----

  private def scalarAgg(fn: String): Any = {
    val df = owner.getOrElse(throw new IllegalArgumentException(
      s"$fn(): column has no owning frame; aggregate via df.select(...).$fn()"))
    df.agg(PsGroupedFrame.fnCol(fn, col)).head().get(0)
  }

  /** Scalar aggregates — one distributed agg job, single-value collect. */
  def sum(): Any   = scalarAgg("sum")
  def mean(): Any  = scalarAgg("mean")
  def min(): Any   = scalarAgg("min")
  def max(): Any   = scalarAgg("max")
  def countValues(): Long = scalarAgg("count").asInstanceOf[Long]
  def prod(): Any  = scalarAgg("prod")
  def anyValue(): Boolean = scalarAgg("any").asInstanceOf[Boolean]
  def allValues(): Boolean = scalarAgg("all").asInstanceOf[Boolean]
}
