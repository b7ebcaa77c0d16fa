package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.PyArith

/** Pandas-flavored column expression.
  *
  * Covers the reference's `ArithmeticMixin` operator surface (reference:
  * pandasql/core.py:379-476) and its `Criterion` predicate tree
  * (core.py:301-376, 1307-1397) as a thin wrapper over Spark's `Column`:
  * every operator stays a Catalyst expression (codegen'd, pushdown-able).
  * Arithmetic follows Python semantics via [[graft.functions.PyArith]].
  *
  * Unlike the reference's `Criterion` (which rejects predicates spanning
  * two sources, core.py:318-330), a PsColumn can mix columns from any
  * frames that Catalyst can resolve — a strict superset.
  */
final case class PsColumn(col: Column) {
  private def o(x: Any): Column = x match {
    case p: PsColumn => p.col
    case c: Column   => c
    case v           => lit(v)
  }

  // arithmetic (reference core.py:1471-1538)
  def +(x: Any): PsColumn  = PsColumn(col + o(x))
  def -(x: Any): PsColumn  = PsColumn(col - o(x))
  def *(x: Any): PsColumn  = PsColumn(col * o(x))
  def /(x: Any): PsColumn  = PsColumn(PyArith.pyDiv(col, o(x)))
  def %(x: Any): PsColumn  = PsColumn(PyArith.pyMod(col, o(x)))
  def **(x: Any): PsColumn = PsColumn(PyArith.pyPow(col, o(x)))
  /** Python `//` (integral). */
  def floorDiv(x: Any): PsColumn = PsColumn(PyArith.pyFloorDiv(col, o(x)))
  def unary_- : PsColumn = PsColumn(negate(col))
  def abs: PsColumn = PsColumn(org.apache.spark.sql.functions.abs(col))

  // bitwise on non-boolean, boolean combinators on predicates
  // (reference overloads & | ^ ~ for both, core.py:354-361, 1513-1533)
  def bitAnd(x: Any): PsColumn = PsColumn(PyArith.bitAnd(col, o(x)))
  def bitOr(x: Any): PsColumn  = PsColumn(PyArith.bitOr(col, o(x)))
  def bitXor(x: Any): PsColumn = PsColumn(PyArith.bitXor(col, o(x)))
  def unary_~ : PsColumn = PsColumn(PyArith.inv(col))

  // comparisons (reference core.py:449-469, 1307-1341)
  def ===(x: Any): PsColumn = PsColumn(col === o(x))
  def =!=(x: Any): PsColumn = PsColumn(col =!= o(x))
  def <(x: Any): PsColumn   = PsColumn(col < o(x))
  def <=(x: Any): PsColumn  = PsColumn(col <= o(x))
  def >(x: Any): PsColumn   = PsColumn(col > o(x))
  def >=(x: Any): PsColumn  = PsColumn(col >= o(x))

  // boolean combinators (reference And/Or/Not core.py:1343-1361)
  def &&(x: Any): PsColumn = PsColumn(col && o(x))
  def ||(x: Any): PsColumn = PsColumn(col || o(x))
  def unary_! : PsColumn = PsColumn(!col)

  // predicates (reference IsIn/Contains/StartsWith/EndsWith
  // core.py:1364-1397; plain substring — regex rejected, core.py:486-487)
  def isin(values: Any*): PsColumn = PsColumn(col.isin(values: _*))
  def contains(s: String): PsColumn   = PsColumn(col.contains(s))
  def startsWith(s: String): PsColumn = PsColumn(col.startsWith(s))
  def endsWith(s: String): PsColumn   = PsColumn(col.endsWith(s))

  def as(name: String): PsColumn = PsColumn(col.as(name))
  def cast(to: String): PsColumn = PsColumn(col.cast(to))
}
