package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Python arithmetic semantics composed from codegen'd Spark built-ins.
  *
  * The reference enforces Python semantics on SQLite via per-connection
  * scalar UDFs (reference: pandasql/sql_utils.py:9-48 — MOD, FLOORDIV, DIV,
  * POW, BITAND/OR/XOR, INV). On Spark no UDF is needed: every operator is a
  * composition of built-in expressions, so the whole surface stays inside
  * whole-stage codegen.
  *
  * Semantics implemented:
  *  - `/`  true division — int/int yields double (Python 3 `/`).
  *  - `%`  sign of the result follows the DIVISOR (Python), not the
  *         dividend (C / Spark `%`): `((a % b) + b) % b`.
  *  - `//` floor division (rounds toward -inf, not toward zero).
  *  - `**` power (double).
  *  - `& | ^ ~` bitwise on integers.
  */
object PyArith {

  /** Python 3 true division: always fractional. */
  def pyDiv(a: Column, b: Column): Column =
    a.cast("double") / b.cast("double")

  /** Python `%`: result sign follows the divisor. Exact on integers. */
  def pyMod(a: Column, b: Column): Column =
    ((a % b) + b) % b

  /** Python `//` on integral columns: floor of the true quotient, as long.
    * Exact for |a|,|b| < 2^53 (the double mantissa); beyond that prefer a
    * decimal cast upstream.
    */
  def pyFloorDiv(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("long")

  /** Python `//` on fractional columns: floor, kept fractional. */
  def pyFloorDivDouble(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("double")

  /** Python `**`. */
  def pyPow(a: Column, b: Column): Column = pow(a, b)

  def bitAnd(a: Column, b: Column): Column = a.bitwiseAND(b)
  def bitOr(a: Column, b: Column): Column = a.bitwiseOR(b)
  def bitXor(a: Column, b: Column): Column = a.bitwiseXOR(b)
  def inv(a: Column): Column = bitwise_not(a)
}
