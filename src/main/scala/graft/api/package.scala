package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.lit

/** `import graft.api._` brings in the pandas-flavored surface: implicit
  * lifts for literals (so `lit2 - df("n")` style reflected arithmetic
  * works — the reference's __radd__/__rsub__ family, core.py:418-447)
  * and DataFrame <-> PsDataFrame bridges.
  */
package object api {
  implicit def intToPs(v: Int): PsColumn        = PsColumn(lit(v))
  implicit def longToPs(v: Long): PsColumn      = PsColumn(lit(v))
  implicit def doubleToPs(v: Double): PsColumn  = PsColumn(lit(v))
  implicit def stringToPs(v: String): PsColumn  = PsColumn(lit(v))
  implicit def boolToPs(v: Boolean): PsColumn   = PsColumn(lit(v))
  implicit def columnToPs(c: Column): PsColumn  = PsColumn(c)

  implicit def dfToPs(df: DataFrame): PsDataFrame = PsDataFrame(df)
  implicit def psToDf(ps: PsDataFrame): DataFrame = ps.df
}
