package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator Spark's join zoo lacks.
  *
  * For every left row, attach the LATEST right row whose time is ≤ the
  * left row's time, within the same key group (market-data "last tick",
  * attribution "most recent purchase before this click", ...).
  *
  * Implementation is the scalable union-and-fill form, not a per-key
  * loop and not a range join: tag both inputs, union by name, and take
  * `last(value, ignoreNulls)` over a window ordered by (time, side) with
  * right rows sorting before left rows at equal times (backward-inclusive
  * semantics). Cost: ONE shuffle on the keys + one sort — the same price
  * as a regular sort-merge join, for any left/right size ratio. A right
  * side with several rows at the same (key, time) is ambiguous; pre-dedup
  * it (e.g. [[Dedup.exact]]) for deterministic output.
  */
object AsOfJoin {

  /** @param valueCols right columns to attach (as `<rightPrefix><col>`)
    * @param how "left" keeps unmatched left rows (null values), "inner"
    *            drops them */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      how: String = "left",
      rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asof needs at least one key column")
    require(valueCols.nonEmpty, "asof needs right value columns to attach")
    require(how == "left" || how == "inner", s"how must be left|inner, got $how")

    val r2 = right.select(
      keys.map(col) ++
        Seq(col(rightTime).cast("long").as("__t"), lit(0).as("__side"), lit(true).as("__match")) ++
        valueCols.map(v => col(v).as(s"$rightPrefix$v")): _*)
    val l2 = left
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__side", lit(1))

    // unionByName(allowMissingColumns): left payload is null on right rows
    // and vice versa — types come from whichever side defines the column
    val u = l2.unionByName(r2, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fillCols = valueCols.map(v => s"$rightPrefix$v") :+ "__match"
    val filled = fillCols.foldLeft(u)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))

    val leftRows = filled.filter(col("__side") === 1).drop("__t", "__side")
    how match {
      case "left" => leftRows.drop("__match")
      case "inner" => leftRows.filter(col("__match")).drop("__match")
    }
  }
}
