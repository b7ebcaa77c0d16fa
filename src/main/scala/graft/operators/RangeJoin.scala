package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DataFrame-level bucketized point-in-interval join.
  *
  * Same rewrite as [[graft.plans.RangeJoinRule]] applies to SQL joins,
  * exposed directly for DataFrame users (no session conf needed, bin
  * width is an explicit argument). See the rule's scaladoc for the cost
  * model; in short: a no-equi-key range join is a nested-loop scan at
  * scale, this turns it into a shuffle-by-bin equi-join with the exact
  * range kept as a residual filter. A point falls in exactly one bin, so
  * the output has no duplicate pairs to clean up.
  *
  * @param extraKeys additional equi-join keys (same name both sides) —
  *        compound keys like (user, time-in-window) join on
  *        (key, bin) and stay skew-resistant
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binSize: Double,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    // the temp bin column must not clobber a real one (same guard class
    // as headPerGroup's __rn, round-5 advice)
    (points.columns ++ intervals.columns).find(_ == "__graft_bin").foreach(_ =>
      sys.error("pointInInterval: inputs must not already have a __graft_bin column"))
    def bin(c: Column): Column = floor(c.cast("double") / lit(binSize))

    val p = points.withColumn("__graft_bin", bin(col(pointCol)))
    // guard degenerate intervals (lo > hi): sequence(start, stop) THROWS
    // on reversed bounds, but the join semantics are simply "no match";
    // explode(null) contributes zero rows, same as null lo/hi
    val bins = when(col(loCol) <= col(hiCol),
      sequence(bin(col(loCol)), bin(col(hiCol)), lit(1L)))
    val i = intervals.withColumn("__graft_bin", explode(bins))
    val cond = (Seq("__graft_bin") ++ extraKeys)
      .map(k => p(k) === i(k))
      .reduce(_ && _) &&
      p(pointCol) >= i(loCol) && p(pointCol) <= i(hiCol)
    // drop the bin and the duplicated extra keys from the interval side
    val out = p.join(i, cond, "inner")
    val dupCols = i("__graft_bin") +: extraKeys.map(i(_))
    dupCols.foldLeft(out)(_ drop _).drop("__graft_bin")
  }
}
