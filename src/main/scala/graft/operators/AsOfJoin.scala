package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.plans.{AsOfJoinPlan, GraftStrategy}

/** As-of (backward) join — an operator Spark's join zoo lacks.
  *
  * For every left row, attach the LATEST right row whose time is ≤ the
  * left row's time, within the same key group (market-data "last tick",
  * attribution "most recent purchase before this click", ...).
  *
  * Implementation is the scalable union-and-fill form, not a per-key
  * loop and not a range join: tag both inputs, union by name, and take
  * `last(struct(values), ignoreNulls)` over a window ordered by
  * (time, side) with right rows sorting before left rows at equal times
  * (backward-inclusive semantics). The fill carries ONE struct per right
  * row, so the attached values always come from the same matched right
  * row — legitimate nulls inside a matched row stay null instead of
  * leaking an older row's value (pandas merge_asof / SQL ASOF JOIN
  * semantics). Cost: ONE shuffle on the keys + one sort — the same price
  * as a regular sort-merge join, for any left/right size ratio. A right
  * side with several rows at the same (key, time) is ambiguous; pre-dedup
  * it (e.g. [[Dedup.exact]]) for deterministic output.
  */
object AsOfJoin {

  /** Monotone integral order key. Timestamps keep microsecond precision
    * (`cast("long")` would truncate to whole seconds, letting a right row
    * later in the same second compare equal and — since __side sorts right
    * first — be attached to an EARLIER left row, violating
    * backward-inclusive semantics; same discipline as
    * [[graft.streaming.StreamingOps.sessionizeBatch]]'s unix_millis). */
  private def orderKey(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case _             => col(c).cast("long")
    }

  private def checkArgs(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String], how: String): Unit = {
    require(keys.nonEmpty, "asof needs at least one key column")
    require(valueCols.nonEmpty, "asof needs right value columns to attach")
    require(how == "left" || how == "inner", s"how must be left|inner, got $how")
    // time comparison resolves per side; mixed time types (e.g. timestamp
    // vs epoch-millis bigint, or date vs timestamp) would silently compare
    // micros against raw longs / day counts and mis-match — fail fast
    val (lt, rt) = (left.schema(leftTime).dataType, right.schema(rightTime).dataType)
    require(lt == rt,
      s"asof time columns must have the same type: $leftTime is $lt, $rightTime is $rt")
    keys.foreach { k =>
      val (lk, rk) = (left.schema(k).dataType, right.schema(k).dataType)
      require(lk == rk, s"asof key $k must have the same type on both sides: $lk vs $rk")
    }
  }

  /** Backward as-of join — dispatches to the native Catalyst operator
    * ([[graft.plans.AsOfJoinExec]]); `asofWindowed` is the composed
    * fallback, kept as the differential-testing witness.
    *
    * @param valueCols right columns to attach (as `<rightPrefix><col>`)
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
    checkArgs(left, right, keys, leftTime, rightTime, valueCols, how)
    val spark = left.sparkSession
    // deployment convenience: sessions built without
    // spark.sql.extensions=graft.plans.GraftExtensions still plan the node
    GraftPlanBridge.ensureStrategy(spark, GraftStrategy)

    // Prune the right side to what the operator reads (column pruning does
    // not descend into foreign nodes) and re-alias every column: fresh
    // exprIds keep a self-asof (left and right derived from the same
    // DataFrame) unambiguous without DeduplicateRelations' help.
    val rCols = (keys :+ rightTime).distinct ++ valueCols.filterNot(v =>
      v == rightTime || keys.contains(v))
    val rPruned = right.select(rCols.map(c => col(c).as(c)): _*)

    val lPlan = GraftPlanBridge.analyzed(left)
    val rPlan = GraftPlanBridge.analyzed(rPruned)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      plan.output.find(_.name == n).getOrElse(
        sys.error(s"asof: column $n not found in ${plan.output.map(_.name)}"))
    val rightValues = valueCols.map(attr(rPlan, _))
    val outputValues = rightValues.map(a =>
      AttributeReference(s"$rightPrefix${a.name}", a.dataType, nullable = true)())
    GraftPlanBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      rightValues, outputValues, isInner = how == "inner"))
  }

  /** pandas `merge_asof` direction/tolerance surface over the native
    * operator.
    *
    *  - "backward" — latest right time ≤ left time (= [[asof]])
    *  - "forward"  — earliest right time ≥ left time; runs the SAME
    *    native plan on negated order keys (forward-in-t is backward-in-−t),
    *    so it inherits the one-shuffle merge cost
    *  - "nearest"  — closest right time either side, ties → backward
    *    (the deterministic rule this engine pins; pandas leaves ties
    *    unspecified). Two native passes (one per direction) + a
    *    row-local pick — 2× the sort-merge cost, still no range join.
    *
    * `tolerance` (≥ 0, in the time column's comparison units: µs for
    * timestamps, raw value otherwise) nulls out a match farther than the
    * bound — after the join, row-local, so it adds no plan cost. With
    * `how = "inner"` out-of-tolerance rows are dropped like any other
    * non-match. */
  def asofDirectional(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      how: String = "left",
      rightPrefix: String = "r_",
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    val kept = asofDirectionalKeep(left, right, keys, leftTime, rightTime,
      valueCols, how, rightPrefix, direction, tolerance)
    kept.drop("__asof_ok", "__asof_lt", s"${rightPrefix}__asof_rt")
  }

  /** [[asofDirectional]] with the bookkeeping columns (`__asof_ok`,
    * `__asof_lt`, matched right time) still attached — the nearest
    * branch composes its forward pass from this. */
  private def asofDirectionalKeep(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      how: String,
      rightPrefix: String,
      direction: String,
      tolerance: Option[Long]): DataFrame = {
    require(tolerance.forall(_ >= 0), s"tolerance must be >= 0, got $tolerance")

    def onePass(flip: Boolean): DataFrame = {
      // attach the matched right time under a reserved name so the
      // tolerance/nearest arithmetic never collides with user columns
      val r2 = right.withColumn("__asof_rt", orderKey(right, rightTime))
      val l2 = left.withColumn("__asof_lt", orderKey(left, leftTime))
      val (lt, rt) =
        if (!flip) ("__asof_lt", "__asof_rt")
        else {
          // forward = backward on the negated axis
          ("__asof_ltn", "__asof_rtn")
        }
      val lIn = if (flip) l2.withColumn(lt, -col("__asof_lt")) else l2
      val rIn = if (flip) r2.withColumn(rt, -col("__asof_rt")) else r2
      // keep every row through the pass ("left"); inner-ness is decided
      // after tolerance so an out-of-tolerance match drops correctly.
      // __asof_lt stays attached — the tolerance/nearest arithmetic
      // reads it; only the negated temp axis is internal to the pass
      val joined =
        asof(lIn, rIn, keys, lt, rt, valueCols :+ "__asof_rt", "left", rightPrefix)
      if (flip) joined.drop("__asof_ltn") else joined
    }

    def withinTol(matchedRt: Column, lt: Column): Column = tolerance match {
      case None      => matchedRt.isNotNull
      case Some(tol) => matchedRt.isNotNull && abs(lt - matchedRt) <= tol
    }

    val rtCol = s"${rightPrefix}__asof_rt"
    val outCols = valueCols.map(v => s"$rightPrefix$v")

    val picked = direction match {
      case "backward" | "forward" =>
        val j = onePass(flip = direction == "forward")
        val ok = withinTol(col(rtCol), col("__asof_lt"))
        outCols.foldLeft(j)((d, o) => d.withColumn(o, when(ok, col(o))))
          .withColumn("__asof_ok", ok)
      case "nearest" =>
        // backward pass, then forward pass over its (left-shaped) output;
        // rename the backward attachments out of the way first
        val bCols = outCols :+ rtCol
        val b = bCols.foldLeft(onePass(flip = false))(
          (d, o) => d.withColumnRenamed(o, s"__b_$o"))
        val bf = asofDirectionalKeep(b.drop("__asof_lt"), right, keys,
          leftTime, rightTime, valueCols, "left", rightPrefix, "forward",
          tolerance)
        val bOk = withinTol(col(s"__b_$rtCol"), col("__asof_lt"))
        val fOk = col("__asof_ok")
        val bDist = col("__asof_lt") - col(s"__b_$rtCol")
        val fDist = col(rtCol) - col("__asof_lt")
        val useB = bOk && (!fOk || bDist <= fDist) // tie -> backward
        val merged = outCols.foldLeft(bf)((d, o) =>
          d.withColumn(o, when(useB, col(s"__b_$o")).otherwise(col(o))))
        merged.withColumn("__asof_ok", bOk || fOk)
          .drop(bCols.map(o => s"__b_$o"): _*)
      case other =>
        throw new IllegalArgumentException(
          s"direction must be backward|forward|nearest, got $other")
    }

    how match {
      case "left"  => picked
      case "inner" => picked.filter(col("__asof_ok"))
      case other   => throw new IllegalArgumentException(
        s"how must be left|inner, got $other")
    }
  }

  /** The original composed form: tag both inputs, union, window-fill.
    * Same semantics as [[asof]]; one shuffle + window state machine. */
  def asofWindowed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      how: String = "left",
      rightPrefix: String = "r_"): DataFrame = {
    checkArgs(left, right, keys, leftTime, rightTime, valueCols, how)

    val outCols = valueCols.map(v => s"$rightPrefix$v")
    val r2 = right.select(
      keys.map(col) ++ Seq(
        orderKey(right, rightTime).as("__t"), lit(0).as("__side"),
        struct(valueCols.zip(outCols).map { case (v, o) => col(v).as(o) }: _*).as("__rv")): _*)
    val l2 = left
      .withColumn("__t", orderKey(left, leftTime))
      .withColumn("__side", lit(1))

    // unionByName(allowMissingColumns): left payload is null on right rows
    // and vice versa — types come from whichever side defines the column
    val u = l2.unionByName(r2, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one row-atomic fill: the whole matched right row or nothing
    val filled = u.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))

    val leftRows = filled.filter(col("__side") === 1)
    val unpacked = outCols.foldLeft(leftRows)((d, o) =>
      d.withColumn(o, col("__rv").getField(o)))
    val out = unpacked.drop("__t", "__side")
    how match {
      case "left"  => out.drop("__rv")
      case "inner" => out.filter(col("__rv").isNotNull).drop("__rv")
    }
  }
}
