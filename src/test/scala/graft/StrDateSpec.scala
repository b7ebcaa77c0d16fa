package graft

import java.sql.{Date, Timestamp}

import org.scalatest.funsuite.AnyFunSuite

import graft.api._

/** The pandas `.str` / `.dt` accessors, set ops, cross join, rolling mean
  * and the std/var/median/quantile aggregate extensions (all oracle-backed
  * at the driver level by q_strops / q_datetime / q_intersect / q_except /
  * q_cross / q_rolling / q_std / q_quantile — these specs pin the local
  * semantics the oracles can't see, e.g. the dayofweek remap and
  * min_periods nulls). */
class StrDateSpec extends AnyFunSuite with SparkFixture {

  test("str accessor: slice is 0-based half-open, splitPart 1-based null-safe") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(("  Hello World  ", "a b c")).toDF("t", "w"))
    d.set("sl", d("t").str.strip.str.slice(0, 5))
    d.set("p2", d("w").str.splitPart(" ", 2))
    d.set("p9", d("w").str.splitPart(" ", 9)) // out of range -> null
    d.set("rep", d("w").str.replace("b", "B"))
    val r = d.select("sl", "p2", "p9", "rep").df.head()
    assert(r.getString(0) == "Hello")
    assert(r.getString(1) == "b")
    assert(r.isNullAt(2))
    assert(r.getString(3) == "a B c")
  }

  test("dt accessor: dayofweek is pandas Monday=0") {
    val s = spark
    import s.implicits._
    // 1995-01-02 was a Monday; 1995-01-01 a Sunday
    val d = PsDataFrame(Seq(
      Timestamp.valueOf("1995-01-02 10:30:00"),
      Timestamp.valueOf("1995-01-01 23:59:00")).toDF("ts"))
    d.set("dow", d("ts").dt.dayofweek)
    d.set("yr", d("ts").dt.year)
    val rows = d.select("dow", "yr").df.collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 6))
    assert(rows.forall(_.getInt(1) == 1995))
  }

  test("intersect/except are distinct set ops; crossJoin is a full product") {
    val s = spark
    import s.implicits._
    val a = PsDataFrame(Seq(1, 1, 2, 3).toDF("k"))
    val b = PsDataFrame(Seq(2, 2, 4).toDF("k"))
    assert(a.intersect(b).df.collect().map(_.getInt(0)).toSet == Set(2))
    assert(a.exceptRows(b).df.collect().map(_.getInt(0)).toSet == Set(1, 3))
    val x = PsDataFrame(Seq("p", "q").toDF("l"))
    assert(a.crossJoin(x).df.count() == 8)
  }

  test("rollingMean: null below min_periods, exact ratio after") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(("g", 1, 2.0), ("g", 2, 4.0), ("g", 3, 6.0), ("g", 4, 8.0))
      .toDF("grp", "i", "v"))
    val r = d.rollingMean("v", 3, Seq("grp"), Seq("i"), "ma")
      .sortValues(Seq("i")).df.collect()
    assert(r(0).isNullAt(3) && r(1).isNullAt(3))
    assert(r(2).getDouble(3) == 4.0 && r(3).getDouble(3) == 6.0)
  }

  test("rollingTimeAgg: RANGE frame == brute per-row scan; frame edges inclusive") {
    val s = spark
    import s.implicits._
    // irregular timestamps (seconds scale, stored as ns), two groups;
    // includes an exact-boundary pair (t=100s and t=160s with a 60s
    // window: 100 is inside [100, 160] — closed='both')
    val rows = Seq(
      ("a", 10L, 1.0), ("a", 100L, 2.0), ("a", 130L, 3.0), ("a", 160L, 4.0),
      ("a", 161L, 5.0), ("b", 50L, 10.0), ("b", 290L, 20.0))
      .map { case (g, sec, v) => (g, sec * 1000000000L, v) }
    val d = PsDataFrame(rows.toDF("grp", "ts", "v"))
    val winNs = 60L * 1000000000L
    val got = d.rollingTimeAgg("v", "sum", "1min", "ts", Seq("grp"), "rs")
      .rollingTimeAgg("v", "count", "1min", "ts", Seq("grp"), "rn")
      .rollingTimeAgg("v", "mean", "1min", "ts", Seq("grp"), "rm")
      .df.collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    // brute reference: every row in the same group with t in [t0-60s, t0]
    rows.foreach { case (g, t0, _) =>
      val in = rows.filter { case (g2, t, _) => g2 == g && t >= t0 - winNs && t <= t0 }
      val (sum, n) = (in.map(_._3).sum, in.size.toLong)
      val (gs, gn, gm) = got((g, t0))
      assert(gs == sum && gn == n && gm == sum / n,
        s"($g, ${t0 / 1000000000L}s): got ($gs,$gn,$gm), want ($sum,$n,${sum / n})")
    }
    // every row emits (min_periods=1, pandas time-rolling default)
    assert(got.size == rows.size)
    // var/std (sample, ddof=1): brute per-row reference; n=1 -> null
    val gv = d.rollingTimeAgg("v", "var", "1min", "ts", Seq("grp"), "rv")
      .rollingTimeAgg("v", "std", "1min", "ts", Seq("grp"), "rs")
      .df.collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    rows.foreach { case (g, t0, _) =>
      val in = rows.filter { case (g2, t, _) => g2 == g && t >= t0 - winNs && t <= t0 }
        .map(_._3)
      val expectVar =
        if (in.size < 2) None
        else {
          val m = in.sum / in.size
          Some(in.map(x => (x - m) * (x - m)).sum / (in.size - 1))
        }
      val (vv, vs) = gv((g, t0))
      (vv, expectVar) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) < 1e-9, s"($g,$t0): var $a vs $b")
          assert(math.abs(vs.get - math.sqrt(b)) < 1e-9)
        case (None, None) => ()
        case other => fail(s"($g,$t0): var null mismatch $other")
      }
    }
    // row-count rolling face shares the dispatch: rolling(2).std over a
    // known sequence (pandas: null, then std of each adjacent pair)
    val seqd = PsDataFrame(Seq(("g", 1, 2.0), ("g", 2, 4.0), ("g", 3, 8.0))
      .toDF("grp", "i", "v"))
    val rr = seqd.rollingAgg("v", "std", 2, Seq("grp"), Seq("i"), "sd")
      .sortValues(Seq("i")).df.collect()
    assert(rr(0).isNullAt(3))
    assert(math.abs(rr(1).getDouble(3) - math.sqrt(2.0)) < 1e-12) // std(2,4)
    assert(math.abs(rr(2).getDouble(3) - math.sqrt(8.0)) < 1e-12) // std(4,8)
    // plan shape: the multi-agg form runs every metric in ONE WindowExec
    // pass — one shuffle + one per-partition sort regardless of how many
    // aggregates ride the frame
    val chained = d.rollingTimeAggs(Seq(
      ("v", "sum", "a"), ("v", "count", "b"), ("v", "var", "c")),
      "1min", "ts", Seq("grp")).df
    val winNodes = graft.plans.PlanLint.physicalPlan(chained).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(winNodes.size == 1,
      s"same-spec rolling chain planned ${winNodes.size} WindowExec nodes")
    // duration parsing: aliases map to exact ns; bare "m" is rejected
    assert(PsDataFrame.durationNs("250ms") == 250000000L)
    assert(PsDataFrame.durationNs("30s") == 30000000000L)
    assert(PsDataFrame.durationNs("5min") == 300000000000L)
    assert(PsDataFrame.durationNs("2h") == 7200000000000L)
    assert(PsDataFrame.durationNs("1d") == 86400000000000L)
    intercept[IllegalArgumentException](PsDataFrame.durationNs("5m"))
    // overflow throws like unparseable input does — a silent Long wrap
    // would flip the RANGE lower bound to a future offset (advisor r13)
    assert(PsDataFrame.durationNs("106751d") > 0) // largest representable day count
    intercept[IllegalArgumentException](PsDataFrame.durationNs("106752d"))
    intercept[IllegalArgumentException](PsDataFrame.durationNs("9999999999999999d"))
    // output-name clash guard: duplicate spec names and names shadowing
    // input columns fail loudly instead of minting ambiguous duplicates
    intercept[IllegalArgumentException] {
      d.rollingTimeAggs(Seq(("v", "sum", "a"), ("v", "count", "a")),
        "1min", "ts", Seq("grp"))
    }
    intercept[IllegalArgumentException] {
      d.rollingTimeAggs(Seq(("v", "sum", "v")), "1min", "ts", Seq("grp"))
    }
    // a non-numeric time axis fails loudly, pointing at readEventsNs
    val tsd = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("grp", "ts", "v")
    intercept[IllegalArgumentException] {
      PsDataFrame(tsd).rollingTimeAgg("v", "sum", "1min", "ts", Seq("grp"), "rs")
    }
  }

  test("explodeCol keeps empty/null arrays as null-element rows (pandas NaN)") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      (1, Seq("a", "b")), (2, Seq.empty[String]), (3, null))
      .toDF("k", "xs"))
    val r = d.explodeCol("xs").df.collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(r == Set((1, "a"), (1, "b"), (2, null), (3, null)))
  }

  test("whereCond/mask: null default, complement semantics") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(1, 30).toDF("v"))
    d.set("kept", d("v").whereCond(d("v") <= 25))
    d.set("capped", d("v").mask(d("v") > 25, 25))
    val rows = d.df.orderBy("v").collect()
    assert(rows(0).getInt(1) == 1 && rows(0).getInt(2) == 1)
    assert(rows(1).isNullAt(1) && rows(1).getInt(2) == 25)
  }

  test("duplicated flags all-but-first per key under the explicit order") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq((10, "x"), (11, "x"), (12, "y")).toDF("id", "t"))
    val r = d.duplicated(Seq("t"), Seq("id")).df.orderBy("id").collect()
    assert(r.map(_.getBoolean(2)).toSeq == Seq(false, true, false))
  }

  test("std/var/median/quantile aggregates match hand-computed values") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0))
      .toDF("k", "v"))
    val g = d.groupby("k")
    val std = g.agg("v" -> "std" -> "sd", "v" -> "var" -> "vr",
      "v" -> "median" -> "md").df.head()
    // sample variance of 1..4 = 5/3
    assert(math.abs(std.getDouble(2) - 5.0 / 3.0) < 1e-12)
    assert(math.abs(std.getDouble(1) - math.sqrt(5.0 / 3.0)) < 1e-12)
    assert(std.getDouble(3) == 2.5)
    // linear-interpolated q25 of 1..4: 1 + 0.75*(2-1) = 1.75
    assert(g.quantile("v", 0.25, "q").df.head().getDouble(1) == 1.75)
  }

  test(".str regex family: extract null on no-match, count, anchored match") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      (1, "Alpha beta42 gamma"), (2, "x y z"), (3, "beta Banana"))
      .toDF("id", "t"))
    d.set("word6", d("t").str.extract("([A-Za-z]{5,})"))
    d.set("digits", d("t").str.countMatches("[0-9]"))
    d.set("m", d("t").str.matches("beta"))      // anchored: only id=3
    d.set("fm", d("t").str.fullmatch("x y z")) // whole string: only id=2
    val rows = d.df.orderBy("id").collect()
    assert(Option(rows(0).get(2)).contains("Alpha"))
    assert(rows(1).isNullAt(2)) // no >=5-letter word -> null, not ""
    assert(rows.map(_.getInt(3)).toSeq == Seq(2, 0, 0))
    assert(rows.map(_.getBoolean(4)).toSeq == Seq(false, false, true))
    assert(rows.map(_.getBoolean(5)).toSeq == Seq(false, true, false))
  }
}
