package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with SparkFixture {

  private def frames = {
    val s = spark
    import s.implicits._
    val left = Seq( // (id, key, t)
      (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 50L),
      (4L, "b", 100L), (5L, "c", 100L))
      .toDF("id", "k", "t")
    val right = Seq( // (key, t, v)
      ("a", 100L, 1.0), ("a", 150L, 2.0), ("b", 90L, 3.0))
      .toDF("k", "t", "v")
    (left, right)
  }

  test("asof left: latest right at-or-before, inclusive ties, null before first") {
    val (l, r) = frames
    val got = AsOfJoin.asof(l, r, Seq("k"), "t", "t", Seq("v"))
      .collect().map(x => x.getLong(0) -> Option(x.get(x.fieldIndex("r_v")))).toMap
    assert(got(1L).contains(1.0)) // t=100 matches right t=100 (inclusive)
    assert(got(2L).contains(2.0)) // t=200 -> latest is 150
    assert(got(3L).isEmpty) // t=50 before first right row
    assert(got(4L).contains(3.0))
    assert(got(5L).isEmpty) // key with no right rows at all
  }

  test("asof rejects mismatched time-column types (no silent unit mixing)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.timestamp_micros
    val (l, r) = frames // left t: bigint
    val rTs = r.withColumn("t", timestamp_micros($"t" * 1000000L)) // right t: timestamp
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, rTs, Seq("k"), "t", "t", Seq("v"))
    }
    assert(e.getMessage.contains("same type"))
  }

  test("asof inner drops unmatched left rows") {
    val (l, r) = frames
    val ids = AsOfJoin.asof(l, r, Seq("k"), "t", "t", Seq("v"), how = "inner")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L))
  }

  test("asof on timestamps keeps sub-second precision (no whole-second truncation)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.timestamp_micros
    // left click at t=1.200s; right rows at t=1.100s (past) and t=1.700s
    // (future, same whole second) — truncating to seconds would attach
    // the future row
    val l = Seq((1L, "a", 1200000L)).toDF("id", "k", "us")
      .withColumn("ts", timestamp_micros($"us" * 1))
    val r = Seq(("a", 1100000L, 10.0), ("a", 1700000L, 99.0)).toDF("k", "us", "v")
      .withColumn("ts", timestamp_micros($"us" * 1))
    val got = AsOfJoin.asof(l.drop("us"), r.drop("us"), Seq("k"), "ts", "ts", Seq("v"))
      .collect().head
    assert(got.getDouble(got.fieldIndex("r_v")) == 10.0)
  }

  test("asof fill is row-atomic: a matched row's null stays null") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, "a", 300L)).toDF("id", "k", "t")
    val r = Seq(
      ("a", 100L, Some(7.0), Some("old")),
      ("a", 200L, None: Option[Double], Some("new"))) // matched row: v is null
      .toDF("k", "t", "v", "tag")
    val row = AsOfJoin.asof(l, r, Seq("k"), "t", "t", Seq("v", "tag"))
      .collect().head
    assert(row.getString(row.fieldIndex("r_tag")) == "new")
    assert(row.isNullAt(row.fieldIndex("r_v"))) // NOT back-filled from t=100
  }


  test("asofDirectional forward: earliest at-or-after, inclusive ties") {
    val (l, r) = frames
    val got = AsOfJoin.asofDirectional(l, r, Seq("k"), "t", "t", Seq("v"),
        direction = "forward")
      .collect().map(x => x.getLong(0) -> Option(x.get(x.fieldIndex("r_v")))).toMap
    assert(got(1L).contains(1.0)) // t=100 matches right t=100 (inclusive)
    assert(got(2L).isEmpty)       // t=200 after last right row
    assert(got(3L).contains(1.0)) // t=50 -> earliest after is 100
    assert(got(4L).isEmpty)       // right "b" row is at 90 < 100
    assert(got(5L).isEmpty)
  }

  test("asofDirectional nearest: min distance, tie -> backward") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, "a", 125L), (2L, "a", 130L), (3L, "a", 10L), (4L, "a", 500L))
      .toDF("id", "k", "t")
    val r = Seq(("a", 100L, 1.0), ("a", 150L, 2.0)).toDF("k", "t", "v")
    val got = AsOfJoin.asofDirectional(l, r, Seq("k"), "t", "t", Seq("v"),
        direction = "nearest")
      .collect().map(x => x.getLong(0) -> Option(x.get(x.fieldIndex("r_v")))).toMap
    assert(got(1L).contains(1.0)) // equidistant 25/25 -> backward wins
    assert(got(2L).contains(2.0)) // 30 back vs 20 forward -> forward
    assert(got(3L).contains(1.0)) // before first -> forward side only
    assert(got(4L).contains(2.0)) // after last -> backward side only
  }

  test("asofDirectional tolerance: far matches null out; inner drops them") {
    val (l, r) = frames
    val tol = AsOfJoin.asofDirectional(l, r, Seq("k"), "t", "t", Seq("v"),
        direction = "backward", tolerance = Some(10L))
      .collect().map(x => x.getLong(0) -> Option(x.get(x.fieldIndex("r_v")))).toMap
    assert(tol(1L).contains(1.0)) // exact hit, distance 0
    assert(tol(2L).isEmpty)       // distance 50 > 10 -> nulled
    assert(tol(4L).contains(3.0)) // distance 10, inclusive bound
    val inner = AsOfJoin.asofDirectional(l, r, Seq("k"), "t", "t", Seq("v"),
        how = "inner", direction = "backward", tolerance = Some(10L))
      .collect().map(_.getLong(0)).toSet
    assert(inner == Set(1L, 4L))
    // bookkeeping columns never leak into the output schema
    val cols = AsOfJoin.asofDirectional(l, r, Seq("k"), "t", "t", Seq("v"),
        direction = "nearest").columns.toSet
    assert(cols == Set("id", "k", "t", "r_v"), cols)
  }

  test("cumsum / rank / lag window sugar") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 5.0), ("b", 1, 7.0))
      .toDF("g", "seq", "v"))
    val c = d.cumsum("v", Seq("g"), Seq("seq"), "cum")
      .df.orderBy("g", "seq").collect().map(_.getDouble(3)).toSeq
    assert(c == Seq(10.0, 30.0, 35.0, 7.0))
    val ranked = d.rankIn(Seq("g"), Seq(d("v").desc), "rnk")
      .df.filter(org.apache.spark.sql.functions.col("g") === "a")
      .orderBy("seq").collect().map(_.getInt(3)).toSeq
    assert(ranked == Seq(2, 1, 3))
    val lagged = d.lagCol("v", 1, Seq("g"), Seq(d("seq").asc), "prev")
      .df.orderBy("g", "seq").collect().map(r => Option(r.get(3))).toSeq
    assert(lagged == Seq(None, Some(10.0), Some(20.0), None))
  }

  test("rank methods: min/dense/first/average match pandas tie semantics") {
    val s = spark
    import s.implicits._
    // values 10, 20, 20, 30 -> pandas ranks:
    //   min: 1,2,2,4  dense: 1,2,2,3  average: 1, 2.5, 2.5, 4
    val d = PsDataFrame(Seq(
      ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 20.0), ("a", 4, 30.0))
      .toDF("g", "seq", "v"))
    def ranks(m: String): Seq[Double] =
      d.rankIn(Seq("g"), Seq(d("v").asc), "r", method = m)
        .df.orderBy("seq").collect()
        .map(r => r.get(3) match {
          case i: Int => i.toDouble
          case x: Double => x
        }).toSeq
    assert(ranks("min") == Seq(1.0, 2.0, 2.0, 4.0))
    assert(ranks("dense") == Seq(1.0, 2.0, 2.0, 3.0))
    assert(ranks("average") == Seq(1.0, 2.5, 2.5, 4.0))
    assert(ranks("pct") == Seq(0.25, 0.625, 0.625, 1.0)) // average/4
    val pos = d.cumcount(Seq("g"), Seq(d("v").asc, d("seq").asc), "p")
      .df.orderBy("seq").collect().map(_.getInt(3)).toSeq
    assert(pos == Seq(0, 1, 2, 3))
    // first needs the tie broken by the order given; with v asc only it
    // still numbers rows 1..4
    assert(ranks("first").sorted == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("mergeAsof facade == direct native asof; resample buckets event time") {
    val (l, r) = frames
    val viaFacade = PsDataFrame(l).mergeAsof(PsDataFrame(r), on = "t", by = Seq("k"))
      .df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val direct = AsOfJoin.asof(l, r, Seq("k"), "t", "t", Seq("v"))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(viaFacade == direct)

    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.timestamp_seconds
    val ev = Seq((10L, 1.0), (70L, 2.0), (80L, 3.0), (3700L, 4.0))
      .toDF("sec", "v").withColumn("ts", timestamp_seconds($"sec"))
    val res = PsDataFrame(ev)
      .resample("1 minute", "ts", ("v", "sum") -> "total", ("v", "count") -> "n")
      .df.orderBy("window_start").collect()
    assert(res.length == 3)
    assert(res(0).getDouble(1) == 1.0 && res(1).getDouble(1) == 5.0 &&
      res(2).getDouble(1) == 4.0)
    assert(res(1).getLong(2) == 2L)
  }

  test("shift: negative n is lead; rollingAgg generalizes rolling mean") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 5.0)).toDF("g", "seq", "v"))
    val led = d.lagCol("v", -1, Seq("g"), Seq(d("seq").asc), "nxt")
      .df.orderBy("seq").collect().map(r => Option(r.get(3))).toSeq
    assert(led == Seq(Some(20.0), Some(5.0), None))
    val rmax = d.rollingAgg("v", "max", 2, Seq("g"), Seq("seq"), "m")
      .df.orderBy("seq").collect().map(r => Option(r.get(3))).toSeq
    assert(rmax == Seq(None, Some(20.0), Some(20.0)))
    val rsum = d.rollingAgg("v", "sum", 2, Seq("g"), Seq("seq"), "sm")
      .df.orderBy("seq").collect().map(r => Option(r.get(3))).toSeq
    assert(rsum == Seq(None, Some(30.0), Some(25.0)))
  }

  test("diff / pct_change / cumAgg running extrema") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 5.0), ("b", 1, 7.0))
      .toDF("g", "seq", "v"))
    val diffs = d.diffCol("v", 1, Seq("g"), Seq(d("seq").asc), "d")
      .df.orderBy("g", "seq").collect().map(r => Option(r.get(3))).toSeq
    assert(diffs == Seq(None, Some(10.0), Some(-15.0), None))
    val pct = d.pctChange("v", 1, Seq("g"), Seq(d("seq").asc), "p")
      .df.orderBy("g", "seq").collect().map(r => Option(r.get(3))).toSeq
    assert(pct == Seq(None, Some(1.0), Some(-0.75), None))
    val cmax = d.cumAgg("v", "max", Seq("g"), Seq("seq"), "m")
      .df.orderBy("g", "seq").collect().map(_.getDouble(3)).toSeq
    assert(cmax == Seq(10.0, 20.0, 20.0, 7.0))
    val cmin = d.cumAgg("v", "min", Seq("g"), Seq("seq"), "m")
      .df.orderBy("g", "seq").collect().map(_.getDouble(3)).toSeq
    assert(cmin == Seq(10.0, 10.0, 5.0, 7.0))
    val cprod = d.cumAgg("v", "prod", Seq("g"), Seq("seq"), "m")
      .df.orderBy("g", "seq").collect().map(_.getDouble(3)).toSeq
    assert(cprod.zip(Seq(10.0, 200.0, 1000.0, 7.0))
      .forall { case (a, b) => math.abs(a - b) / b < 1e-12 })
  }

  test("ffill/bfill/interpolate: interior linear, edges stay null") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      ("a", 1, None: Option[Double]), ("a", 2, Some(10.0)),
      ("a", 3, None: Option[Double]), ("a", 4, None: Option[Double]),
      ("a", 5, Some(40.0)), ("a", 6, None: Option[Double]))
      .toDF("g", "seq", "v"))
    def vals(p: PsDataFrame, c: String): Seq[Option[Double]] =
      p.df.orderBy("seq").collect()
        .map(r => Option(r.get(r.fieldIndex(c))).map(_.asInstanceOf[Double])).toSeq
    assert(vals(d.ffill("v", Seq("g"), Seq("seq"), "f"), "f") ==
      Seq(None, Some(10.0), Some(10.0), Some(10.0), Some(40.0), Some(40.0)))
    assert(vals(d.bfill("v", Seq("g"), Seq("seq"), "b"), "b") ==
      Seq(Some(10.0), Some(10.0), Some(40.0), Some(40.0), Some(40.0), None))
    assert(vals(d.interpolate("v", Seq("g"), Seq("seq"), "li"), "li") ==
      Seq(None, Some(10.0), Some(20.0), Some(30.0), Some(40.0), None))
  }

  test("cumprod handles zeros, negatives, and leading nulls") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      ("a", 1, Some(-2.0)), ("a", 2, Some(3.0)), ("a", 3, Some(0.0)),
      ("a", 4, Some(5.0)), ("b", 1, None: Option[Double]), ("b", 2, Some(4.0)))
      .toDF("g", "seq", "v"))
    val got = d.cumAgg("v", "prod", Seq("g"), Seq("seq"), "p")
      .df.orderBy("g", "seq").collect().map(r => Option(r.get(3))).toSeq
    assert(got(0).contains(-2.0))
    assert(got(1).exists(x => math.abs(x.asInstanceOf[Double] + 6.0) < 1e-12))
    assert(got(2).contains(0.0)) // zero zeroes the running product…
    assert(got(3).contains(0.0)) // …and it stays zero
    assert(got(4).isEmpty)       // no values yet -> null (SQL agg semantics)
    assert(got(5).contains(4.0)) // null skipped, not zeroed
  }

  test("nunique aggregate counts distinct values per group") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      ("a", 1), ("a", 1), ("a", 2), ("b", 5)).toDF("g", "x"))
    val got = d.groupby("g").agg(("x", "nunique") -> "nx")
      .df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }

  // ---- native (Catalyst) as-of operator -----------------------------

  test("asof plans the native operator: no Window, no Union, one shuffle per side") {
    val (l, r) = frames
    val df = AsOfJoin.asof(l, r, Seq("k"), "t", "t", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    assert(!plan.contains("Window"), s"native path must not fall back to window:\n$plan")
    assert(!plan.contains("Union"), s"native path must not union the sides:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 2, s"expected exactly 2 key shuffles, got $shuffles:\n$plan")
  }

  test("native and windowed forms agree on the events corpus (left and inner)") {
    import org.apache.spark.sql.functions.{col, expr, max}
    val ev = graft.sources.PsIO.readEventsNs(spark, "/root/testdata/sf0.001/events.parquet")
      .withColumn("ms", expr("ts div 1000000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ms")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ms").agg(max("value").as("p_value"))
    for (how <- Seq("left", "inner")) {
      val native = AsOfJoin.asof(clicks, purchases, Seq("user_id"), "ms", "ms",
        Seq("p_value"), how = how)
      val windowed = AsOfJoin.asofWindowed(clicks, purchases, Seq("user_id"), "ms", "ms",
        Seq("p_value"), how = how)
      assert(native.columns.toSeq == windowed.columns.toSeq)
      val n = native.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      val w = windowed.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      assert(n == w, s"native vs windowed mismatch for how=$how")
    }
  }

  test("self-asof (both sides from the same DataFrame) resolves and matches windowed") {
    val (l, _) = frames
    val native = AsOfJoin.asof(l, l, Seq("k"), "t", "t", Seq("id"), rightPrefix = "prev_")
    val windowed = AsOfJoin.asofWindowed(l, l, Seq("k"), "t", "t", Seq("id"), rightPrefix = "prev_")
    val n = native.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val w = windowed.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(n == w)
    // every row self-matches (its own time is <= itself): prev_id != null
    assert(native.collect().forall(r => !r.isNullAt(r.fieldIndex("prev_id"))))
  }

  test("asof output keeps broadcastable stats (sum, not product, of children)") {
    val (l, r) = frames
    val df = AsOfJoin.asof(l, r, Seq("k"), "t", "t", Seq("v"))
    val plan = df.queryExecution.optimizedPlan
    val Seq(ls, rs) = plan.children.map(_.stats.sizeInBytes)
    assert(plan.stats.sizeInBytes <= ls + rs,
      s"asof stats ${plan.stats.sizeInBytes} vs children $ls + $rs")
    // downstream consequence: joining the asof output against a big table
    // must still qualify the asof side for broadcast
    val big = l.sparkSession.range(100000).toDF("id")
    val joined = big.join(df, big("id") === df("id"))
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"asof output should broadcast into the big join:\n$phys")
  }

  test("null keys and null times: native agrees with the windowed witness") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, Some("a"), Some(100L)), (2L, None, Some(100L)),
      (3L, Some("a"), None), (4L, None, None))
      .toDF("id", "k", "t")
    val right = Seq(
      (Some("a"), Some(90L), 1.0), (None, Some(50L), 2.0),
      (Some("a"), None, 3.0))
      .toDF("k", "t", "v")
    val n = AsOfJoin.asof(left, right, Seq("k"), "t", "t", Seq("v"))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val w = AsOfJoin.asofWindowed(left, right, Seq("k"), "t", "t", Seq("v"))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(n == w, s"null-handling divergence:\n native=$n\n window=$w")
  }

  test("native asof survives skewed groups and empty right partitions") {
    val s = spark
    import s.implicits._
    // one hot key with many rows, several keys with no right rows at all
    val left = (1 to 5000).map(i => (i.toLong, if (i % 10 == 0) "cold" + i else "hot", i.toLong * 2))
      .toDF("id", "k", "t").repartition(7)
    val right = (1 to 500).map(i => ("hot", i.toLong * 17, i.toDouble)).toDF("k", "t", "v")
    val native = AsOfJoin.asof(left, right, Seq("k"), "t", "t", Seq("v"))
    val windowed = AsOfJoin.asofWindowed(left, right, Seq("k"), "t", "t", Seq("v"))
    val n = native.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val w = windowed.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(n.size == 5000 && n == w)
  }
}
