package graft

import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api._

/** Core relational surface, mirroring the reference's differential matrix
  * (reference tests/test_data_frame.py structure: projection / filter /
  * join both-keys / setitem-COW / rename / union / agg shapes). */
class RelationalSpec extends AnyFunSuite with SparkFixture {

  private def base: PsDataFrame = {
    val s = spark
    import s.implicits._
    PsDataFrame(Seq(
      (1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, "c", 40.0))
      .toDF("k", "s", "v"))
  }

  test("projection: single, multi, order") {
    assert(base.select("v", "k").columns == Seq("v", "k"))
    assert(base(Seq("s")).df.distinct().count() == 3)
  }

  test("len / shape / dtypes accessors") {
    assert(base.len == 4L)
    assert(base.shape == (4L, 3))
    assert(base.dtypes == Seq("k" -> "integer", "s" -> "string", "v" -> "double"))
  }

  test("attr-style column access: df.v is df(\"v\") (reference __getattr__)") {
    val d = base
    assert(d.where(d.v > 15.0).df.count() == 3)
    assert(d.v.sum() == 100.0)
  }

  test("memoryUsage: content bytes per column in one aggregate") {
    val m = base.memoryUsage().toMap
    assert(m("k") == 4L * 4) // 4 rows x int width
    assert(m("v") == 4L * 8) // 4 rows x double width
    assert(m("s") == 4L) // "a","b","a","c" -> 4 single-byte strings
    // null-safe on variable-width: empty frame reports 0, not null
    val empty = PsDataFrame(base.df.filter(col("k") < 0))
    assert(empty.memoryUsage().toMap.apply("s") == 0L)
  }

  test("filter with comparison and boolean combinators") {
    val d = base
    assert(d.where(d("v") > 15 && d("s") === "a").df.count() == 1)
    assert(d.where(d("v") <= 10 || !(d("s") === "a")).df.count() == 3)
    assert(d.where(d("k").isin(1, 4)).df.count() == 2)
  }

  test("sortValues multi-column with per-column direction") {
    val d = base
    val got = d.sortValues(Seq("s", "v"), Seq(true, false))
      .df.select("k").collect().map(_.getInt(0)).toSeq
    assert(got == Seq(3, 1, 2, 4))
  }

  test("head / nlargest / nsmallest") {
    val d = base
    assert(d.sortValues(Seq("k")).head(2).df.count() == 2)
    assert(d.nlargest(1, Seq("v")).df.head().getInt(0) == 4)
    assert(d.nsmallest(1, Seq("v")).df.head().getInt(0) == 1)
  }

  test("set() is copy-on-write: handed-out frames keep the old plan") {
    val d = base
    val before = d.select("k", "v") // reference versioning semantics:
    d.set("v", d("v") * 2) //          core.py:545-578 + test :316-332
    val sumBefore = before.df.agg(sum("v")).head().getDouble(0)
    val sumAfter = d.df.agg(sum("v")).head().getDouble(0)
    assert(sumBefore == 100.0)
    assert(sumAfter == 200.0)
  }

  test("set() keeps column position for existing, appends for new") {
    val d = base
    d.set("v", d("v") + 1)
    assert(d.columns == Seq("k", "s", "v"))
    d.set("w", d("v") * 2)
    assert(d.columns == Seq("k", "s", "v", "w"))
  }

  test("rename is order-preserving") {
    val d = base.rename(Map("k" -> "id", "v" -> "value"))
    assert(d.columns == Seq("id", "s", "value"))
  }

  test("concat is name-based (reference column-set union semantics)") {
    val s = spark
    import s.implicits._
    val left = PsDataFrame(Seq((1, "x")).toDF("k", "s"))
    val right = PsDataFrame(Seq(("y", 2)).toDF("s", "k")) // reversed order
    val u = left.concat(right).sortValues(Seq("k")).df.collect()
    assert(u.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(u.map(_.getString(1)).toSeq == Seq("x", "y"))
  }

  test("merge on= collapses key, drops duplicate right columns") {
    val s = spark
    import s.implicits._
    val l = PsDataFrame(Seq((1, "l1"), (2, "l2")).toDF("k", "s"))
    val r = PsDataFrame(Seq((1, "r1"), (2, "r2")).toDF("k", "s"))
    val j = l.merge(r, on = Seq("k"))
    assert(j.columns == Seq("k", "s")) // right's dup "s" dropped
    assert(j.df.count() == 2)
    assert(j.df.filter(col("s").startsWith("l")).count() == 2) // left wins
  }

  test("merge leftOn/rightOn keeps both key columns") {
    val s = spark
    import s.implicits._
    val l = PsDataFrame(Seq((1, 10.0)).toDF("lk", "v"))
    val r = PsDataFrame(Seq((1, "x")).toDF("rk", "name"))
    val j = l.merge(r, leftOn = Seq("lk"), rightOn = Seq("rk"))
    assert(j.columns == Seq("lk", "v", "rk", "name"))
  }

  test("merge supports non-inner how (designed extension)") {
    val s = spark
    import s.implicits._
    val l = PsDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "s"))
    val r = PsDataFrame(Seq((1, 1.0)).toDF("k", "v"))
    assert(l.merge(r, on = Seq("k"), how = "left").df.count() == 2)
    assert(l.merge(r, on = Seq("k"), how = "semi").df.count() == 1)
  }

  test("merge how=outer keeps non-matching rows of both sides") {
    val s = spark
    import s.implicits._
    val l = PsDataFrame(Seq((1, "a"), (2, "b")).toDF("lk", "s"))
    val r = PsDataFrame(Seq((2, 2.0), (3, 3.0)).toDF("rk", "v"))
    val j = l.merge(r, leftOn = Seq("lk"), rightOn = Seq("rk"), how = "outer")
    val rows = j.df.collect()
    assert(rows.length == 3) // match(2) + left-only(1) + right-only(3)
    assert(rows.count(_.isNullAt(2)) == 1) // left-only row: rk null
    assert(rows.count(_.isNullAt(0)) == 1) // right-only row: lk null
  }

  test("merge how=anti keeps null-key probe rows (left-anti semantics)") {
    val s = spark
    import s.implicits._
    // SQL NOT IN would yield zero rows the moment the subquery has a
    // NULL; pandas-style anti (Spark left-anti) instead keeps the
    // null-key left row — the oracle uses NOT EXISTS for this reason
    val l = PsDataFrame(Seq((Some(1), "match"), (None, "nullkey"), (Some(9), "nomatch"))
      .toDF("k", "s"))
    val r = PsDataFrame(Seq((Some(1), 1.0), (None, 0.0)).toDF("k", "v"))
    val kept = l.merge(r, on = Seq("k"), how = "anti")
      .df.select("s").collect().map(_.getString(0)).toSet
    assert(kept == Set("nullkey", "nomatch"),
      "anti join must keep null-key probe rows and non-matching rows")
  }

  test("fillna / dropna without a subset touch every column") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      (Some(1L), Some("a")), (None, Some("b")), (Some(3L), None))
      .toDF("n", "t"))
    val filled = d.fillna(-1L).fillna("?").df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(filled == Set((1L, "a"), (-1L, "b"), (3L, "?")))
    val kept = d.dropna().df.collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L)) // only the fully-non-null row survives
    // isna/notna predicates agree with dropna
    assert(d.where(d("n").isna).df.count() == 1)
    assert(d.where(d("n").notna && d("t").notna).df.count() == 1)
  }

  test("clip preserves nulls (pandas keeps NA; greatest/least would not)") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(Some(1L), Some(5L), None).toDF("n"))
    d.set("c", d("n").clip(2L, 4L))
    val clipped = d.select("c").df.collect()
    assert(clipped.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
      == Set(Some(2L), Some(4L), None))
  }

  test("headPerGroup tolerates an input column named __rn; valueCounts rejects 'count'") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq((1, 10, 99), (1, 20, 98), (2, 30, 97))
      .toDF("k", "v", "__rn"))
    val top = d.headPerGroup(1, Seq("k"), Seq(d("v").desc))
    assert(top.columns == Seq("k", "v", "__rn")) // user column survives
    assert(top.df.collect().map(_.getInt(1)).toSet == Set(20, 30))
    val vc = PsDataFrame(Seq(("a", 1)).toDF("count", "x"))
    intercept[IllegalArgumentException] { vc.valueCounts("count") }
  }

  test("pivotAgg: one column per declared value; empty cells stay empty") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "st"))
    val p = d.groupby("k").pivotAgg("st", Seq("a", "b"), "st", "count")
      .sortValues(Seq("k")).df
    assert(p.columns.toSeq == Seq("k", "a", "b"))
    val rows = p.collect()
    assert(rows(0).getLong(1) == 2L) // k=1 has two 'a's
    // the (k=2, 'a') cell has no input rows: Spark emits NULL, and the
    // q_pivot DuckDB oracle hard-codes that alignment via NULLIF — assert
    // it exactly so a Spark-side semantics change fails here first
    assert(rows(1).isNullAt(1))
    assert(rows(1).getLong(2) == 1L)
  }

  test("multiJoin folds left-deep on shared keys") {
    val s = spark
    import s.implicits._
    val a = PsDataFrame(Seq((1, "a")).toDF("k", "x"))
    val b = PsDataFrame(Seq((1, "b")).toDF("k", "y"))
    val c = PsDataFrame(Seq((1, "c")).toDF("k", "z"))
    val j = a.multiJoin(Seq(b, c), on = Seq("k"))
    assert(j.columns == Seq("k", "x", "y", "z"))
    assert(j.df.count() == 1)
  }

  test("dropDuplicates is full-row distinct") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq((1, "a"), (1, "a"), (1, "b")).toDF("k", "s"))
    assert(d.dropDuplicates().df.count() == 2)
  }

  test("aggRows runs in a single scan (one-pass unpivot, not N scans)") {
    val li = sources.PsIO.readParquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
    val res = li.select("l_quantity", "l_extendedprice")
      .aggRows(Seq("sum", "mean", "min", "max"))
    val scans = res.df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r
    }
    assert(scans.size == 1, "aggRows must not rescan the source per function")
    assert(res.df.count() == 4) // one row per aggregate fn
  }

  test("grouped agg naming: aggFns yields col_fn, aggAllColumns keeps names") {
    val d = base
    val m = d.select("s", "v").groupby("s").aggFns(Seq("sum", "count"))
    assert(m.columns.toSet == Set("s", "v_sum", "v_count"))
    val kept = d.select("s", "v").groupby("s").sum()
    assert(kept.columns == Seq("s", "v"))
  }

  test("empty aggregate specs raise a meaningful error") {
    val e = intercept[IllegalArgumentException](base.groupby("s").agg())
    assert(e.getMessage.contains("aggregate"))
    intercept[IllegalArgumentException](base.aggRows(Nil))
  }

  test("merge suffixes=('_x','_y') keeps both copies of overlapping non-key columns") {
    val s = spark
    import s.implicits._
    val l = PsDataFrame(Seq((1, "a", 10)).toDF("k", "tag", "v"))
    val r = PsDataFrame(Seq((1, "b", 20)).toDF("k", "tag", "w"))
    // default (reference semantics): right's duplicate non-key cols drop
    val dropped = l.merge(r, on = Seq("k"))
    assert(dropped.columns == Seq("k", "tag", "v", "w"))
    assert(dropped.df.head().getString(1) == "a")
    // pandas suffixes: both survive under suffixed names
    val both = l.merge(r, on = Seq("k"), suffixes = Some(("_x", "_y")))
    assert(both.columns == Seq("k", "tag_x", "v", "tag_y", "w"))
    val row = both.df.head()
    assert(row.getString(1) == "a" && row.getString(3) == "b")
  }

  test("concatOuter unions columns with null fill; dropna thresh/all; fillna map") {
    val s = spark
    import s.implicits._
    val a = PsDataFrame(Seq((1, "x")).toDF("k", "s"))
    val b = PsDataFrame(Seq((2, 9.5)).toDF("k", "d"))
    val u = a.concatOuter(b)
    assert(u.columns == Seq("k", "s", "d"))
    val rows = u.df.orderBy("k").collect()
    assert(rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == 9.5)
    intercept[org.apache.spark.sql.AnalysisException](a.concat(b).df.collect())

    val n = PsDataFrame(Seq(
      (Some(1), Some("a"), Some(1.0)), (Some(2), None, None), (None, None, None))
      .toDF("x", "y", "z"))
    assert(n.dropna(how = "all").df.count() == 2) // only the all-null row drops
    assert(n.dropna(thresh = Some(2)).df.count() == 1) // needs >=2 non-null
    val filled = n.fillnaMap(Map("y" -> "?", "z" -> 0.0)).df
      .orderBy(org.apache.spark.sql.functions.col("x").asc_nulls_last).collect()
    assert(filled(1).getString(1) == "?" && filled(1).getDouble(2) == 0.0)
  }

  test("value_counts normalize=true yields proportions summing to 1") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq("a", "a", "a", "b").toDF("x"))
    val p = d.valueCounts("x", normalize = true).df.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(p == Map("a" -> 0.75, "b" -> 0.25))
  }

  test("astype casts per column in place; sample is deterministic and nested") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq((1, "2.5"), (2, "3.5")).toDF("k", "v"))
    val cast = d.astype(Map("v" -> "double", "k" -> "long"))
    assert(cast.df.schema.map(_.dataType.typeName) == Seq("long", "double"))
    assert(cast.columns == Seq("k", "v"))
    intercept[IllegalArgumentException](d.astype(Map("nope" -> "int")))

    val ids = PsDataFrame((1L to 2000L).toDF("id"))
    val s20 = ids.sample("id", 0.2).df.collect().map(_.getLong(0)).toSet
    val s40 = ids.sample("id", 0.4).df.collect().map(_.getLong(0)).toSet
    assert(s20.subsetOf(s40), "smaller fraction must nest inside larger")
    assert(math.abs(s20.size - 400) < 80 && math.abs(s40.size - 800) < 110)
    // same call -> identical membership (deterministic, not RNG)
    assert(ids.sample("id", 0.2).df.collect().map(_.getLong(0)).toSet == s20)
  }

  test("cut: right-closed bins, out-of-range and null input get null band") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      Some(10.0), Some(100.0), Some(100.5), Some(250.0), None)
      .toDF("x"))
    val got = d.cut("x", Seq(0, 100, 200), Seq("lo", "hi"), "band")
      .df.collect().map(r => Option(r.get(0)) -> Option(r.getString(1))).toMap
    assert(got(Some(10.0)).contains("lo"))
    assert(got(Some(100.0)).contains("lo")) // right-closed: 100 in (0,100]
    assert(got(Some(100.5)).contains("hi"))
    assert(got(Some(250.0)).isEmpty) // beyond last edge
    assert(got(None).isEmpty)
  }

  test("qcut: balanced bands, no Window/global sort in the plan") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame((1 to 100).map(_.toDouble).toDF("x"))
    val cut = d.qcut("x", 4, "band").df
    val sizes = cut.groupBy("band").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1 -> 25L, 2 -> 25L, 3 -> 25L, 4 -> 25L))
    val plan = cut.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"qcut must not use a global window:\n$plan")
  }

  test("nunique() counts distincts per column; dropDuplicatesBy keep first/last") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      (1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0)).toDF("k", "s", "v"))
    val nu = d.nunique().df.head()
    assert(nu.getLong(0) == 2L && nu.getLong(1) == 2L && nu.getLong(2) == 3L)
    val first = d.dropDuplicatesBy(Seq("k"), Seq("v"))
      .df.orderBy("k").collect().map(_.getDouble(2)).toSeq
    assert(first == Seq(10.0, 30.0))
    val last = d.dropDuplicatesBy(Seq("k"), Seq("v"), keep = "last")
      .df.orderBy("k").collect().map(_.getDouble(2)).toSeq
    assert(last == Seq(20.0, 30.0))
  }

  test("getDummies: indicator columns, null row gets all zeros") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(Some("a"), Some("b"), None).toDF("c"))
    val got = d.getDummies("c", Seq("a", "b"), prefix = "is")
      .df.collect().map(r => (Option(r.get(0)), r.getInt(1), r.getInt(2)))
    assert(got.contains((Some("a"), 1, 0)))
    assert(got.contains((Some("b"), 0, 1)))
    assert(got.contains((None, 0, 0))) // pandas: NaN -> all-zero row
  }

  test("crosstab: counts with zero fill") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      ("r1", "x"), ("r1", "x"), ("r1", "y"), ("r2", "y")).toDF("a", "b"))
    val got = d.crosstab("a", "b", Seq("x", "y"))
      .df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("r1") == ((2L, 1L)))
    assert(got("r2") == ((0L, 1L))) // empty cell is 0, not null
  }

  test("crosstab: null row key is dropped, numeric keys never relabeled 0") {
    val s = spark
    import s.implicits._
    // numeric row key incl. a REAL 0 group and a null group: pandas drops
    // the NaN key; a fill(0) over all numeric columns would have renamed
    // the null group to 0 and produced two 0-labeled rows
    val d = PsDataFrame(Seq(
      (Some(0), "x"), (Some(0), "y"), (Some(1), "x"), (None, "x"), (None, "y"))
      .toDF("a", "b"))
    val rows = d.crosstab("a", "b", Seq("x", "y")).df.orderBy("a").collect()
    assert(rows.length == 2) // null key gone, exactly one 0 row
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1))
    assert((rows(0).getLong(1), rows(0).getLong(2)) == ((1L, 1L)))
    assert((rows(1).getLong(1), rows(1).getLong(2)) == ((1L, 0L)))
  }

  test("rankIn pct: null order values excluded from ranks and denominator") {
    val s = spark
    import s.implicits._
    // pandas: s.rank(pct=True) over [10, 20, 20, NaN] -> [1/3, 2.5/3, 2.5/3, NaN]
    val d = PsDataFrame(Seq(
      ("g", Some(10.0)), ("g", Some(20.0)), ("g", Some(20.0)), ("g", Option.empty[Double]))
      .toDF("k", "v"))
    val got = d.rankIn(Seq("k"), Seq(d("v")), "r", method = "pct")
      .df.orderBy(asc_nulls_last("v")).collect()
    assert(math.abs(got(0).getDouble(2) - 1.0 / 3) < 1e-12)
    assert(math.abs(got(1).getDouble(2) - 2.5 / 3) < 1e-12)
    assert(math.abs(got(2).getDouble(2) - 2.5 / 3) < 1e-12)
    assert(got(3).isNullAt(2)) // NaN in pandas, null here
  }

  test("combineFirst: self wins, other fills gaps, schemas union") {
    val s = spark
    import s.implicits._
    val l = PsDataFrame(Seq(
      (1, Option.empty[Double], "n1"), (2, Some(5.0), "n2"))
      .toDF("k", "v", "name"))
    val r = PsDataFrame(Seq((1, 9.0, "X"), (3, 7.0, "Y")).toDF("k", "v", "extra"))
    val got = l.combineFirst(r, Seq("k"))
    assert(got.columns == Seq("k", "v", "name", "extra"))
    val rows = got.df.orderBy("k").collect()
    assert(rows(0).getDouble(1) == 9.0)  // filled from other
    assert(rows(1).getDouble(1) == 5.0)  // self wins
    assert(rows(2).getDouble(1) == 7.0 && rows(2).isNullAt(2)) // right-only
  }

  test("mergeIndicator labels both/left_only/right_only") {
    val s = spark
    import s.implicits._
    val l = PsDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "lv"))
    val r = PsDataFrame(Seq((2, 9.0), (3, 8.0)).toDF("k", "rv"))
    val got = l.mergeIndicator(r, Seq("k"))
      .df.orderBy("k").collect()
      .map(r => r.getInt(0) -> r.getString(r.fieldIndex("_merge"))).toSeq
    assert(got == Seq(1 -> "left_only", 2 -> "both", 3 -> "right_only"))
  }

  test("filterAgg / filterSize keep whole qualifying groups") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0)).toDF("g", "v"))
    assert(d.groupby("g").filterSize(2).df.collect().forall(_.getString(0) == "a"))
    val bySum = d.groupby("g").filterAgg("v", "sum", _ > 9.0)
      .df.collect().map(_.getString(0)).toSet
    assert(bySum == Set("b"))
  }

  test("mode: modal value per group, ties to smallest value") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      ("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "p"), ("g2", "q")).toDF("g", "v")) // g2: tie p/q -> p
    val got = d.groupby("g").mode("v", "m")
      .df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("g1" -> "x", "g2" -> "p"))
  }

  test("replaceVals maps listed values, passes others through") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq("en", "de", "fr").toDF("lang"))
    val got = d.replaceVals("lang", Seq("en" -> "english", "de" -> "german"))
      .df.collect().map(_.getString(0)).toSet
    assert(got == Set("english", "german", "fr"))
  }

  test("transform broadcasts the group aggregate onto every row") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      ("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("g", "v"))
    val got = d.transformCol("v", "mean", Seq("g"), "m")
      .df.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 3) // row count preserved
    assert(got.filter(_._1 == "a").forall(_._3 == 2.0))
    assert(got.filter(_._1 == "b").forall(_._3 == 10.0))
    intercept[RuntimeException](d.transformCol("v", "median", Seq("g"), "m"))
  }
}
