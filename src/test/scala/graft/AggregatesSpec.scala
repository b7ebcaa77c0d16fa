package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api._
import graft.functions.GraftAggregates

/** Aggregate semantics, incl. the NULL behavior the round-1 oracle data
  * could not observe (VERDICT "What's wrong" #4). */
class AggregatesSpec extends AnyFunSuite with SparkFixture {

  private def nullable = {
    val s = spark
    import s.implicits._
    Seq(
      ("g1", Some(2.0)), ("g1", None), ("g1", Some(3.0)),
      ("g2", Some(-4.0)), ("g2", Some(0.5)),
      ("g3", Some(0.0)), ("g3", Some(9.0)),
      ("g4", Option.empty[Double])).toDF("g", "x")
  }

  test("prod skips NULLs (does not zero the product)") {
    val got = nullable.groupBy("g").agg(GraftAggregates.prod(col("x")).as("p"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("g1").contains(6.0))
    assert(got("g2").contains(-2.0)) // sign from odd negative count
    assert(got("g3").contains(0.0)) // zero short-circuits
    assert(got("g4").isEmpty) // all-null group -> NULL
  }

  test("prodExact (Aggregator fold) agrees with declarative prod") {
    val d = nullable.filter(col("x").isNotNull)
    val a = d.groupBy("g").agg(GraftAggregates.prod(col("x")).as("p"))
    val b = d.groupBy("g").agg(GraftAggregates.prodExact(col("x")).as("p"))
    val pa = a.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val pb = b.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    pa.foreach { case (g, v) => assert(math.abs(v - pb(g)) < 1e-9, g) }
  }

  test("any/all over booleans and numerics") {
    val s = spark
    import s.implicits._
    val d = Seq(("a", true), ("a", false), ("b", false)).toDF("g", "x")
    val got = d.groupBy("g").agg(
      GraftAggregates.anyAgg(col("x")).as("any"),
      GraftAggregates.allAgg(col("x")).as("all"))
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(got("a") == (true, false))
    assert(got("b") == (false, false))
  }

  test("per-column aggregate sugar returns scalars matching the agg path") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "v"))
    assert(d("v").sum() == 60.0)
    assert(d("v").mean() == 20.0)
    assert(d("v").min() == 10.0)
    assert(d("v").max() == 30.0)
    assert(d("v").countValues() == 3L)
    // declarative prod goes through exp(sum(log)) — exact to ~1 ulp/row
    assert(math.abs(d("v").prod().asInstanceOf[Double] - 6000.0) < 1e-6)
    // matches the frame-level path
    assert(d.select("v").sum().df.head().getDouble(0) == 60.0)
  }

  test("sugar on an ownerless column raises a meaningful error") {
    val e = intercept[IllegalArgumentException](PsColumn(lit(5)).sum())
    assert(e.getMessage.contains("owning frame"))
  }

  test("~ dispatches on type: logical NOT for booleans, bitwise for ints") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq((5L, true), (6L, false)).toDF("n", "b"))
    assert(d.where(~d("b")).df.count() == 1)
    val inv = d.selectExprs((~d("n")).as("i")).df.collect().map(_.getLong(0)).toSeq
    assert(inv == Seq(-6L, -7L))
  }

  test("aggOrdered: idxmax/idxmin/first/last in one pass, deterministic ties") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 5.0),
      ("b", 9L, 1.0)).toDF("g", "id", "v"))
    val r = d.groupby("g").aggOrdered("id",
        ("v", "idxmax") -> "imax", ("v", "idxmin") -> "imin",
        ("v", "first") -> "fv", ("v", "last") -> "lv")
      .df.orderBy("g").collect()
    assert(r(0).getLong(1) == 3L)    // v=30 tie -> largest id
    assert(r(0).getLong(2) == 4L)    // min v=5 at id 4
    assert(r(0).getDouble(3) == 10.0) // value at smallest id
    assert(r(0).getDouble(4) == 5.0)  // value at largest id
    assert(r(1).getLong(1) == 9L && r(1).getLong(2) == 9L)
    // sugar forms agree
    val viaSugar = d.groupby("g").idxmax("v", "id", "imax")
      .df.orderBy("g").collect().map(_.getLong(1)).toSeq
    assert(viaSugar == Seq(3L, 9L))
  }

  test("strJoin concatenates in explicit order regardless of input order") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      ("g", 3, "c"), ("g", 1, "a"), ("g", 2, "b"), ("h", 1, "z"))
      .toDF("k", "ord", "v").repartition(4)) // scramble physical order
    val got = d.groupby("k").strJoin("v", "ord", "-", "j")
      .df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("g" -> "a-b-c", "h" -> "z"))
  }

  test("corrCov (native) agrees with corrExact (bit-portable co-sums)") {
    val s = spark
    import s.implicits._
    val d = PsDataFrame(Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 4.5), ("a", 3.0, 5.5), ("a", 4.0, 9.0),
      ("b", 1.0, 9.0), ("b", 2.0, 5.0), ("b", 3.0, 1.0)).toDF("g", "x", "y"))
    def byG(p: PsDataFrame): Map[String, (Double, Double)] =
      p.df.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val native = byG(d.groupby("g").corrCov("x", "y", "c", "v"))
    val exact  = byG(d.groupby("g").corrExact("x", "y", "c", "v"))
    for (g <- Seq("a", "b"); i <- 0 to 1) {
      val (n, e) = (if (i == 0) native(g)._1 else native(g)._2,
                    if (i == 0) exact(g)._1 else exact(g)._2)
      assert(math.abs(n - e) < 1e-9, s"group $g component $i: $n vs $e")
    }
    // perfectly anti-correlated group
    assert(math.abs(exact("b")._1 + 1.0) < 1e-12)
  }

  test("local constructors: fromLocal products and fromRows with schema") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val byProduct = PsDataFrame.fromLocal(spark, Seq(("x", 1), ("y", 2)))
    assert(byProduct.columns == Seq("_1", "_2"))
    assert(byProduct.df.count() == 2)
    val schema = new StructType().add("name", StringType).add("n", IntegerType)
    val byRows = PsDataFrame.fromRows(spark, schema, Seq(Row("x", 1), Row("y", 2)))
    assert(byRows.columns == Seq("name", "n"))
    assert(byRows.df.agg(sum("n")).head().getLong(0) == 3L)
  }
}
