package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.plans.RangeJoinRule

class RangeJoinSpec extends AnyFunSuite with SparkFixture {

  private def rows(df: DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  private def fixtures = {
    val s = spark
    import s.implicits._
    // points spread over [0, 10000); intervals of mixed width, some
    // overlapping, some empty of points, negative values included
    val points = (-50 to 9999 by 3).map(i => (i.toLong, i.toLong)).toDF("p_id", "x")
    val intervals = Seq(
      (1L, 0L, 100L), (2L, 90L, 110L), (3L, 5000L, 5003L),
      (4L, -100L, -60L), (5L, 9990L, 12000L), (6L, 42L, 42L))
      .toDF("i_id", "lo", "hi")
    (points, intervals)
  }

  test("pointInInterval matches the naive range join, strict residual kept") {
    val (p, i) = fixtures
    val got = RangeJoin.pointInInterval(p, i, "x", "lo", "hi", binSize = 64)
      .select("p_id", "i_id")
    val naive = p.join(i, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("p_id", "i_id")
    assert(rows(got) == rows(naive))
    assert(rows(got).nonEmpty)
  }

  test("pointInInterval plans an equi-join on the bin, not a nested loop") {
    val (p, i) = fixtures
    val plan = RangeJoin.pointInInterval(p, i, "x", "lo", "hi", binSize = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("optimizer rule rewrites a SQL range join when binSize is set") {
    val (p, i) = fixtures
    p.createOrReplaceTempView("rj_points")
    i.createOrReplaceTempView("rj_intervals")
    val sql =
      """SELECT p_id, i_id FROM rj_points p JOIN rj_intervals i
         ON p.x >= i.lo AND p.x <= i.hi"""

    val baseline = rows(spark.sql(sql)) // conf unset: nested-loop plan
    spark.conf.set(RangeJoinRule.BinSizeKey, "64")
    try {
      val rewritten = spark.sql(sql)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("Generate"), s"expected bin explode in:\n$plan")
      assert(rows(rewritten) == baseline)
    } finally spark.conf.unset(RangeJoinRule.BinSizeKey)
  }

  test("optimizer rule preserves strict bounds and leaves equi joins alone") {
    val s = spark
    import s.implicits._
    val (p, i) = fixtures
    p.createOrReplaceTempView("rj_points")
    i.createOrReplaceTempView("rj_intervals")
    spark.conf.set(RangeJoinRule.BinSizeKey, "64")
    try {
      // strict bounds: x > lo AND x < hi — endpoints excluded by residual
      val strict = spark.sql(
        """SELECT p_id, i_id FROM rj_points p JOIN rj_intervals i
           ON p.x > i.lo AND p.x < i.hi""")
      val naive = p.join(i, col("x") > col("lo") && col("x") < col("hi"))
        .select("p_id", "i_id")
      assert(rows(strict) == rows(naive))

      // equi + range: already hash-joins on the key; rule must not touch it
      val pk = p.withColumn("k", col("p_id") % 5)
      val ik = i.withColumn("k", col("i_id") % 5)
      pk.createOrReplaceTempView("rjk_points")
      ik.createOrReplaceTempView("rjk_intervals")
      val equi = spark.sql(
        """SELECT p_id, i_id FROM rjk_points p JOIN rjk_intervals i
           ON p.k = i.k AND p.x >= i.lo AND p.x <= i.hi""")
      assert(!equi.queryExecution.executedPlan.toString.contains("Generate"))
      val naiveEqui = pk.as("p").join(ik.as("i"),
        col("p.k") === col("i.k") && col("p.x") >= col("i.lo") && col("p.x") <= col("i.hi"))
        .select("p.p_id", "i.i_id")
      assert(rows(equi) == rows(naiveEqui))
    } finally spark.conf.unset(RangeJoinRule.BinSizeKey)
  }
}
