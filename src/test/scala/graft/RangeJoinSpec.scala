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

  test("degenerate intervals (lo > hi, null bounds) mean no-match, not a crash") {
    val s = spark
    import s.implicits._
    val p = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("p_id", "x")
    val i = Seq(
      (1L, Some(10L), Some(20L)),
      (2L, Some(50L), Some(40L)), // reversed: sequence() would throw
      (3L, None, Some(30L)),      // null lo
      (4L, Some(60L), None))      // null hi
      .toDF("i_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, i, "x", "lo", "hi", binSize = 8)
      .select("p_id", "i_id")
    val naive = p.join(i, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("p_id", "i_id")
    assert(rows(got) == rows(naive))
    assert(rows(got).forall(_(1) == 1L)) // only the valid interval matches

    // same through the optimizer rule
    p.createOrReplaceTempView("rjd_points")
    i.createOrReplaceTempView("rjd_intervals")
    spark.conf.set(RangeJoinRule.BinSizeKey, "8")
    try {
      val sql = spark.sql(
        """SELECT p_id, i_id FROM rjd_points p JOIN rjd_intervals i
           ON p.x >= i.lo AND p.x <= i.hi""")
      assert(sql.queryExecution.executedPlan.toString.contains("Generate"))
      assert(rows(sql) == rows(naive))
    } finally spark.conf.unset(RangeJoinRule.BinSizeKey)
  }

  test("AQE splits the hot bin under pathological point skew") {
    val s = spark
    import s.implicits._
    // half the points land in ONE 64-wide bin (the exact skew the bin
    // rewrite trades the nested loop for); the other half spread evenly
    // across 10,000 bins
    val n = 100000L
    val points = spark.range(n).select(
      col("id").as("p_id"),
      when(col("id") % 2 === 0, col("id") % 64)
        .otherwise(lit(64) + (col("id") % 10000) * 64).as("x"))
    val intervals = (0 until 200).map(k => (k.toLong, k * 3200L, k * 3200L + 3199L))
      .toDF("i_id", "lo", "hi")

    // thresholds scaled down so the split fires at test size; the ratios
    // (hot partition >> factor x median, > threshold) mirror production
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "128k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32k")
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = RangeJoin.pointInInterval(
        points, intervals, "x", "lo", "hi", binSize = 64)
      val got = joined.collect() // execute THIS plan so AQE finalizes it
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan isFinalPlan=true"), plan)
      assert(plan.contains("skewed"),
        s"expected an AQE skew-split shuffle read in:\n$plan")
      val naive = points.join(intervals,
        col("x") >= col("lo") && col("x") <= col("hi")).count()
      assert(got.length.toLong == naive && naive > 0)
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("injected SQL functions run the codegen'd expressions from pure SQL") {
    val one = spark.sql(
      "SELECT graft_cosine(array(3.0, 4.0), array(3.0, 4.0)) AS c").head().getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0, 2.0, 3.0), array(4.0, 5.0, 6.0)) AS d").head().getDouble(0)
    assert(dot == 32.0)
    val sh = spark.sql(
      "SELECT graft_shingles('a b c d', 2) AS s").head().getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
    // differential vs the Column API on real embeddings
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").limit(50)
    e.createOrReplaceTempView("gsql_emb")
    val viaSql = spark.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, b.embedding) AS c
         FROM gsql_emb a JOIN gsql_emb b ON b.vec_id = a.vec_id + 1""")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaApi = {
      import graft.plans.VectorExpressions.cosine
      import org.apache.spark.sql.functions.col
      val a = e.select(col("vec_id"), col("embedding").as("ea"))
      val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("eb"))
      a.join(b, "vec_id").select(col("vec_id"), cosine(col("ea"), col("eb")).as("c"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(viaSql == viaApi && viaSql.nonEmpty)
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
