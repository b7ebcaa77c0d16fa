package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bloom
import graft.plans.BloomExpressions

/** Bloom join pruning: the sketch must never drop a joining row (no
  * false negatives), must actually prune (bounded false positives), and
  * the probe must sit on the scan side BELOW the join's exchange — a
  * probe that floats above the join would be a correct no-op. */
class BloomSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("prefilterJoin result is identical to the plain join") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val sel = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
    val expected = orders.join(sel, orders("o_custkey") === sel("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val got = Bloom.prefilterJoin(orders, "o_custkey", sel, "c_custkey")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("no false negatives: every build key passes the probe") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val bf = Bloom.buildFilter(cust, "c_custkey")
    val misses = cust
      .filter(!BloomExpressions.mightContain(col("c_custkey"), bf))
      .count()
    assert(misses == 0L)
  }

  test("false-positive rate stays near the configured fpp") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val keys = cust.select(max("c_custkey")).collect()(0).getLong(0)
    val bf = Bloom.buildFilter(cust, "c_custkey", fpp = 0.01)
    // probe a disjoint key range, 10x the corpus size
    val probes = spark.range(keys + 1, keys + 1 + 10 * keys)
    val fps = probes
      .filter(BloomExpressions.mightContain(col("id"), bf)).count()
    val rate = fps.toDouble / (10 * keys)
    assert(rate < 0.05, s"fp rate $rate vs configured 0.01")
  }

  test("string keys probe the same bytes the build hashed") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val bf = Bloom.buildFilter(cust, "c_mktsegment")
    val misses = cust
      .filter(!BloomExpressions.mightContain(col("c_mktsegment"), bf))
      .count()
    assert(misses == 0L)
    val fp = spark.createDataFrame(Seq(Tuple1("NOT-A-SEGMENT-XYZ"))).toDF("s")
      .filter(BloomExpressions.mightContain(col("s"), bf)).count()
    // 5 distinct segments in a 1%-fpp filter: a specific alien string
    // passing would be a ~1e-2 event; treat it as a hashing-drift alarm
    assert(fp == 0L)
  }

  test("probe filter plans below the join, on the fact scan") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val sel = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
    val plan = Bloom.prefilterJoin(orders, "o_custkey", sel, "c_custkey")
      .queryExecution.executedPlan.toString
    val probeAt = plan.indexOf("graft_bloom_might_contain")
    val joinAt = plan.indexOf("Join")
    assert(probeAt >= 0, plan.take(800))
    assert(joinAt >= 0, plan.take(800))
    // executedPlan prints top-down: the probe must appear AFTER the join
    // node in the text, i.e. beneath it in the tree
    assert(probeAt > joinAt,
      s"probe floated above the join:\n${plan.take(1200)}")
  }
}
