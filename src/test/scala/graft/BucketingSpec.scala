package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PsIO

/** Co-located joins: two tables bucketed on the join key must join with
  * ZERO shuffle exchanges (the bucketing IS the partitioning). */
class BucketingSpec extends AnyFunSuite with SparkFixture {

  test("join of co-bucketed tables plans no shuffle") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft-bucket").toString
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i", i * 1.0)).toDF("k", "tag", "v")
    val dims = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    PsIO.writeBucketed(facts, "graft_facts", s"$base/facts", Seq("k"), 8)
    PsIO.writeBucketed(dims, "graft_dims", s"$base/dims", Seq("k"), 8)
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("graft_facts").join(s.table("graft_dims"), "k")
      assert(joined.count() == 1000)
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free co-bucketed join, found ${shuffles.size} exchanges")
      // and a bucketed groupBy on the key needs no exchange either
      val agg = s.table("graft_facts").groupBy("k").agg(sum("v"))
      assert(agg.count() == 50)
      val aggShuffles = agg.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e
      }
      assert(aggShuffles.isEmpty, "bucketed groupBy should reuse bucketing")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS graft_facts")
      s.sql("DROP TABLE IF EXISTS graft_dims")
    }
  }
}
