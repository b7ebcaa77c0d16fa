package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PsIO

class ParquetStatsSpec extends AnyFunSuite with SparkFixture {

  test("envelopes: sorted layout gives disjoint per-file min/max; nulls counted") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-pstats").toString + "/t"
    // range-partitioned on k -> each file owns a disjoint k envelope
    val df = (1 to 300).map(i => (i.toLong, if (i % 10 == 0) None else Some(i)))
      .toDF("k", "v")
    df.repartitionByRange(3, org.apache.spark.sql.functions.col("k"))
      .sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    val st = PsIO.parquetStats(s, dir, Seq("k", "v")).collect()
    val kRows = st.filter(_.getString(2) == "k")
      .map(r => (r.getLong(5), r.getLong(6))).sortBy(_._1)
    assert(kRows.length == 3)
    // disjoint, covering envelopes
    assert(kRows.sliding(2).forall { case Array((_, hi), (lo, _)) => hi < lo })
    assert(kRows.head._1 == 1L && kRows.last._2 == 300L)
    // null accounting: 30 nulls across the v chunks; num_values counts all
    val vRows = st.filter(_.getString(2) == "v")
    assert(vRows.map(_.getLong(4)).sum == 30L)
    assert(st.filter(_.getString(2) == "k").map(_.getLong(3)).sum == 300L)
  }

  test("guards: unknown column, non-integer column, empty dir") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-pstats-g").toString + "/t"
    Seq((1L, "x")).toDF("k", "s").write.mode("overwrite").parquet(dir)
    intercept[IllegalArgumentException](PsIO.parquetStats(s, dir, Seq("nope")))
    val e = intercept[IllegalArgumentException](PsIO.parquetStats(s, dir, Seq("s")))
    assert(e.getMessage.contains("truncation-lossy"))
    intercept[IllegalArgumentException](PsIO.parquetStats(s, dir, Nil))
  }

  test("an all-null chunk reports null min/max with the full null count") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-pstats-n").toString + "/t"
    Seq[(Long, Option[Long])]((1L, None), (2L, None)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val v = PsIO.parquetStats(s, dir, Seq("v")).collect().head
    assert(v.getLong(4) == 2L && v.isNullAt(5) && v.isNullAt(6))
  }
}
