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

  test("pruneSim: disjoint envelopes prune, overlap survives, conjunction ORs") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-prune").toString + "/t"
    // 3 files with disjoint k envelopes [1,100] [101,200] [201,300];
    // v is k+1000 everywhere, so a v predicate can veto independently
    val df = (1 to 300).map(i => (i.toLong, i + 1000L)).toDF("k", "v")
    df.repartitionByRange(3, org.apache.spark.sql.functions.col("k"))
      .sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    val stats = PsIO.parquetStats(s, dir, Seq("k", "v"))
    // k BETWEEN 120 AND 180: only the middle file survives
    val sim1 = PsIO.parquetPruneSim(stats, Seq(("k", 120L, 180L))).collect()
      .map(r => (r.getString(0), r.getBoolean(2))) // (file, pruned)
    assert(sim1.length == 3 && sim1.count(_._2) == 2)
    // conjunction: k range matches the middle file but v range matches
    // nothing -> every group pruned (any column's exclusion suffices)
    val sim2 = PsIO.parquetPruneSim(stats,
      Seq(("k", 120L, 180L), ("v", 0L, 10L))).collect()
    assert(sim2.forall(_.getBoolean(2)) && sim2.forall(_.getLong(3) == 2L))
    // a range covering everything prunes nothing
    val sim3 = PsIO.parquetPruneSim(stats, Seq(("k", 1L, 300L))).collect()
    assert(sim3.forall(!_.getBoolean(2)))
    // per-file rollup fractions
    val rep = PsIO.parquetPruneReport(
      PsIO.parquetPruneSim(stats, Seq(("k", 120L, 180L)))).collect()
      .map(r => (r.getString(0), r.getDouble(3))).sortBy(_._1)
    assert(rep.map(_._2).count(_ == 1.0) == 2 && rep.map(_._2).count(_ == 0.0) == 1)
    // guards
    intercept[IllegalArgumentException](PsIO.parquetPruneSim(stats, Nil))
    intercept[IllegalArgumentException](
      PsIO.parquetPruneSim(stats, Seq(("k", 5L, 1L))))
    intercept[IllegalArgumentException](
      PsIO.parquetPruneSim(stats, Seq(("k", 1L, 2L), ("k", 3L, 4L))))
  }

  test("pruneSim: all-null chunk prunes for a range; missing stats keep the group") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-prune-n").toString + "/t"
    Seq[(Long, Option[Long])]((1L, None), (2L, None)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val stats = PsIO.parquetStats(s, dir, Seq("v"))
    // provably all-null chunk: no value can satisfy v BETWEEN 0 AND 10
    assert(PsIO.parquetPruneSim(stats, Seq(("v", 0L, 10L)))
      .collect().head.getBoolean(2))
    // same envelope with the null_count erased = "stats omitted":
    // conservative keep (a reader without stats must scan)
    import org.apache.spark.sql.functions._
    val noStats = stats.withColumn("null_count", lit(null).cast("long"))
    assert(!PsIO.parquetPruneSim(noStats, Seq(("v", 0L, 10L)))
      .collect().head.getBoolean(2))
  }

  test("pruneSim: a group with NO predicate-column stats emits unpruned, 0 checked") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-prune-m").toString + "/t"
    Seq((1L, 5L), (2L, 6L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // schema drift: the predicate column exists in the table but this
    // file's stats relation carries only k — the group must still
    // appear (a reader has to scan it), never silently vanish
    val kOnly = PsIO.parquetStats(s, dir, Seq("k"))
    val sim = PsIO.parquetPruneSim(kOnly, Seq(("v", 0L, 10L))).collect()
    assert(sim.length == 1)
    assert(!sim.head.getBoolean(2) && sim.head.getLong(3) == 0L)
    // mixed: k checked and pruning, v absent -> pruned via k, 1 checked
    val mixed = PsIO.parquetPruneSim(kOnly,
      Seq(("k", 100L, 200L), ("v", 0L, 10L))).collect()
    assert(mixed.length == 1)
    assert(mixed.head.getBoolean(2) && mixed.head.getLong(3) == 1L)
  }
}
