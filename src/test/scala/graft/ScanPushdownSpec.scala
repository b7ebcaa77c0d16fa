package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PsIO

/** The scan must do the cutting: filters reach the parquet reader
  * (row-group / page skipping), projections prune the read schema
  * (columnar scans read only referenced columns), and partition-column
  * predicates prune directories before any file is opened. At 100 TB
  * these three are the difference between scanning terabytes and
  * scanning gigabytes — so they are asserted at the physical-plan level,
  * where a regression (e.g. a filter hidden behind a non-pushable
  * expression) is visible immediately.
  */
class ScanPushdownSpec extends AnyFunSuite with SparkFixture {

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.sparkPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))

  test("comparison filters push down to the parquet scan") {
    val li = PsIO.readParquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
    val q = li.where(li("l_quantity") > 45).select("l_orderkey", "l_quantity").df
    val scan = scanOf(q)
    assert(scan.dataFilters.nonEmpty, "filter did not reach the scan")
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThan(l_quantity"), s"PushedFilters: $pushed")
  }

  test("projection prunes the read schema to referenced columns") {
    val li = PsIO.readParquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
    val q = li.where(li("l_quantity") > 45).select("l_orderkey", "l_quantity").df
    val scan = scanOf(q)
    assert(scan.requiredSchema.fieldNames.toSet == Set("l_orderkey", "l_quantity"),
      s"scan reads ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("json path extraction still prunes the events scan to two columns") {
    // get_json_object is an opaque expression over props; column pruning
    // must still reach the scan — a JSON-extract aggregate that reads all
    // six event columns at 100 TB is wrong
    val ev = PsIO.readEventsNs(spark, "/root/testdata/sf0.001/events.parquet")
    val q = ev.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type").agg(sum("k").as("sum_k"))
    val scan = scanOf(q)
    assert(scan.requiredSchema.fieldNames.toSet == Set("event_type", "props"),
      s"scan reads ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("events loader: predicates push through the ts normalization to the scan") {
    // readEventsNs rewrites ts with a projection; a filter on an untouched
    // column must still reach the parquet scan below that projection —
    // otherwise every event-time query at 100 TB reads the full log
    val ev = PsIO.readEventsNs(spark, "/root/testdata/sf0.001/events.parquet")
    val q = ev.filter(col("event_type") === "click").select("event_id", "ts")
    val scan = scanOf(q)
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("EqualTo(event_type"), s"PushedFilters: $pushed")
    assert(scan.requiredSchema.fieldNames.toSet == Set("event_id", "ts", "event_type"),
      s"scan reads ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("writeSorted layout: a sort-key range filter reaches the scan as PushedFilters") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-sorted-scan").toString + "/out"
    PsIO.writeSorted(orders, dir, Seq("o_orderkey"), partitions = 4)
    val q = spark.read.parquet(dir).filter(col("o_orderkey") < 100L)
      .select("o_orderkey", "o_totalprice")
    val scan = scanOf(q)
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("LessThan(o_orderkey"), s"PushedFilters: $pushed")
    // with disjoint per-file ranges (IOSpec), this pushed filter is what
    // row-group stats pruning feeds on at scale
  }

  test("partition-column predicates prune partitions at the scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    PsIO.writePartitioned(docs, dir, Seq("lang"))
    val part = spark.read.parquet(dir)
    val nLangs = docs.select("lang").distinct().count()
    assert(nLangs > 1, "fixture needs several langs for pruning to mean anything")

    val q = part.filter(col("lang") === "en").select("doc_id", "lang")
    val scan = scanOf(q)
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
      s"no partition filter on lang: ${scan.partitionFilters}")
    // pruning is real: the selected partition count drops to 1 of N
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 selected partition, got ${scan.selectedPartitions.partitionCount} of $nLangs")
  }
}
