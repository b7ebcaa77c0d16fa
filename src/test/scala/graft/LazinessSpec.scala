package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

/** Compose-time laziness, engine-wide: DECLARING a query must not
  * materialize anything — execution belongs to the action. This is the
  * regression guard for the eager-at-compose class of defect (round 2's
  * tfIdf `docs.count()`, round 3-4's ivfTopK compose-time Lloyd
  * training): any new query entry that sneaks a collect/count/head into
  * composition fails here by name.
  *
  * Reading a source does schedule bounded METADATA jobs at compose time
  * (parquet footer reads, csv/json schema inference) — those are the
  * price of schema resolution, not hidden materialization, and are
  * recognized by their scan-shaped callsites. Anything else (collect at
  * / count at / head at ...) is an offender.
  */
class LazinessSpec extends AnyFunSuite with SparkFixture {

  /** Queries whose compose legitimately computes: the reference's
    * per-column agg sugar (`df("c").sum()`) returns driver-side scalars
    * by API contract. */
  private val eagerByDesign = Set("q_colagg")

  /** callSite.short forms of schema-resolution scan jobs. */
  private def isMetadataScan(cs: String): Boolean =
    cs.startsWith("parquet at") || cs.startsWith("csv at") ||
      cs.startsWith("json at") || cs.startsWith("load at")

  test("composing every SparkEntry query materializes nothing") {
    val dir = "/root/testdata/sf0.001"
    val callsites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        // the job's callsite is the name of its final stage
        // (e.g. "parquet at PsIO.scala:20", "collect at Foo.scala:7")
        jobStart.stageInfos.lastOption.foreach(si => callsites.add(si.name))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // warm-up compose: one-time per-process setup (the IVF index
      // build, ingestion fixtures) is allowed its jobs ONCE — a second
      // compose must then be metadata-only
      SparkEntry.queries.foreach { case (_, f) => f(spark, dir) }
      awaitQuiescent(callsites)
      callsites.clear()

      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, f) if !eagerByDesign.contains(name) =>
          f(spark, dir) // compose only — no action
          awaitQuiescent(callsites)
          val bad = scala.jdk.CollectionConverters
            .CollectionHasAsScala(callsites).asScala.toList
            .filterNot(isMetadataScan)
          callsites.clear()
          if (bad.nonEmpty) Some(s"$name -> ${bad.mkString("; ")}") else None
        case _ => None
      }
      assert(offenders.isEmpty,
        s"queries materialized at compose time:\n  ${offenders.mkString("\n  ")}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** listener delivery is async: poll until no new job-start events for
    * two consecutive 50 ms windows. */
  private def awaitQuiescent(q: java.util.Queue[String]): Unit = {
    var last = -1
    var stable = 0
    var spins = 0
    while (stable < 2 && spins < 100) {
      Thread.sleep(50)
      if (q.size == last) stable += 1 else { stable = 0; last = q.size }
      spins += 1
    }
  }
}
