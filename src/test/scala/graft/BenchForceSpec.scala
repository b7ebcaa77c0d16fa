package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** Bench methodology guards (advisor round-13 findings).
  *
  * 1. Timing via `count()` is NOT equivalent work for sorted shapes:
  *    the Aggregate on top lets Catalyst's EliminateSorts drop the
  *    final global ORDER BY and column pruning empty the projection,
  *    so a "sorted" benchmark measures scan+join while the baseline
  *    engine fully sorts. Bench.force's noop-sink write must retain
  *    the SortExec (write consumes its input's ordering). Both halves
  *    are asserted here so a future "simplify back to count()" edit
  *    fails loudly.
  *
  * 2. The fresh-JVM re-time parse must be anchored on the query name
  *    and reject drifted formats rather than grabbing a wrong number.
  */
class BenchForceSpec extends AnyFunSuite with SparkFixture {

  /** Run `work` and return the executed plans captured while it ran. */
  private def capturePlans(work: => Unit): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val plans = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.execution.SparkPlan]()
    val seen = new CountDownLatch(1)
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan; seen.countDown() }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try { work; assert(seen.await(30, TimeUnit.SECONDS), "no query execution captured") }
    finally spark.listenerManager.unregister(l)
    plans.synchronized(plans.toSeq)
  }

  private def sortedDf = {
    val s = spark
    import s.implicits._
    (1 to 500).map(i => (i % 37, s"v$i")).toDF("k", "v").orderBy("k", "v")
  }

  // plan text, AQE final plan included (collect() does not descend into
  // AdaptiveSparkPlanExec's current plan — it has no children)
  private def render(p: org.apache.spark.sql.execution.SparkPlan): String = p.toString

  test("count() elides the final sort — the methodology hole force() closes") {
    val plans = capturePlans { sortedDf.count(); () }
    assert(plans.nonEmpty && plans.forall(p => !render(p).contains("Sort [")),
      "expected the count() plan to contain NO Sort (EliminateSorts fires); " +
        "if Catalyst stops eliding it, force() can be simplified:\n" +
        plans.map(render).mkString("\n---\n"))
  }

  test("force() retains the final sort and materializes every column") {
    val plans = capturePlans(Bench.force(sortedDf))
    val rendered = plans.map(render)
    assert(rendered.exists(_.contains("Sort [")),
      s"noop-sink write lost the final SortExec:\n${rendered.mkString("\n---\n")}")
    // the write's input carries BOTH columns — no pruned-to-nothing scan
    assert(rendered.exists(r => r.contains("k#") && r.contains("v#")),
      s"expected the forced plan to carry both columns:\n${rendered.mkString("\n---\n")}")
  }

  test("retime parse is name-anchored and rejects drifted formats") {
    val ok = """{"metric":"total","queries":{"q_x":1.234},"ok":true}"""
    assert(Bench.parseRetimedMedian(ok, "q_x").contains(1.234))
    // multi-entry map: still finds the right one, exact-name only
    val multi = """{"queries":{"q_x":1.000,"q_xy":2.000}}"""
    assert(Bench.parseRetimedMedian(multi, "q_x").contains(1.0))
    assert(Bench.parseRetimedMedian(multi, "q_xy").contains(2.0))
    assert(Bench.parseRetimedMedian(multi, "q_").isEmpty, "prefix must not match")
    // wrong name, empty map, no queries object, non-numeric -> None
    assert(Bench.parseRetimedMedian(ok, "q_y").isEmpty)
    assert(Bench.parseRetimedMedian("""{"queries":{}}""", "q_x").isEmpty)
    assert(Bench.parseRetimedMedian("""{"metric":"total"}""", "q_x").isEmpty)
    assert(Bench.parseRetimedMedian("""{"queries":{"q_x":NaN}}""", "q_x").isEmpty)
    // regex-metacharacter names must be quoted, not interpreted
    assert(Bench.parseRetimedMedian("""{"queries":{"q.x":9.000}}""", "q_x").isEmpty)
  }
}
