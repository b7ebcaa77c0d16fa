package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = Session.local(cores = 4, appName = "graft-test")
}

trait SparkFixture extends BeforeAndAfterAll { this: org.scalatest.Suite =>
  def spark: SparkSession = TestSpark.spark

  /** Stop a streaming query deterministically: `stop()` interrupts and
    * joins the execution thread, then `awaitTermination` confirms no
    * micro-batch is still in flight. Suppresses the query's own failure
    * (already surfaced to the test through processAllAvailable) so a
    * `finally` stopping several queries cannot leak the later ones. */
  def stopStream(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    try q.stop()
    catch { case scala.util.control.NonFatal(_) => () }
    try { q.awaitTermination(30000); () }
    catch { case scala.util.control.NonFatal(_) => () }
  }

  override protected def afterAll(): Unit = {
    // A test that fails between start() and its finally can leak a live
    // query whose ProcessingTimeExecutor keeps planning micro-batches
    // until JVM exit and then dies racing the shared session's shutdown
    // hook ("SparkContext has been shutdown"). Sweep leaks per suite so
    // nothing streams across suite boundaries or into teardown.
    spark.streams.active.foreach(stopStream)
    super.afterAll()
  }
}
