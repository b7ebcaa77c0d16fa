package graft

/** The bench forcing protocol, isolated in its own file so the sf1
  * staleness guard (Sf1BaselineGuardSpec) can hash exactly the two
  * sources whose change invalidates the committed sf1 record —
  * RefBench.scala (the measured query shapes) and this file (what
  * "fully evaluated" means) — without coupling the guard to
  * Bench.scala's telemetry plumbing, which can evolve freely.
  */
object BenchForce {

  /** Force FULL evaluation of a query result, final sort included.
    * A bare `count()` puts an Aggregate on top of the plan, and
    * Catalyst's EliminateSorts then drops any global ORDER BY beneath
    * it while column pruning empties the projection — so sorted shapes
    * (b_order, b_join, b_triple_join …) would time little more than
    * scan+join while the baseline engines fully sort and stringify
    * millions of rows. The noop DSv2 sink materializes every output
    * row and column AND keeps the top-level Sort (a write consumes its
    * input's ordering), without any disk cost — the standard Spark
    * benchmarking idiom (Release100Probe uses a real write for the
    * same reason). */
  def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()
}
