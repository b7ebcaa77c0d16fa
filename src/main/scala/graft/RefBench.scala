package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.sources.PsIO

/** The reference's 8 benchmark query shapes (reference:
  * benchmarks/run_benchmark.py:11-151) ported onto the star schema so
  * rounds have a stable, reference-comparable suite:
  * books→orders (fact), authors→customer (dim), top_authors→a filtered
  * dim slice, ISBN/title→orderkey/priority, publication_year−birth_year
  * age→totalprice−acctbal spread. The dummy-key cross join of
  * big_join_select is kept verbatim (dummy=1 equi-key).
  *
  * All are registered as correctness queries too: 7 have DuckDB oracles;
  * b_limit (bare head-without-sort, core.py:978-995) is inherently
  * row-nondeterministic, so the driver records its rows-only check.
  */
object RefBench {

  private def t(s: SparkSession, dir: String, name: String): PsDataFrame =
    PsIO.readParquet(s, s"$dir/$name.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // order: sort desc on two cols + 3-col projection
    "b_order" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.sortValues(Seq("o_orderdate", "o_orderkey"), Seq(false, false))
        .select("o_orderkey", "o_orderdate", "o_totalprice").df
    }),

    // join_order: equi-join + derived col + sort desc + projection
    "b_join_order" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val j = o.merge(c, leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"))
      j.set("spread", j("o_totalprice") - j("c_acctbal"))
      j.select("o_orderkey", "c_name", "spread")
        .sortValues(Seq("spread", "o_orderkey"), Seq(false, false)).df
    }),

    // join_select: equi-join + derived col + selection
    "b_join_select" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val j = o.merge(c, leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"))
      j.set("spread", j("o_totalprice") - j("c_acctbal"))
      j.where(j("spread") > 300000)
        .select("o_orderkey", "c_name", "spread")
        .sortValues(Seq("o_orderkey")).df
    }),

    // big_join_select: dummy-key cross join + derived + selection
    // (reference fakes a cross join with dummy=1, run_benchmark.py:83-87)
    "b_big_join_select" -> ((s, dir) => {
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
      // The dummy-key join plans as a BroadcastNestedLoopJoin (supplier
      // broadcast, customer streamed), so the join's parallelism IS the
      // customer scan's — one task for a compacted single-row-group
      // file, with 15M combination evaluations serialized behind it.
      // Round-robin the streamed side up to the session's shuffle
      // parallelism when the scan is narrower (scale-adaptive: a scan
      // already wider than the session knob is left alone). Measured
      // 2.19 s -> 1.07 s at sf0.1; row set and order unchanged (the
      // trailing total sort fixes both).
      val c = PsDataFrame(graft.operators.SortFirst.widen(
        t(s, dir, "customer").select("c_custkey", "c_acctbal").df))
      sup.set("dummy", 1)
      c.set("dummy", 1)
      val j = sup.merge(c, on = Seq("dummy"))
      j.set("joint", j("s_acctbal") + j("c_acctbal"))
      j.where(j("joint") > 12000)
        .select("s_suppkey", "c_custkey", "joint")
        .sortValues(Seq("s_suppkey", "c_custkey")).df
    }),

    // join: plain inner equi-join, full output
    "b_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.merge(c, leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"))
        .select("o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment")
        .sortValues(Seq("o_orderkey")).df
    }),

    // triple_join: three-way chain (two equi-joins)
    "b_triple_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      li.merge(o, leftOn = Seq("l_orderkey"), rightOn = Seq("o_orderkey"))
        .merge(c, leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "o_custkey", "c_name")
        .sortValues(Seq("l_orderkey", "l_linenumber")).df
    }),

    // limit: bare head(n) — row-nondeterministic by definition (no sort);
    // rows-only correctness, time measures limit pushdown
    "b_limit" -> ((s, dir) => {
      t(s, dir, "orders").head(100).df
    }),

    // limit_sorted: the oracle-able twin of b_limit — same head(100) with
    // a total order pinned first, so the selected rows are deterministic
    // and the full rows/schema/hash oracle applies (plan-wise this is the
    // TakeOrderedAndProject path, vs b_limit's bare CollectLimit)
    "b_limit_sorted" -> ((s, dir) => {
      t(s, dir, "orders").sortValues(Seq("o_orderkey")).head(100).df
    }),

    // selection: (arith == const) | (string == const) predicate
    "b_selection" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.where(((o("o_totalprice").floorDiv(100000) + 1) === 4) ||
          (o("o_orderpriority") === "1-URGENT"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .sortValues(Seq("o_orderkey")).df
    })
  )

  def oracleSql: Map[String, String] = Map(
    "b_order" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
         ORDER BY o_orderdate DESC, o_orderkey DESC""",
    "b_join_order" ->
      """SELECT o_orderkey, c_name, o_totalprice - c_acctbal AS spread
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY spread DESC, o_orderkey DESC""",
    "b_join_select" ->
      """SELECT o_orderkey, c_name, o_totalprice - c_acctbal AS spread
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice - c_acctbal > 300000
         ORDER BY o_orderkey""",
    "b_big_join_select" ->
      """SELECT s_suppkey, c_custkey, s_acctbal + c_acctbal AS joint
         FROM supplier CROSS JOIN customer
         WHERE s_acctbal + c_acctbal > 12000
         ORDER BY s_suppkey, c_custkey""",
    "b_join" ->
      """SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "b_triple_join" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, o_custkey, c_name
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY l_orderkey, l_linenumber"""
    // b_limit: no oracle (unordered head) -> rows-only check;
    // b_limit_sorted is its fully-oracled deterministic twin
    ,
    "b_limit_sorted" ->
      """SELECT * FROM orders ORDER BY o_orderkey LIMIT 100""",
    "b_selection" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
         WHERE CAST(floor(o_totalprice / 100000.0) AS BIGINT) + 1 = 4
            OR o_orderpriority = '1-URGENT'
         ORDER BY o_orderkey"""
  )
}
