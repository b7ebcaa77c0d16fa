package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanLint

/** Registry-wide scale-guardrail sweep: every driver-contract query's
  * physical plan must draw zero warn-level PlanLint findings — the
  * shapes (cartesian products, nested-loop joins, single-partition
  * windows, pushdown-defeating filters, wide broadcasts) that pass on
  * test data and melt a 1000-executor cluster. Planning-only: lint reads
  * the prepared plan without launching the query's jobs (though a few
  * registry fns execute bounded index-build jobs while composing).
  *
  * The allowlist is the set of queries whose flagged shape is the
  * DELIBERATE semantics of the query, each with the reason inline; an
  * unlisted warn — e.g. a regression that turns an equi join into a
  * nested loop — fails the suite.
  */
class RegistryLintSpec extends AnyFunSuite with SparkFixture {

  private val sfDir = "/root/testdata/sf0.001"

  /** query -> warn rules that are the query's documented intent. */
  private val allow: Map[String, Set[String]] = Map(
    // explicit pandas-style cross join (`how='cross'`): the cartesian IS
    // the requested relation; callers own the cardinality
    "q_cross" -> Set("cartesian-product", "nested-loop-join"),
    // reference benchmark replays pandaSQL's dummy-key cross-join shape
    // (benchmarks/run_benchmark.py big_join_select) — spec parity
    "b_big_join_select" -> Set("cartesian-product", "nested-loop-join"),
    // ANN/similarity: the broadcast side is the BOUNDED index artifact
    // (centroids nCells·dim, codebooks m·nCodes·dsub, LSH planes, or the
    // bounded query batch with its embedding) — deliberately shipped to
    // every executor so the corpus never shuffles; the nested loop is the
    // scored-candidate loop over that bounded batch (Similarity.scala
    // scaladoc documents the bounds)
    "q_cosine_topk" -> Set("nested-loop-join", "broadcast-wide-payload"),
    "q_ann_lsh" -> Set("broadcast-wide-payload"),
    "q_ann_ivf" -> Set("broadcast-wide-payload"),
    "q_ann_pq" -> Set("nested-loop-join", "broadcast-wide-payload"),
    "q_ann_int8" -> Set("nested-loop-join", "broadcast-wide-payload"),
    "q_ann_ivfpq" -> Set("broadcast-wide-payload"),
    "q_embed_neardup" -> Set("broadcast-wide-payload"),
    "q_semdedup" -> Set("broadcast-wide-payload"),
    // single-row/array bound-broadcasts: qcut's quantile-boundary array
    // and tfIdf's corpus-total scalar ride a one-row nested-loop join
    "q_qcut" -> Set("nested-loop-join", "broadcast-wide-payload"),
    "q_tfidf" -> Set("nested-loop-join"),
    // one-row MG sketch (map of <= k entries) + one-row token total
    // cross into the exact-counts relation — bounded by construction
    "q_heavy_hitters" -> Set("nested-loop-join", "broadcast-wide-payload"),
    // the exclusive-scan window of the distributed prefix sum runs over
    // the PER-PARTITION SUMS relation — `partitions` rows, not the
    // corpus; the corpus-sized running sums are partitioned by __pid
    // (Sampling.selectByBudget step 2)
    "q_select_budget" -> Set("single-partition-window"),
    // inherits selectByBudget's bounded offsets window (same reason)
    "q_pipeline_release" -> Set("single-partition-window")
  )

  test("every registry query plans clean of warn-level PlanLint findings") {
    val s = spark
    val bad = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val warns =
        try PlanLint.lint(fn(s, sfDir)).filter(_.severity == "warn").map(_.rule).toSet
        catch { case e: Exception => Set(s"LINT-ERROR: ${e.getMessage}") }
      val unexpected = warns -- allow.getOrElse(name, Set.empty)
      if (unexpected.nonEmpty) bad += s"$name: ${unexpected.mkString(", ")}"
    }
    val findings = bad.result()
    assert(findings.isEmpty, findings.mkString("\n"))
  }
}
