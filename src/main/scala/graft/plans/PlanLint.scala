package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{ColumnarToRowExec, FileSourceScanExec, FilterExec, InputAdapter, SortExec, SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Pre-execution plan guardrails: the shapes that stay invisible on test
  * data and melt a 1000-executor cluster. Every rule here mirrors a
  * plan-shape assertion the test suite makes for the engine's own
  * operators (PlanShapeSpec) — this is the same discipline exposed as a
  * library call, for USER-composed plans the suite cannot know about.
  * Inspection reads the prepared physical plan (for AQE, the adaptive
  * node's `initialPlan` — EnsureRequirements applied, so exchanges are
  * visible) without launching any job.
  *
  * Findings, not failures: a cartesian product over two 100-row dims is
  * fine, and only the caller knows the cardinalities. `warn` = almost
  * always wrong at scale; `info` = load-bearing fact worth eyeballing.
  */
object PlanLint {

  final case class Finding(rule: String, severity: String, detail: String)

  /** The plan as it would execute: exchanges inserted, AQE unwrapped to
    * its pre-execution initial plan. Codegen collapse may or may not have
    * run (AQE defers it per stage) — matchers strip those wrappers.
    * `private[graft]` so plan-shape specs share the unwrap instead of
    * re-deriving the AdaptiveSparkPlanExec special case. */
  private[graft] def physicalPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }

  /** Strip execution-only wrappers so parent/child matches see the
    * logical operator shape (WholeStageCodegen, InputAdapter, the
    * parquet columnar→row transition). */
  private def strip(p: SparkPlan): SparkPlan = p match {
    case w: WholeStageCodegenExec => strip(w.child)
    case i: InputAdapter          => strip(i.child)
    case c: ColumnarToRowExec     => strip(c.child)
    case other                    => other
  }

  /** True when at least one predicate other than IsNotNull reached the
    * parquet reader. The typed accessor (`pushedDownFilters`) is protected
    * in FileSourceScanLike, so this reads the public `metadata` rendering
    * — the same string `.explain` prints as `PushedFilters: [...]`. Any
    * fragment not starting with "IsNotNull" marks a selective pushdown. */
  private def hasSelectivePushdown(scan: FileSourceScanExec): Boolean =
    scan.metadata.getOrElse("PushedFilters", "[]")
      .stripPrefix("[").stripSuffix("]")
      .split(",\\s*").exists(s => s.nonEmpty && !s.startsWith("IsNotNull"))

  /** Same test against the Avro DSv2 scan's description string
    * (`GraftAvroScan ... PushedFilters=[...]`): true only when an
    * entry beyond the planner's own IsNotNull guards pushed. A filter
    * like `abs(x) > 9 AND y IS NOT NULL` pushes only the null guard
    * while the selective computed conjunct stays residual-only — that
    * must still lint as a full decode. */
  private def avroSelectivePushdown(description: String): Boolean = {
    val at = description.indexOf("PushedFilters=[")
    at >= 0 && {
      val inner = description.substring(at + "PushedFilters=[".length)
      // a ']' can occur INSIDE an entry (In renders its value list in
      // brackets), so this cut can truncate — but only at a non-null-
      // guard entry, which by itself already decides the answer; a
      // pure IsNotNull list contains no inner bracket and parses fully
      inner.take(math.max(inner.indexOf(']'), 0))
        .split(",\\s*").exists(s => s.nonEmpty && !s.startsWith("IsNotNull"))
    }
  }

  /** True when a filter condition is nothing but null guards — the
    * IsNotNull conjunction the planner itself inserts on join/agg keys.
    * Flagging those as "unpushed" would mark every join over a parquet
    * scan; they prune nothing and were never a user predicate. */
  private def isNullGuardOnly(
      cond: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{And, IsNotNull}
    cond match {
      case And(l, r)    => isNullGuardOnly(l) && isNullGuardOnly(r)
      case _: IsNotNull => true
      case _            => false
    }
  }

  def lint(df: DataFrame): Seq[Finding] = {
    val plan = physicalPlan(df)
    val findings = Seq.newBuilder[Finding]

    // O(n*m) joins: row-count products, never viable when both sides scale
    plan.foreach {
      case _: CartesianProductExec =>
        findings += Finding("cartesian-product", "warn",
          "CartesianProduct joins every row with every row; at scale " +
            "prefer an equi/range key (see RangeJoinRule) or broadcast " +
            "the provably-small side")
      case j: BroadcastNestedLoopJoinExec =>
        findings += Finding("nested-loop-join", "warn",
          s"BroadcastNestedLoopJoin (${j.joinType}) scans the streamed side " +
            "once per broadcast row batch; joinable only while the " +
            "broadcast side stays tiny")
      case w: WindowExec if w.partitionSpec.isEmpty =>
        findings += Finding("single-partition-window", "warn",
          "window with empty PARTITION BY funnels EVERY row through one " +
            "task; partition the window or restate as an aggregate + join")
      case _ => ()
    }

    // a global sort not feeding a limit sorts the full dataset; fine as a
    // final presentation step, a scale bug in the middle of a pipeline
    val hasTopK = plan.exists(_.isInstanceOf[TakeOrderedAndProjectExec])
    val globalSorts = plan.collect {
      case s: SortExec if s.global => s
    }
    if (globalSorts.nonEmpty && !hasTopK)
      findings += Finding("global-sort", "info",
        s"${globalSorts.size} global sort(s) over the full dataset; if a " +
          "bounded head follows, use limit/nlargest (TakeOrderedAndProject)")

    // a Filter sitting directly on a parquet scan that pushed NOTHING:
    // the predicate shape defeated pushdown (computed expressions, UDFs),
    // so the scan reads every row group
    // pushedDownFilters is what actually reached the parquet reader;
    // dataFilters is only the candidate list, and IsNotNull is pushed for
    // any non-nullable predicate without pruning anything by itself
    plan.foreach {
      case f: FilterExec =>
        strip(f.child) match {
          case scan: FileSourceScanExec
              if scan.partitionFilters.isEmpty && !hasSelectivePushdown(scan)
                && !isNullGuardOnly(f.condition) =>
            // info, not warn: a computed-expression predicate (hash-
            // fraction sampling, model-score gate) READS the full scan BY
            // DESIGN — there is no raw restatement. The finding marks the
            // full-scan fact for eyeballing; a predicate that could have
            // been raw (cast-wrapped column, string op on a raw column)
            // is the case worth acting on.
            findings += Finding("unpushed-filter", "info",
              "filter over a scan where no selective predicate pushed to the " +
                "row groups — the predicate shape (computed expression / UDF) " +
                "defeats row-group pruning; if the predicate can be restated " +
                "on raw columns, do so or pre-materialize the column")
          // the Avro DSv2 scan (graft.sources.AvroDataSource): the
          // container format has no row-group stats, so ANY filter
          // above it decodes every record. When a SELECTIVE conjunct
          // pushed (description carries a PushedFilters entry beyond
          // bare null guards), the scan at least skips Catalyst
          // materialization of rejected rows; when nothing selective
          // pushed — nothing at all, or only the IsNotNull guards the
          // planner itself inserts, while the selective conjunct
          // (computed expression, unsupported type) stayed
          // residual-only — the decode-time skip buys nothing and the
          // case is worth eyeballing (promote the landing zone to
          // parquet first, then filter)
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
              if b.scan.description().startsWith("GraftAvroScan")
                && !avroSelectivePushdown(b.scan.description())
                && !isNullGuardOnly(f.condition) =>
            findings += Finding("avro-filter-full-decode", "info",
              "filter over an Avro container scan decodes every record " +
                "(the format carries no row-group stats) and no selective " +
                "conjunct pushed to the decode-time row skip; restate the " +
                "predicate on raw columns or promote the landing zone to " +
                "parquet and filter there")
          case _ => ()
        }
      case _ => ()
    }

    // broadcasting a relation whose rows carry array/binary payloads:
    // the broadcast side is COLLECTED to the driver and rebuilt as a
    // HashedRelation on every executor — payload bytes multiply by the
    // executor count. SCALEPROBE round-3 measured exactly this (shingle
    // arrays broadcast in a dedup confirm join: 229 s vs 33 s shuffled);
    // broadcast keys+ids, join payloads back by key instead
    plan.foreach {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
        val wide = b.child.output.filter(a =>
          a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
          a.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
          a.dataType == org.apache.spark.sql.types.BinaryType)
        if (wide.nonEmpty)
          findings += Finding("broadcast-wide-payload", "warn",
            s"broadcast side carries array/map/binary column(s) " +
              s"${wide.map(_.name).mkString(", ")}: payload bytes are " +
              "collected to the driver and shipped to every executor; " +
              "broadcast the keys and re-join the payload by key")
      case _ => ()
    }

    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }.size
    if (shuffles > 0)
      findings += Finding("shuffle-count", "info",
        s"$shuffles shuffle exchange(s); each is a full network pass over " +
          "its input — check keys line up so joins/aggs share partitioning")

    findings.result()
  }

  /** Human-readable lint report (empty string = nothing to report). */
  def report(df: DataFrame): String =
    lint(df).map(f => s"[${f.severity}] ${f.rule}: ${f.detail}").mkString("\n")
}
