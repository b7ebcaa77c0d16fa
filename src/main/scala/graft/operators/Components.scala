package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a duplicate-pair relation — the step that
  * turns near-dup PAIRS ([[Dedup.minhashLsh]], [[Dedup.jaccardPairs]],
  * [[Dedup.simhashPairs]]) into duplicate CLUSTERS, so a pipeline can keep
  * exactly one survivor per group. Transitive closure matters: if A~B and
  * B~C, keeping "one of each pair" independently can drop all three or
  * keep two; the correct unit of dedup is the component {A,B,C}.
  *
  * Not in the reference (its dedup surface ends at `drop_duplicates`,
  * pandasql/core.py:1221-1244); designed Spark-first as iterative
  * min-label propagation — the standard MapReduce-style formulation
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14: label-propagation family): every node starts labeled with
  * itself, each round every node takes the min label over itself and its
  * neighbors, fixpoint = each node labeled with its component's min id.
  * Each round is ONE keyed shuffle join plus ONE partial-agg min groupBy —
  * no driver-side graph, no assumption the edge set fits anywhere.
  *
  * Two faces, one step function:
  *  - [[clusterLabels]]: a FIXED number of unrolled rounds, pure lazy
  *    transformations (composable, plan-cacheable, safe to hold in a
  *    query registry that must not launch jobs). Correct when the
  *    component diameter is <= rounds — true for near-dup clusters,
  *    which are dense (every member pairs with most others, diameter
  *    2-3); the default 6 rounds covers diameter-6 chains.
  *  - [[connectedComponents]]: iterates the same step TO CONVERGENCE with
  *    a changed-label count per round, truncating lineage each round via
  *    `localCheckpoint` (without it, round N's plan nests N copies of the
  *    join — the classic iterative-algorithm lineage explosion). Use this
  *    when diameters are unknown (general graphs, web-link components).
  *
  * 100 TB posture: state per round is one (node, label) row per node —
  * O(V) not O(E); labels only ever decrease, so convergence is monotone;
  * rounds needed = component diameter (near-dup graphs: ~2-3). The
  * shuffles are plain hash-partitioned equi-joins AQE can coalesce and
  * skew-split (a celebrity node with millions of edges is a skewed join
  * key, not a broken algorithm).
  */
object Components {

  /** Symmetrized edge list (src, dst) WITH self-loops. The self-loop is
    * load-bearing for plan shape: "min over own + neighbors' labels" as a
    * join + union would reference the previous round's labels TWICE, so
    * an unrolled r-round lazy plan duplicates the upstream DAG 2^r times
    * (ComponentsProbe measured the 2-reference form at 549 s for r=6 on a
    * 250k-pair corpus vs ~3 s eager). With self-loops the whole round is
    * ONE join + ONE min groupBy over a single labels reference — plan
    * growth is linear in rounds, and every round shuffles the edge side
    * identically, so Spark reuses that exchange across rounds. */
  private def sym(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val nodes = e.select(col("src").as("n"))
      .union(e.select(col("dst").as("n"))).distinct()
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .union(nodes.select(col("n").as("src"), col("n").as("dst")))
  }

  /** One min-label round: every node takes min over its in-edges'
    * source labels (self-loops carry the node's own label). */
  private def step(sym: DataFrame, labels: DataFrame): DataFrame =
    sym.join(labels.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), col("label"))
      .groupBy("node").agg(min("label").as("label"))

  /** Lazy fixed-round component labels: (node, label) for every node that
    * appears in `pairs`, label = min node id reachable within `rounds`
    * hops (= the component's min id when diameter <= rounds). */
  def clusterLabels(
      pairs: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      rounds: Int = 6): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val s = sym(pairs, aCol, bCol)
    val init = s.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    (1 to rounds).foldLeft(init)((labels, _) => step(s, labels))
  }

  /** Eager converged component labels. Runs [[clusterLabels]]' step until
    * no label changes (or maxRounds), truncating lineage every round.
    * Returns a localCheckpoint-backed frame — already materialized. */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      maxRounds: Int = 50): DataFrame = {
    val s = sym(pairs, aCol, bCol).localCheckpoint() // edges reused every round
    var labels = s.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val next = step(s, labels).localCheckpoint()
      changed = next.withColumnRenamed("label", "next_label")
        .join(labels, "node")
        .filter(col("next_label") =!= col("label"))
        .count()
      labels = next
      round += 1
    }
    require(changed == 0,
      s"connectedComponents did not converge in $maxRounds rounds")
    labels
  }

  /** Keep one survivor per duplicate cluster: drops every doc whose
    * component label is not itself (the min-id member survives; docs in
    * no pair are untouched). Lazy — uses [[clusterLabels]]. */
  def dedupByCluster(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String,
      aCol: String = "a_id",
      bCol: String = "b_id",
      rounds: Int = 6): DataFrame = {
    val losers = clusterLabels(pairs, aCol, bCol, rounds)
      .filter(col("node") =!= col("label"))
      .select(col("node").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
