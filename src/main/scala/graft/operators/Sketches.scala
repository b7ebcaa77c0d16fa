package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates for interactive work over corpus-scale data —
  * the sketches that replace exact answers when the exact form is a
  * corpus-wide shuffle.
  *
  * The reference has no distinct-count or quantile aggregates at all (its
  * aggregate map is sum/count/mean/min/max/prod/any/all, reference
  * core.py:1076-1085); this is designed extension surface. Both sketches
  * are Spark built-ins and therefore partial-aggregating: every partition
  * reduces to one bounded sketch buffer (HyperLogLog++ registers /
  * KLL-style quantile summaries) before the exchange, so the shuffle
  * carries sketches, not values — an exact COUNT(DISTINCT) over a high-
  * cardinality key shuffles the key universe instead.
  *
  * Error contracts (asserted in SketchesSpec): approxDistinct's relative
  * standard deviation is the `rsd` parameter (default 5%);
  * approxQuantiles' rank error is bounded by 1/`accuracy`.
  */
object Sketches {

  /** HyperLogLog++ distinct count per group (ungrouped when `keys` empty). */
  def approxDistinct(
      df: DataFrame,
      valueCol: String,
      keys: Seq[String] = Nil,
      rsd: Double = 0.05): DataFrame = {
    val agg = approx_count_distinct(col(valueCol), rsd).as(s"approx_n_$valueCol")
    if (keys.isEmpty) df.agg(agg)
    else df.groupBy(keys.map(col): _*).agg(agg)
  }

  /** Approximate quantiles per group at the given probabilities.
    * `accuracy` trades memory for rank error (err ≤ 1/accuracy). */
  def approxQuantiles(
      df: DataFrame,
      valueCol: String,
      probabilities: Seq[Double],
      keys: Seq[String] = Nil,
      accuracy: Int = 10000): DataFrame = {
    val probs: Column = array(probabilities.map(lit): _*)
    val agg = percentile_approx(col(valueCol), probs, lit(accuracy))
      .as(s"approx_q_$valueCol")
    if (keys.isEmpty) df.agg(agg)
    else df.groupBy(keys.map(col): _*).agg(agg)
  }

  // ---- storable, mergeable HLL sketches ([[graft.functions.HllSketch]])

  /** aggregate: any column → a STORABLE HLL sketch (binary). Unlike
    * `approx_count_distinct`, the sketch persists: write one per
    * partition/day, answer any later union's distinct count by
    * [[hllMerge]] with no rescan — the incremental-maintenance shape. */
  def hllSketch(value: Column, p: Int = graft.functions.HllSketch.DefaultP): Column =
    graft.functions.HllSketch.sketch(value, p)

  /** aggregate: merge stored sketches (element-wise register max —
    * lossless: bit-identical to sketching the union directly). */
  def hllMerge(sketch: Column): Column =
    graft.functions.HllSketch.mergeSketches(sketch)

  /** scalar: approximate distinct count of a stored sketch
    * (rsd ≈ 1.04/√2ᵖ — 1.6% at the default p=12 / 4 KiB). */
  def hllEstimate(sketch: Column): Column =
    graft.functions.HllSketch.estimateCol(sketch)

  /** aggregate: string column → mergeable Misra-Gries heavy-hitters
    * sketch (map<string,long>, ≤ k keys, O(k) state per partition) —
    * every item with frequency > n/(k+1) guaranteed present, counts
    * under-report by at most n/(k+1). The fixed-memory alternative to
    * a full token groupBy for hot-key monitoring. */
  def heavyHitters(item: Column, k: Int = graft.functions.MgSketch.DefaultK): Column =
    graft.functions.MgSketch.sketch(item, k)

  // ---- storable, mergeable KLL quantile sketches ([[graft.functions.KllSketch]])

  /** aggregate: numeric column → a STORABLE KLL quantile sketch
    * (binary, O(k) doubles). Unlike `percentile_approx`, the sketch
    * persists: write one per partition/day, answer any later union's
    * quantiles by [[kllMerge]] with no rescan — the same incremental-
    * maintenance shape as [[hllSketch]]. */
  def kllSketch(value: Column, k: Int = graft.functions.KllSketch.DefaultK): Column =
    graft.functions.KllSketch.sketch(value, k)

  /** aggregate: merge stored KLL sketches (level-wise union +
    * recompaction; n/min/max are exact through any merge tree). */
  def kllMerge(sketch: Column): Column =
    graft.functions.KllSketch.mergeSketches(sketch)

  /** scalar: estimated value at quantile q of a stored sketch (rank
    * error O(n/k); q=0 / q=1 are the EXACT min / max). */
  def kllQuantile(sketch: Column, q: Double): Column =
    graft.functions.KllSketch.quantileCol(sketch, q)

  /** scalar: the sketch's exact value count (additive under merge). */
  def kllCount(sketch: Column): Column =
    graft.functions.KllSketch.countCol(sketch)
}
