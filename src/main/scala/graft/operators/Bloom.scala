package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.plans.BloomExpressions

/** Bloom-filter join pruning — drop fact-side rows that CANNOT join
  * before they reach the shuffle.
  *
  * The dominant cost of `fact ⋈ dim` at 100 TB is shuffling the fact
  * side; when the dim side is selective (a filtered dimension, an
  * allowlist, yesterday's delta), most fact rows shuffle only to be
  * discarded by the join. The classic fix, used by every warehouse
  * runtime filter (and by Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter.*` injection, which only
  * fires within its size/selectivity thresholds and under AQE): build a
  * compact bloom filter over the dim keys, broadcast it, and probe it as
  * a scan-side residual filter on the fact table. A 1 % false-positive
  * sketch over 10 M keys is ~12 MB — it rides the stage's broadcast task
  * binary while removing ~99 % of the non-joining fact volume from the
  * exchange. False positives still shuffle but are removed by the real
  * join, so the composition is EXACT; false negatives are impossible, so
  * no joining row is lost.
  *
  * This operator is the deterministic, explicitly-placed form: the build
  * is `df.stat.bloomFilter` (one distributed aggregation pass over the
  * dim side — eager, like every index build), the probe is the codegen'd
  * [[graft.plans.BloomKeyMightContain]] sitting next to the scan's other
  * pushed filters, and the join that follows is an ordinary equi-join
  * Catalyst plans as usual (AQE can still broadcast or skew-split it).
  */
object Bloom {

  /** One distributed pass over `small` → a driver-side sketch of its
    * (non-null) `key` values. `expectedKeys` sizes the filter; when
    * absent, one cheap count over the key column sizes it exactly. */
  def buildFilter(
      small: DataFrame,
      key: String,
      expectedKeys: Option[Long] = None,
      fpp: Double = 0.01): BloomFilter = {
    val n = expectedKeys.getOrElse(
      math.max(1L, small.select(col(key)).na.drop().count()))
    small.stat.bloomFilter(key, n, fpp)
  }

  /** `big` with rows whose `bigKey` cannot appear in `small(smallKey)`
    * removed — an over-approximation of the join input (false positives
    * survive at rate ≤ fpp), never an under-approximation. */
  def prefilter(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedKeys: Option[Long] = None,
      fpp: Double = 0.01): DataFrame = {
    val bf = buildFilter(small, smallKey, expectedKeys, fpp)
    big.filter(BloomExpressions.mightContain(col(bigKey), bf))
  }

  /** Inner equi-join with the big side bloom-pruned before the shuffle.
    * Result is identical to `big.join(small, condition)` — the join
    * removes any false positives the sketch let through. */
  def prefilterJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedKeys: Option[Long] = None,
      fpp: Double = 0.01): DataFrame = {
    val pruned = prefilter(big, bigKey, small, smallKey, expectedKeys, fpp)
    pruned.join(small, pruned(bigKey) === small(smallKey))
  }
}
