package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-stage salted aggregation.
  *
  * A `groupBy(k).agg(...)` with a hot key puts that key's entire volume in
  * one reducer. Salting splits each key into `saltFactor` sub-keys for a
  * partial aggregate, then combines the partials in a second (tiny)
  * aggregation — the hot key's work spreads across `saltFactor` tasks and
  * the second shuffle carries only `saltFactor` rows per key.
  *
  * (For joins, prefer AQE's skew-join handling — enabled by default; this
  * helper covers the aggregation side, which AQE does not re-balance.)
  */
object Skew {

  /** Specification: input column → (partial agg, final combine). */
  sealed trait SaltedAgg {
    def col: String; def out: String
  }
  case class SaltedSum(col: String, out: String) extends SaltedAgg
  case class SaltedCount(col: String, out: String) extends SaltedAgg
  case class SaltedMin(col: String, out: String) extends SaltedAgg
  case class SaltedMax(col: String, out: String) extends SaltedAgg
  /** mean decomposes into sum+count partials combined at the end */
  case class SaltedMean(col: String, out: String) extends SaltedAgg

  /** `df.groupBy(keys).agg(...)` with hot-key spreading. Deterministic:
    * the salt is a hash of the whole row's monotonically-increasing id —
    * only the partitioning changes, never the result. */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      aggs: Seq[SaltedAgg],
      saltFactor: Int = 16): DataFrame = {
    require(keys.nonEmpty && aggs.nonEmpty && saltFactor > 1)
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() * 31 + monotonically_increasing_id(), lit(saltFactor)))

    val partials: Seq[Column] = aggs.flatMap {
      case SaltedSum(c, o) => Seq(sum(c).as(s"__p_sum_$o"))
      case SaltedCount(c, o) => Seq(count(c).as(s"__p_cnt_$o"))
      case SaltedMin(c, o) => Seq(min(c).as(s"__p_min_$o"))
      case SaltedMax(c, o) => Seq(max(c).as(s"__p_max_$o"))
      case SaltedMean(c, o) =>
        Seq(sum(c).as(s"__p_sum_$o"), count(c).as(s"__p_cnt_$o"))
    }
    val stage1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)

    val finals: Seq[Column] = aggs.map {
      case SaltedSum(_, o) => sum(s"__p_sum_$o").as(o)
      case SaltedCount(_, o) => sum(s"__p_cnt_$o").as(o)
      case SaltedMin(_, o) => min(s"__p_min_$o").as(o)
      case SaltedMax(_, o) => max(s"__p_max_$o").as(o)
      case SaltedMean(_, o) =>
        (sum(s"__p_sum_$o") / sum(s"__p_cnt_$o")).as(o)
    }
    stage1.groupBy(keys.map(col): _*).agg(finals.head, finals.tail: _*)
  }
}
