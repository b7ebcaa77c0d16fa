package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Storable, mergeable KLL quantile sketch — the quantiles member of
  * the "sketch as data" family ([[HllSketch]] distinct counts,
  * [[MgSketch]] heavy hitters). Implements the public KLL algorithm
  * (Karnin, Lang, Liberty, "Optimal quantile approximation in
  * streams", FOCS 2016; the level/compaction layout follows the
  * paper, not any library's code).
  *
  * Spark's `percentile_approx` answers one query and discards its
  * state; at 100 TB the valuable artifact is the SKETCH: build one per
  * partition/day/source (one scan each), WRITE it (O(k) doubles of
  * binary), and answer any later union's quantiles by merging sketches
  * — no rescan, the same never-rescan shape as the HLL sketches.
  *
  * Layout: geometric levels of sorted-on-demand item buffers; an item
  * at level h carries weight 2^h. Level capacities shrink geometrically
  * from k at the top (factor 2/3, floor 8), so total state is O(k)
  * regardless of n. When full, the lowest over-capacity level is
  * sorted and every second item is promoted one level (the other half
  * is discarded — that halving is the entire approximation). The
  * compaction offset alternates deterministically with a PER-LEVEL
  * compaction counter instead of the paper's per-compactor random coin:
  * each level's own compactions strictly alternate even/odd offsets, so
  * successive halvings at one level cancel each other's rank bias (the
  * paper's expected-rank cancellation, derandomized), with zero RNG in
  * executors. A single global counter would NOT give this — with
  * multiple active levels a given level can draw the same parity many
  * times in a row and accumulate bias.
  *
  * Error contract: estimated rank error is O(n/k) (KLL's bound at
  * fixed failure probability; ~1% of n at the default k=256 — the
  * registry query and KllSpec pin measured bounds with margin). min
  * and max are tracked EXACTLY, so quantile(0)/quantile(1) are the
  * true extremes, and `n` is exact (additive under merge).
  *
  * DETERMINISM CAVEAT — like [[MgSketch]] (and unlike [[HllSketch]]):
  * a stored KLL sketch's exact item contents depend on partitioning
  * and merge order. Only n/min/max and the rank-error BOUND are stable.
  * Never hash-compare or differential-config-test raw sketch bytes or
  * raw quantile estimates; compare bound predicates derived from them
  * (what q_kll_quantiles pins).
  */
object KllSketch {

  val DefaultK = 256

  /** Mutable sketch state. Kryo-encoded as the aggregation buffer;
    * serialized to the compact binary layout ([[serialize]]) when
    * finished/stored. */
  final class State(val k: Int) extends Serializable {
    var n: Long = 0L
    var compactions: Long = 0L
    var minV: Double = Double.PositiveInfinity
    var maxV: Double = Double.NegativeInfinity
    /** levels(h) holds items of weight 2^h, unsorted between compactions. */
    var levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
    /** levelCompactions(h) = how many times level h has compacted —
      * drives the per-level offset alternation, so it is REAL state
      * (serialized; summed per level under merge): dropping it across a
      * store/merge cycle would restart every level at even parity and
      * reintroduce the bias the alternation cancels. */
    var levelCompactions: ArrayBuffer[Long] = ArrayBuffer(0L)

    // Hot-path bookkeeping, NOT serialized state: capacities depend only
    // on (k, depth-from-top) and item/capacity totals change
    // incrementally, so the per-value update is O(1) — the naive
    // recompute (an O(levels) loop with a math.pow per level per value)
    // costs tens of millions of transcendental calls per partition at
    // SketchScaleProbe's ×100 volume. Rebuilt after deserialize/merge
    // (transient: kryo may bypass the constructor).
    @transient private var capTable: Array[Int] = _
    @transient private var items: Int = 0
    @transient private var capTotal: Int = 0

    private[KllSketch] def rebuildCaps(): Unit = {
      capTable = Array.tabulate(levels.length) { h =>
        val depth = levels.length - 1 - h
        math.max(8, math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt)
      }
      capTotal = capTable.sum
      items = 0
      levels.foreach(items += _.length)
    }
    private def ensureCaps(): Unit =
      if (capTable == null || capTable.length != levels.length) rebuildCaps()

    def update(x: Double): Unit = {
      ensureCaps()
      n += 1
      if (x < minV) minV = x
      if (x > maxV) maxV = x
      levels(0) += x
      items += 1
      if (items > capTotal) compactOnce()
    }

    /** Sort the lowest over-capacity level, promote every second item
      * (deterministically alternating offset), leave an odd remainder
      * behind. Pigeonhole guarantees such a level exists whenever
      * items > capTotal. */
    private def compactOnce(): Unit = {
      var h = 0
      while (h < levels.length && levels(h).length < capTable(h)) h += 1
      if (h == levels.length) h = levels.length - 1 // safety; shouldn't happen
      val buf = levels(h)
      val sorted = buf.toArray
      java.util.Arrays.sort(sorted)
      val evenCount = (sorted.length / 2) * 2
      val offset = (levelCompactions(h) & 1L).toInt
      levelCompactions(h) += 1
      compactions += 1
      val addLevel = h + 1 == levels.length
      if (addLevel) {
        levels += ArrayBuffer.empty[Double]
        levelCompactions += 0L
      }
      val up = levels(h + 1)
      var i = offset
      while (i < evenCount) { up += sorted(i); i += 2 }
      buf.clear()
      if (evenCount < sorted.length) buf += sorted(sorted.length - 1)
      if (addLevel) rebuildCaps() // depths shifted for every level
      else items -= evenCount / 2 // half the compacted pairs discarded
    }

    def mergeIn(other: State): State = {
      // An n=0 sketch is mathematically mergeable at ANY k (it carries
      // no items, no compactions, ±inf extremes): MergeAgg.finish
      // serializes an all-null/absent group as an empty DefaultK
      // sketch, so a stored rollup row must not poison later merges
      // into a differently-parameterized sketch column. The loud
      // failure stays for two NON-empty sketches of different k.
      if (other.n == 0L) return this
      if (n == 0L && k != other.k) return other // adopt the non-empty side's k
      require(k == other.k,
        s"cannot merge non-empty KLL sketches of different k ($k vs ${other.k})")
      n += other.n
      compactions += other.compactions
      if (other.minV < minV) minV = other.minV
      if (other.maxV > maxV) maxV = other.maxV
      while (levels.length < other.levels.length) {
        levels += ArrayBuffer.empty[Double]
        levelCompactions += 0L
      }
      var h = 0
      while (h < other.levels.length) {
        levels(h) ++= other.levels(h)
        levelCompactions(h) += other.levelCompactions(h)
        h += 1
      }
      rebuildCaps()
      while (items > capTotal) compactOnce()
      this
    }
  }

  // ------------------------------------------------------ binary layout
  // int magic+version ("KL"<<16 | 2) | int k | long n |
  // long compactions | double min | double max | int numLevels |
  // per level: long levelCompactions, int size, size doubles.
  // Big-endian. The magic makes a layout change LOUD: stored sketches
  // are durable artifacts ("write per batch, merge later"), so a silent
  // misaligned read of an older format must be impossible — deserialize
  // rejects unknown versions with the stored-vs-supported pair instead
  // of building a corrupt sketch. (n stays at fixed offset 8 — [[count]]
  // reads it without materializing the buffers.)

  private[graft] val FormatVersion: Int = ('K' << 24) | ('L' << 16) | 2

  def serialize(st: State): Array[Byte] = {
    var bytes = 4 + 4 + 8 + 8 + 8 + 8 + 4
    st.levels.foreach(l => bytes += 8 + 4 + 8 * l.length)
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(FormatVersion)
    bb.putInt(st.k).putLong(st.n).putLong(st.compactions)
      .putDouble(st.minV).putDouble(st.maxV).putInt(st.levels.length)
    var h = 0
    while (h < st.levels.length) {
      bb.putLong(st.levelCompactions(h))
      bb.putInt(st.levels(h).length)
      st.levels(h).foreach(bb.putDouble)
      h += 1
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val ver = bb.getInt
    require(ver == FormatVersion,
      f"unsupported KLL sketch format 0x$ver%08x (supported: 0x$FormatVersion%08x) " +
        "— the sketch was stored by an incompatible library version; " +
        "rebuild it from source data")
    val st = new State(bb.getInt)
    st.n = bb.getLong
    st.compactions = bb.getLong
    st.minV = bb.getDouble
    st.maxV = bb.getDouble
    val numLevels = bb.getInt
    st.levels = ArrayBuffer.fill(numLevels)(ArrayBuffer.empty[Double])
    st.levelCompactions = ArrayBuffer.fill(numLevels)(0L)
    var h = 0
    while (h < numLevels) {
      st.levelCompactions(h) = bb.getLong
      val size = bb.getInt
      var i = 0
      while (i < size) { st.levels(h) += bb.getDouble; i += 1 }
      h += 1
    }
    st
  }

  // ------------------------------------------------------ estimation

  /** Estimated value at quantile q ∈ [0,1] of a stored sketch: walk the
    * weight-sorted items to cumulative weight ≥ ceil(q·n). q=0 / q=1
    * return the EXACT tracked min / max. */
  def quantile(bytes: Array[Byte], q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0,1]")
    val st = deserialize(bytes)
    if (st.n == 0L) return Double.NaN
    if (q == 0.0) return st.minV
    if (q == 1.0) return st.maxV
    val items = weighted(st)
    val target = math.max(1L, math.ceil(q * st.n).toLong)
    var cum = 0L
    var i = 0
    while (i < items.length) {
      cum += items(i)._2
      if (cum >= target) return items(i)._1
      i += 1
    }
    st.maxV
  }

  /** Estimated number of stored values < x (lower rank). */
  def rank(bytes: Array[Byte], x: Double): Long = {
    val st = deserialize(bytes)
    var r = 0L
    var h = 0
    while (h < st.levels.length) {
      val w = 1L << h
      st.levels(h).foreach(v => if (v < x) r += w)
      h += 1
    }
    r
  }

  /** Exact stored-value count (additive under merge). Reads n at its
    * fixed offset (after the 4-byte magic and 4-byte k) — no
    * level-buffer materialization for a scalar every rollup row
    * projects. Validates the magic first: a misaligned read of a
    * foreign format must fail loudly, not return a garbage count. */
  def count(bytes: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val ver = bb.getInt(0)
    require(ver == FormatVersion,
      f"unsupported KLL sketch format 0x$ver%08x (supported: 0x$FormatVersion%08x)")
    bb.getLong(8)
  }

  private def weighted(st: State): Array[(Double, Long)] = {
    val out = ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < st.levels.length) {
      val w = 1L << h
      st.levels(h).foreach(v => out += (v -> w))
      h += 1
    }
    out.sortBy(_._1).toArray
  }

  // ------------------------------------------------------ aggregators

  /** double column → KLL sketch (binary). Nulls are skipped (an
    * all-null column sketches to n=0), matching the HLL/MG family. */
  class SketchAgg(k: Int) extends Aggregator[java.lang.Double, State, Array[Byte]] {
    require(k >= 8)
    override def zero: State = new State(k)
    override def reduce(b: State, boxed: java.lang.Double): State = {
      if (boxed != null) b.update(boxed.doubleValue())
      b
    }
    override def merge(a: State, b: State): State = a.mergeIn(b)
    override def finish(b: State): Array[Byte] = serialize(b)
    override def bufferEncoder: Encoder[State] = Encoders.kryo[State]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** sketch column → merged sketch. Null sketches (an outer join's
    * absent day) contribute nothing. */
  class MergeAgg extends Aggregator[Array[Byte], State, Array[Byte]] {
    override def zero: State = new State(-1) // placeholder until first real sketch
    private def combine(a: State, s: State): State =
      if (a.k == -1) s else if (s.k == -1) a else a.mergeIn(s)
    override def reduce(b: State, bytes: Array[Byte]): State =
      if (bytes == null) b else combine(b, deserialize(bytes))
    override def merge(a: State, b: State): State = combine(a, b)
    override def finish(b: State): Array[Byte] =
      if (b.k == -1) serialize(new State(DefaultK)) else serialize(b)
    override def bufferEncoder: Encoder[State] = Encoders.kryo[State]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ------------------------------------------------------ column faces

  /** numeric column → storable KLL sketch (values cast to double). */
  def sketch(value: Column, k: Int = DefaultK): Column =
    org.apache.spark.sql.functions.udaf(new SketchAgg(k), Encoders.DOUBLE)
      .apply(value.cast("double"))

  def mergeSketches(sketchCol: Column): Column =
    org.apache.spark.sql.functions.udaf(new MergeAgg, Encoders.BINARY)
      .apply(sketchCol)

  def quantileCol(sketchCol: Column, q: Double): Column =
    graft.plans.SketchExpressions.kllQuantile(sketchCol, q)

  def countCol(sketchCol: Column): Column =
    graft.plans.SketchExpressions.kllCount(sketchCol)
}
