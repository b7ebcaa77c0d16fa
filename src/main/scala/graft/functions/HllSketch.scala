package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.xxhash64

/** Storable, mergeable HyperLogLog sketches — "sketch as data".
  *
  * Spark's `approx_count_distinct` answers one query and throws its
  * state away; at 100 TB the valuable artifact is the SKETCH: build one
  * per partition/day/source (one scan each), WRITE it (m bytes of
  * binary), and answer any later union's distinct count by merging
  * sketches — no rescan of the corpus, ever. This is the
  * Druid/ClickHouse/DataSketches deployment shape (Flajolet et al.
  * 2007 dense HLL; public algorithm).
  *
  * Layout: `1 << p` one-byte registers; value v routes to register
  * (hash >>> (64−p)) with rank = leading zeros of the remaining bits
  * + 1; a register keeps the max rank seen. Estimation uses the
  * harmonic mean with the standard small-range linear-counting
  * correction (rsd ≈ 1.04/√m — 1.6% at the default p=12's 4 KiB).
  *
  * Merge is element-wise register max — commutative, associative, and
  * LOSSLESS: `sketch(A ∪ B)` is BIT-IDENTICAL to
  * `merge(sketch(A), sketch(B))` (asserted in SketchesSpec), which is
  * what makes incremental maintenance exact rather than approximate-
  * on-top-of-approximate. Determinism: state depends only on the set
  * of hashes, never on partitioning or order — DiffConfig-safe.
  *
  * Inputs are pre-hashed longs (route any column through `xxhash64`,
  * see [[graft.operators.Sketches.hllSketch]]) so one aggregator
  * serves every input type with one canonical hash.
  */
object HllSketch {

  val DefaultP = 12

  /** rank of the sub-register bits: leading zeros + 1, capped so the
    * all-zero tail is representable. */
  private def rank(hash: Long, p: Int): Byte = {
    val w = hash << p
    val r = if (w == 0L) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
    (if (r > 64 - p + 1) 64 - p + 1 else r).toByte
  }

  /** hashed-long column → sketch (binary, `1 << p` bytes). Boxed input:
    * a null (the upstream null-value marker) is SKIPPED, matching
    * `count(DISTINCT ...)` / `approx_count_distinct` semantics — an
    * all-null column sketches to cardinality 0, not a phantom 1. */
  class SketchAgg(p: Int) extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
    private val m = 1 << p
    override def zero: Array[Byte] = new Array[Byte](m)
    override def reduce(b: Array[Byte], boxed: java.lang.Long): Array[Byte] = {
      if (boxed == null) return b
      val hash = boxed.longValue()
      val idx = (hash >>> (64 - p)).toInt
      val r = rank(hash, p)
      if (r > b(idx)) b(idx) = r
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeRegs(a, b)
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** sketch column → merged sketch (element-wise register max). Null
    * sketch values (e.g. an outer join's absent day) are skipped, like
    * nulls in [[SketchAgg]] — a missing sketch contributes nothing,
    * it doesn't poison the merge. */
  class MergeAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], s: Array[Byte]): Array[Byte] =
      if (s == null) b else mergeRegs(b, s)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a == null) b else if (b == null) a else mergeRegs(a, b)
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private[graft] def mergeRegs(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length,
      s"cannot merge HLL sketches of different precision (${a.length} vs ${b.length} registers)")
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) {
      out(i) = if (a(i) >= b(i)) a(i) else b(i)
      i += 1
    }
    out
  }

  /** Flajolet estimate with small-range linear counting. Deterministic
    * double arithmetic (one left-to-right pass over the registers). */
  def estimate(regs: Array[Byte]): Double = {
    if (regs.isEmpty) return 0.0
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m.toDouble * m.toDouble / invSum
    if (raw <= 2.5 * m && zeros > 0)
      m.toDouble * math.log(m.toDouble / zeros) // linear counting regime
    else raw
  }

  /** Column faces. `value` may be any type — it is canonically hashed
    * with xxhash64 before sketching; nulls are excluded from the
    * cardinality (count-distinct semantics). */
  def sketch(value: Column, p: Int = DefaultP): Column = {
    import org.apache.spark.sql.functions.when
    org.apache.spark.sql.functions.udaf(new SketchAgg(p), Encoders.LONG)
      .apply(when(value.isNotNull, xxhash64(value)))
  }

  def mergeSketches(sketchCol: Column): Column =
    org.apache.spark.sql.functions.udaf(new MergeAgg, Encoders.BINARY)
      .apply(sketchCol)

  def estimateCol(sketchCol: Column): Column =
    graft.plans.SketchExpressions.hllEstimate(sketchCol)
}
