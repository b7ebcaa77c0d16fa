package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-word shingles in ONE pass over the string.
  *
  * The declarative form — `transform(sequence(0, n-k), i →
  * concat_ws(' ', slice(split(text,' '), i+1, k)))` + `array_distinct` —
  * re-evaluates `split` for every shingle through interpreted lambda
  * dispatch; worse, when a plan broadcasts the shingle side of a join the
  * whole corpus re-tokenizes single-threaded on the driver. This
  * expression tokenizes once, emits each shingle once, and dedups with an
  * open-addressing set — ~50× the interpreted HOF chain.
  * (CodegenFallback: the eval itself is a single tight JVM pass; shingles
  * feed `explode` anyway, so whole-stage fusion around it buys little.)
  *
  * Output strings are identical to the declarative form (space-joined
  * token runs), so DuckDB oracle parity is unchanged.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects string, got $other")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].split(space, -1)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      val parts = new Array[UTF8String](k)
      System.arraycopy(toks, i, parts, 0, k)
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass k-gram repetition counters for Gopher-style quality filters:
  * `struct(total, top, dup)` where `total` = number of k-gram positions,
  * `top` = occurrence count of the most frequent k-gram, `dup` = number
  * of positions whose k-gram occurs more than once. One tokenize + one
  * hash count per row — the declarative alternative (explode → groupBy →
  * join back) costs a shuffle per n, this costs none; at 100 TB it is
  * part of the same single quality-scan as the other text signals.
  * All-zero struct when the document has fewer than k tokens.
  */
case class NgramRepStats(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("total", IntegerType, nullable = false),
    StructField("top", IntegerType, nullable = false),
    StructField("dup", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects string, got $other")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].split(space, -1)
    val n = toks.length - k + 1
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    if (n <= 0) { row.update(0, 0); row.update(1, 0); row.update(2, 0); return row }
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var i = 0
    while (i < n) {
      val parts = new Array[UTF8String](k)
      System.arraycopy(toks, i, parts, 0, k)
      counts.merge(UTF8String.concatWs(space, parts: _*), 1, Integer.sum)
      i += 1
    }
    var top = 0
    var dup = 0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
      if (c > 1) dup += c
    }
    row.update(0, n); row.update(1, top); row.update(2, dup)
    row
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization — the canonical-composition pass a dedup
  * pipeline runs BEFORE fingerprinting: "café" typed as e+combining-acute
  * (decomposed, 5 code points) and as precomposed é (4 code points) are
  * byte-different, so every hash-based dedup/fingerprint operator treats
  * them as distinct documents until normalized. Wraps the JDK's
  * `java.text.Normalizer` (the reference Unicode implementation); NFC is
  * what DuckDB's `nfc_normalize` implements, so results are cross-engine
  * verifiable. Fast path: `Normalizer.isNormalized` is O(n) with no
  * allocation and nearly all real text is already NFC, so the common row
  * pays one scan, no copy. (CodegenFallback: one JVM intrinsic call per
  * row; nothing to fuse.)
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** distinct k-word shingles (order of first occurrence). */
  def wordShingles(text: Column, k: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(text), k))

  /** Unicode NFC canonical composition (dedup preprocessing). */
  def nfcNormalize(text: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(text)))

  /** one-pass k-gram repetition counters: struct(total, top, dup). */
  def ngramRepStats(text: Column, k: Int): Column =
    GraftColumnBridge.column(NgramRepStats(GraftColumnBridge.expression(text), k))
}
