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

/** One-pass fused token/char statistics for the text-curation signal
  * family — the counters every quality/langid/textstats signal derives
  * from, computed with ONE tokenize and ONE character scan per row:
  *
  *   n          whitespace token count            (= size(split(text,' ')))
  *   sum_len    Σ token lengths in codepoints     (= aggregate(toks,0L,acc+length(t)))
  *   n_distinct distinct tokens                   (= size(array_distinct(toks)))
  *   n_short    tokens with length <= 2           (= size(filter(toks, len<=2)))
  *   n_punct    codepoints outside [A-Za-z0-9\s]  (= length(regexp_replace(text,"[A-Za-z0-9\\s]","")))
  *   n_subword  maximal [A-Za-z]+ / [0-9]+ runs + single other non-space
  *              codepoints                        (= size(regexp_extract_all(text, ...)))
  *   hits[i]    tokens present in profiles(i)     (= size(filter(toks, contains)))
  *
  * The declarative equivalents (right column) run as interpreted
  * higher-order lambdas OUTSIDE whole-stage codegen and re-tokenize per
  * signal — q_langid alone evaluated four filter(split(...)) chains per
  * row, and the Catalyst trees they build dominate per-query planning
  * time (r19 verdict #5b). Every counter is an integer, and every public
  * TextAnalysis signal derives from them with exactly the same double
  * arithmetic as before, so scores are bit-identical (TextFusionSpec
  * pins old-vs-new equality per signal; the DuckDB oracle pins
  * cross-engine).
  *
  * `profiles` is a Seq-of-Seq (NEVER Array — case-class Array params
  * compare by reference and break canonicalized plan equality, the r19
  * MinHashSignature bug); the per-profile hash sets are @transient lazy
  * mirrors for the eval hot path. (CodegenFallback: the eval is one
  * tight JVM pass per row; fusion around it buys little.)
  */
case class TokenStats(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_short", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_subword", IntegerType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects string, got $other")
  }

  private val space = UTF8String.fromString(" ")

  @transient private lazy val profileSets: Array[java.util.HashSet[UTF8String]] =
    profiles.map { words =>
      val s = new java.util.HashSet[UTF8String](words.size * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  /** [A-Za-z0-9\s] with Java-regex default \s = [ \t\n\x0B\f\r]. */
  private def isWordOrSpace(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
      (cp >= '0' && cp <= '9') ||
      cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  private def isSpaceCp(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
  private def isLetterCp(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
  private def isDigitCp(cp: Int): Boolean = cp >= '0' && cp <= '9'

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    // token pass (split semantics identical to split(text, ' '))
    val toks = text.split(space, -1)
    val nProf = profileSets.length
    val hits = new Array[Int](nProf)
    val seen = new java.util.HashSet[UTF8String](toks.length * 2)
    var sumLen = 0L
    var nShort = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val len = t.numChars()
      sumLen += len
      if (len <= 2) nShort += 1
      seen.add(t)
      var p = 0
      while (p < nProf) {
        if (profileSets(p).contains(t)) hits(p) += 1
        p += 1
      }
      i += 1
    }
    // character pass (punct count + subword-run count), by codepoint so
    // astral chars count once, like length()/regexp over codepoints
    val s = text.toString
    var nPunct = 0
    var nSubword = 0
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      if (!isWordOrSpace(cp)) nPunct += 1
      if (isLetterCp(cp)) {
        nSubword += 1
        j += 1
        while (j < s.length && isLetterCp(s.charAt(j))) j += 1
      } else if (isDigitCp(cp)) {
        nSubword += 1
        j += 1
        while (j < s.length && isDigitCp(s.charAt(j))) j += 1
      } else {
        if (!isSpaceCp(cp)) nSubword += 1
        j += Character.charCount(cp)
      }
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(7)
    row.update(0, toks.length)
    row.update(1, sumLen)
    row.update(2, seen.size)
    row.update(3, nShort)
    row.update(4, nPunct)
    row.update(5, nSubword)
    row.update(6, new GenericArrayData(hits))
    row
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** one-pass fused token/char counters: struct(n, sum_len, n_distinct,
    * n_short, n_punct, n_subword, hits) — see [[TokenStats]]. */
  def tokenStats(text: Column, profiles: Seq[Seq[String]]): Column =
    GraftColumnBridge.column(
      TokenStats(GraftColumnBridge.expression(text), profiles))

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
