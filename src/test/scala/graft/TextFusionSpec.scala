package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Differential gate for the fused one-pass [[graft.plans.TokenStats]]
  * signals (r20): every public TextAnalysis signal must be BIT-IDENTICAL
  * to the pre-fusion declarative higher-order-function form, which is
  * restated verbatim below as the in-test oracle. Edge cases the fused
  * character/token scans must reproduce exactly: empty string, leading/
  * trailing/double spaces (empty tokens), non-space whitespace (tabs and
  * newlines are NOT token separators but ARE \s for punct/subword),
  * non-ASCII letters (not [A-Za-z]), astral codepoints (one codepoint,
  * two UTF-16 units), and nulls.
  */
class TextFusionSpec extends AnyFunSuite with SparkFixture {

  // ---- the pre-r20 declarative forms, verbatim -----------------------
  private def oldTokenCount(text: Column): Column = size(split(text, " "))
  private def oldSubwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
  private def oldPunctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))
        .cast("double") / length(text))
  private def oldMeanTokenLen(text: Column): Column = {
    val toks = split(text, " ")
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks))
  }
  private def oldWordRatio(text: Column, words: Seq[String]): Column = {
    val toks = split(text, " ")
    val set = array(words.map(lit(_)): _*)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(set, t))).cast("double") / size(toks))
  }
  private def oldDupTokenRatio(text: Column): Column = {
    val toks = split(text, " ")
    when(size(toks) === 0, 0.0).otherwise(
      (size(toks) - size(array_distinct(toks))).cast("double") / size(toks))
  }
  private def oldLinearQualityScore(text: Column): Column = {
    val toks = split(text, " ")
    val nTok = size(toks)
    val nShort = size(filter(toks, t => length(t) <= 2))
    val nDigit = length(text) - length(regexp_replace(text, "[0-9]", ""))
    val nRep = nTok - size(array_distinct(toks))
    (lit(8) * nTok + length(text) - lit(16) * nShort -
      lit(4) * nDigit - lit(2) * nRep).cast("long")
  }
  private def oldLangId(text: Column): Column = {
    val scores = TextAnalysis.LangProfiles.map { case (lang, words) =>
      (lang, oldWordRatio(text, words))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when((s === best) && (s > 0), lang).otherwise(acc)
    }
  }
  private def oldQualityScore(text: Column): Column = {
    val lenScore = when(length(text).between(100, 10000), 1.0)
      .when(length(text) < 100, length(text).cast("double") / 100.0)
      .otherwise(0.5)
    val stopScore = least(oldWordRatio(text, TextAnalysis.EnglishStopwords) * 5.0, lit(1.0))
    val punctScore = lit(1.0) - least(oldPunctRatio(text) * 4.0, lit(1.0))
    val tokScore = when(oldMeanTokenLen(text).between(2.0, 12.0), 1.0).otherwise(0.3)
    (lenScore + stopScore + punctScore + tokScore) / 4.0
  }
  private def oldQualityReason(text: Column): Column =
    when(length(text) < 100, "too_short")
      .when(length(text) > 20000, "too_long")
      .when(oldPunctRatio(text) > 0.25, "high_punct")
      .when(oldDupTokenRatio(text) > 0.6, "repetitive")
      .when(oldMeanTokenLen(text) < 2.0 || oldMeanTokenLen(text) > 12.0,
        "weird_tokens")
      .otherwise(lit(null).cast("string"))

  // ---- fixtures -------------------------------------------------------
  private lazy val edgeDf = {
    val s = spark
    import s.implicits._
    Seq(
      Some(""),
      Some(" "),
      Some("  "),
      Some("a"),
      Some("the"),
      Some(" the  a  of "),
      Some("the quick brown fox jumps over the lazy dog and it is fine"),
      Some("der und die das ist von mit ein"),
      Some("le la les de et est un une"),
      Some("el la los de y es un una"),
      Some("de la"), // ambiguous: fr/es tie on shared markers
      Some("tab\tseparated\tnot tokens"),
      Some("line\nbreaks\nstay inside tokens"),
      Some("punct!!! #$% ^&*()"),
      Some("café touché résumé"),
      Some("emoji 😀 pair 🚀x2"),
      Some("digits 123 mix4ed a1b2c3"),
      Some("a a a a a b b b"),
      Some("x".repeat(150)),
      Some(("word " * 40).trim),
      Some("CRLF\r\nandvertical\ftab"),
      None
    ).toDF("text")
  }

  private lazy val docsDf =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def diff(df: org.apache.spark.sql.DataFrame,
                   oldC: Column, newC: Column, label: String): Unit = {
    val bad = df.select(oldC.as("o"), newC.as("n"))
      .filter(!(col("o") <=> col("n")))
    val rows = bad.collect()
    assert(rows.isEmpty, s"$label diverged on ${rows.length} rows, e.g. ${rows.take(3).mkString("; ")}")
  }

  private def checkAll(df: org.apache.spark.sql.DataFrame): Unit = {
    val t = col("text")
    diff(df, oldTokenCount(t), TextAnalysis.tokenCount(t), "tokenCount")
    diff(df, oldSubwordCount(t), TextAnalysis.subwordCount(t), "subwordCount")
    diff(df, oldPunctRatio(t), TextAnalysis.punctRatio(t), "punctRatio")
    diff(df, oldMeanTokenLen(t), TextAnalysis.meanTokenLen(t), "meanTokenLen")
    diff(df, oldWordRatio(t, TextAnalysis.EnglishStopwords),
      TextAnalysis.wordRatio(t, TextAnalysis.EnglishStopwords), "wordRatio(en)")
    diff(df, oldWordRatio(t, Seq("fox", "la")),
      TextAnalysis.wordRatio(t, Seq("fox", "la")), "wordRatio(custom)")
    diff(df, oldDupTokenRatio(t), TextAnalysis.dupTokenRatio(t), "dupTokenRatio")
    diff(df, oldLinearQualityScore(t), TextAnalysis.linearQualityScore(t),
      "linearQualityScore")
    diff(df, oldLangId(t), TextAnalysis.langId(t), "langId")
    diff(df, oldQualityScore(t), TextAnalysis.qualityScore(t), "qualityScore")
    diff(df, oldQualityReason(t), TextAnalysis.qualityReason(t), "qualityReason")
  }

  test("fused signals == declarative forms on edge-case strings") {
    checkAll(edgeDf)
  }

  test("fused signals == declarative forms on the sf0.001 documents corpus") {
    checkAll(docsDf.select(col("text")))
  }

  test("fused signals == declarative forms with codegen disabled") {
    val s = spark
    val key = "spark.sql.codegen.wholeStage"
    val prev = s.conf.get(key, "true")
    try {
      s.conf.set(key, "false")
      checkAll(edgeDf)
    } finally s.conf.set(key, prev)
  }
}
