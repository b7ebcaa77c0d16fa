package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite with SparkFixture {

  private def one(text: String): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    Seq(Tuple1(text)).toDF("text")
  }

  test("tokenCount and subwordCount") {
    val r = one("the cat sat on 42 mats!").select(
      TextAnalysis.tokenCount(col("text")).as("t"),
      TextAnalysis.subwordCount(col("text")).as("sw")).head()
    assert(r.getInt(0) == 6)
    // the|cat|sat|on|42|mats|! -> 7
    assert(r.getInt(1) == 7)
  }

  test("punctRatio and meanTokenLen") {
    val r = one("ab!! cdef").select(
      TextAnalysis.punctRatio(col("text")).as("p"),
      TextAnalysis.meanTokenLen(col("text")).as("m")).head()
    assert(r.getDouble(0) == 2.0 / 9.0)
    assert(r.getDouble(1) == (4.0 + 4.0) / 2.0)
  }

  test("wordRatio counts every occurrence, not set-membership") {
    val r = one("the the cat").select(
      TextAnalysis.wordRatio(col("text"), TextAnalysis.EnglishStopwords).as("w"))
      .head()
    assert(r.getDouble(0) == 2.0 / 3.0)
  }

  test("langId picks the densest profile; 'und' when nothing matches") {
    val got = Seq(
      "der hund und die katze ist da",
      "le chat est un animal",
      "xyzzy qwerty").map { t =>
      one(t).select(TextAnalysis.langId(col("text"))).head().getString(0)
    }
    assert(got == Seq("de", "fr", "und"))
  }

  test("qualityScore stays within [0,1] and rewards clean text") {
    val clean = ("the quick brown fox jumps over the lazy dog " * 5).trim
    val noisy = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    val s = Seq(clean, noisy).map(t =>
      one(t).select(TextAnalysis.qualityScore(col("text"))).head().getDouble(0))
    s.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(s.head > s(1))
  }

  test("vocabulary and tfIdf compute exact counts and smoothed idf") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabulary(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(vocab("a") == (3L, 2L)) // 3 occurrences across 2 docs
    assert(vocab("b") == (1L, 1L))
    val tfidf = TextAnalysis.tfIdf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(4))).toMap
    assert(tfidf((1L, "a"))._1 == 2L)
    // smoothed idf: ln((N+1)/(df+1)) + 1, N=2
    assert(math.abs(tfidf((1L, "b"))._2 - (math.log(3.0 / 2.0) + 1.0)) < 1e-12)
    assert(math.abs(tfidf((1L, "a"))._2 - 1.0) < 1e-12) // df = N -> ln(1)+1
  }

  test("redactPii strips urls, emails, and phones; clean text untouched") {
    val got = one("see https://a.example/x?id=9 or mail bob.smith+x@corp.example.io" +
        " or call +1 (555) 010-9999 now")
      .select(TextAnalysis.redactPii(col("text")).as("c")).head().getString(0)
    assert(got == "see <URL> or mail <EMAIL> or call <PHONE> now")
    val clean = one("no pii here, just words and the number 7")
      .select(TextAnalysis.redactPii(col("text")).as("c")).head().getString(0)
    assert(clean == "no pii here, just words and the number 7")
  }

  test("n-gram repetition: counters, ratios, and degenerate docs") {
    def reps(text: String, n: Int): (Int, Int, Int) = {
      val r = one(text).select(
        TextAnalysis.ngramRepStats(col("text"), n).as("s")).head().getStruct(0)
      (r.getInt(0), r.getInt(1), r.getInt(2))
    }
    // "a b a b a": 2-grams = [a b, b a, a b, b a] -> total 4, top 2, dup 4
    assert(reps("a b a b a", 2) == (4, 2, 4))
    // all-distinct 2-grams: dup 0, top 1
    assert(reps("w x y z", 2) == (3, 1, 0))
    // shorter than n -> all zero
    assert(reps("one two", 3) == (0, 0, 0))

    def fracs(text: String): (Double, Double) = {
      val r = one(text).select(
        TextAnalysis.topNgramFrac(col("text"), 2).as("t"),
        TextAnalysis.dupNgramFrac(col("text"), 3).as("d")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    // 5 tokens, top 2-gram "a b" occurs 2x -> 2*2/5; 3-grams
    // [a b a, b a b, a b a] -> 2 of 3 positions duplicated
    assert(fracs("a b a b a") == (0.8, 2.0 / 3.0))
    assert(fracs("w x y z") == (0.5, 0.0)) // top 2-gram covers 2/4 tokens
    assert(fracs("solo") == (0.0, 0.0))
    // the spam case the token-level ratio understates: every token
    // repeats, AND every 3-gram position is a duplicate
    val (t, d) = fracs("buy now buy now buy now buy now")
    assert(t == 8.0 / 8.0 && d == 1.0)
    // overlapping occurrences of the top n-gram would push the raw ratio
    // past 1 ("a a a a": top 2-gram "a a" occurs 3x -> 3*2/4 = 1.5);
    // the clamp keeps the token-coverage reading in [0,1]
    assert(fracs("a a a a")._1 == 1.0)
  }

  test("dedupLines keeps first occurrences in place, drops later repeats") {
    def run(s: String) = one(s)
      .select(TextAnalysis.dedupLines(col("text")).as("d")).head().getString(0)
    assert(run("a\nb\na\nc\nb") == "a\nb\nc")
    assert(run("only line") == "only line") // no separator: untouched
    assert(run("x\nx\nx") == "x")
    // blank lines are lines too: first blank kept, later blanks dropped
    assert(run("a\n\nb\n\na") == "a\n\nb")
  }

  test("stripLines applies a precomputed hot set map-only, agreeing with stripCommonLines") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "keep\nBOILER\nkeep2"), (2L, "BOILER\nx"), (3L, "BOILER"))
      .toDF("doc_id", "text")
    val offline = graft.operators.Dedup.stripCommonLines(docs, "doc_id", "text", maxDf = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val online = docs.select(col("doc_id"),
        TextAnalysis.stripLines(col("text"), Seq("BOILER")).as("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(online == offline)
  }

  test("extractHtmlText: blocks dropped, tags spaced, entities decoded in order") {
    def ext(html: String): String =
      one(html).select(TextAnalysis.extractHtmlText(col("text"))).head().getString(0)
    // script/style bodies vanish even when they contain '<'; comments too
    assert(ext("<p>a</p><script>if (1 < 2) { x(); }</script><style>p<q{}</style>b") == "a b")
    assert(ext("x<!-- <p>not text</p> -->y") == "x y")
    // tags become spaces so block boundaries don't weld words
    assert(ext("<div>one</div><div>two</div>") == "one two")
    // entity decode, '&amp;' last: a literal '&amp;lt;' is '&lt;', not '<'
    assert(ext("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;") ==
      "a & b <tag> \"q\" 's'")
    assert(ext("escaped: &amp;lt;") == "escaped: &lt;")
    assert(ext("a&nbsp;&nbsp;b") == "a b") // nbsp then whitespace collapse
    // attributes with '>' safe forms, multi-line tags, case-insensitive blocks
    assert(ext("<a href=\"u\" title='t'>link</a>\n<SCRIPT>\nvar y;\n</SCRIPT>tail")
      == "link tail")
    // truncated crawl page: an UNCLOSED script/style/comment runs to
    // end-of-document — its code must be dropped, not emitted as prose
    assert(ext("<p>keep</p><script>var secret = 1 + 1;") == "keep")
    assert(ext("<p>keep</p><style>p { color: red; ") == "keep")
    assert(ext("<p>keep</p><!-- dangling comment") == "keep")
    // a closed block followed by an unclosed one: paired pass takes the
    // first, fallback takes the tail
    assert(ext("<script>a();</script><p>mid</p><script>b(") == "mid")
    // SELF-CLOSING script/style (XHTML crawl pages) must NOT trigger the
    // truncated-page fallback — the article body after them is real text
    assert(ext("<script src=\"a.js\"/><p>Entire article body</p>") ==
      "Entire article body")
    assert(ext("<style type='text/css'/>kept") == "kept")
  }

  test("normalization collapses whitespace and case for fingerprints") {
    val r = one("  The   QUICK fox ").select(
      TextAnalysis.fingerprintHex(TextAnalysis.normalized(col("text"))).as("a"))
      .head().getString(0)
    val r2 = one("the quick fox").select(
      TextAnalysis.fingerprintHex(col("text"))).head().getString(0)
    assert(r == r2)
  }
}
