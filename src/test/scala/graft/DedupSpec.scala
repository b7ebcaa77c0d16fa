package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite with SparkFixture {

  private def docs = {
    val s = spark
    import s.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = ((1 to 30).map(i => s"w$i").updated(14, "CHANGED")).mkString(" ")
    val other = (101 to 130).map(i => s"z$i").mkString(" ")
    Seq((1L, base), (2L, nearDup), (3L, other), (4L, base))
      .toDF("doc_id", "text")
  }

  test("exact dedup keeps first row per key under the given order") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "k1", "a"), (2L, "k1", "b"), (3L, "k2", "c"))
      .toDF("id", "k", "v")
    val kept = Dedup.exact(d, Seq("k"), Seq(col("id")))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("shingles: content, order, dedup, short-text guard") {
    val s = spark
    import s.implicits._
    val d = Seq(Tuple1("a b c d"), Tuple1("a b")).toDF("text")
    val got = d.select(Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got.head == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty) // fewer tokens than k
  }

  test("jaccardPairs finds only the near-dup pairs, with exact scores") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    // 1-4 identical (jac 1.0); 1-2 and 2-4 near-dups; 3 matches nothing
    assert(keys == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    val exact = pairs.find(p => (p._1, p._2) == (1L, 4L)).get._3
    assert(exact == 1.0)
  }

  test("minhashLsh agrees with exact jaccardPairs on the same corpus") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("maxDf cap drops stop-shingle fan-out") {
    val s = spark
    import s.implicits._
    // every doc shares the degenerate shingle "x x x"
    val d = (1L to 5L).map(i => (i, s"x x x a$i b$i c$i")).toDF("doc_id", "text")
    val capped = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.1, maxDf = Some(2))
    assert(capped.count() == 0) // shared shingle removed -> no candidates
    // the cap must act BEFORE posting lists materialize (anti-join on the
    // hot-shingle set), so a df-in-the-millions shingle never builds a
    // multi-GB collect_list buffer row
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(800))
  }

  test("hot-set broadcast has an opt-out that degrades, not fails") {
    val s = spark
    import s.implicits._
    val d = (1L to 5L).map(i => (i, s"x x x a$i b$i c$i")).toDF("doc_id", "text")
    // default: forced broadcast anti-join (the measured 2.1x-faster shape)
    val forced = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.1, maxDf = Some(2))
    assert(forced.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    // opt-out: same rows, but the planner is free to shuffle the anti-join
    // (the escape hatch for a hot set past the broadcast/driver limit)
    s.conf.set("spark.graft.dedup.broadcastHotSet", "false")
    try {
      val free = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.1, maxDf = Some(2))
      assert(free.count() == forced.count())
      val lp = free.queryExecution.optimizedPlan.toString
      assert(!lp.contains("ResolvedHint"), lp.take(400))
    } finally s.conf.unset("spark.graft.dedup.broadcastHotSet")
  }

  test("simhash: near-dups land close in Hamming space, others far") {
    val fps = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fps(1L) == fps(4L)) // identical text -> identical fingerprint
    assert(ham(fps(1L), fps(2L)) < ham(fps(1L), fps(3L)))
  }

  test("simhashPairs equals the brute-force hamming scan (banding is exact)") {
    val d = maxHamming(docs)
    val banded = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == d)
    // the planted near-dup pair and the identical pair are both present
    val keys = banded.map(p => (p._1, p._2))
    assert(keys.contains((1L, 4L)) && keys.contains((1L, 2L)))
    assert(banded.find(p => (p._1, p._2) == (1L, 4L)).get._3 == 0)
  }

  test("simhashPairs maxBucket cap drops hot-bucket fan-out") {
    // at maxHamming=59 every doc shares block values with every other via
    // tiny blocks; a cap of 1 kills all candidates
    val capped = Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 20, maxBucket = Some(1))
    assert(capped.count() < maxHamming(docs).size)
  }

  /** Driver-side brute-force hamming pairs at d=20 for the fixture. */
  private def maxHamming(d: org.apache.spark.sql.DataFrame) = {
    val fps = Dedup.simhash(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 20
    } yield (a, b, h)).toSet
  }

  test("simhashPairs d=3 candidate volume is bucket-bounded, d=8 degrades") {
    val s = spark
    import s.implicits._
    // 120 random-token docs -> ~uniform 60-bit fingerprints, so candidate
    // volume is governed purely by block width (bucket count per block)
    val rnd = new scala.util.Random(99)
    val d = (1L to 120L)
      .map(i => (i, Seq.fill(30)("t" + rnd.nextInt(100000)).mkString(" ")))
      .toDF("doc_id", "text")
    def volume(maxHamming: Int): Long =
      Dedup.simhashBlocks(d, "doc_id", "text", maxHamming)
        .groupBy("blk", "v").count()
        .agg(coalesce(sum((col("count") * (col("count") - 1) / 2).cast("long")), lit(0L)))
        .head().getLong(0)
    val brute = 120L * 119 / 2
    val v3 = volume(3) // 15-bit blocks: ~32k bucket values each
    val v8 = volume(8) // 6-7-bit blocks: 64-128 bucket values each
    assert(v3 <= brute / 50,
      s"d=3 candidates $v3 not bucket-bounded vs brute $brute")
    assert(v8 >= brute / 20,
      s"expected d=8 to degrade toward all-pairs, got $v8 vs brute $brute")
    assert(v8 > 10 * math.max(v3, 1L),
      s"d=8 volume $v8 should dwarf d=3 volume $v3 — the declared query must use d=3")
  }

  test("sharedSpanPairs finds exactly the long-run overlaps") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "p q r s t u v"),             // 5-shingles pqrst qrstu rstuv
      (2L, "x x p q r s t y y"),         // shares run "p q r s t" with 1
      (3L, "q r s t u a b"),             // shares run "q r s t u" with 1
      (4L, "completely different words here today"),
      (5L, "p q r s t u v w"))           // shares a 7-token run with 1
      .toDF("doc_id", "text")
    val got = Dedup.sharedSpanPairs(docs, "doc_id", "text", spanTokens = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // a shared m-token run yields m-k+1 distinct spans: (1,5) share 7 -> 3
    assert(got == Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (1L, 5L) -> 3L,
      (2L, 5L) -> 1L, (3L, 5L) -> 1L))
    // maxDf cap drops spans hotter than the cap -> conservative lower bound
    val capped = Dedup.sharedSpanPairs(docs, "doc_id", "text",
      spanTokens = 5, maxDf = Some(1)).count()
    assert(capped == 0L)
  }

  test("hash60 matches the cross-engine constant (DuckDB parity)") {
    val s = spark
    import s.implicits._
    // DuckDB: select ('0x'||substr(md5('tok'),1,15))::BIGINT -> 435407939895074749
    val got = Seq(Tuple1("tok")).toDF("t")
      .select(Dedup.hash60(col("t"))).head().getLong(0)
    assert(got == 435407939895074749L)
  }

  test("crossJaccardPairs reports only cross-corpus hits, never within-side") {
    val s = spark
    import s.implicits._
    // train 1,2 are near-dups of each other AND of eval 10; train 3 and
    // eval 11 are unrelated; eval 10/11 share nothing with each other
    val train = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"),
      (3L, "totally different training content here")).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "a b c d e f g h"),
      (11L, "unrelated evaluation prompt words only")).toDF("doc_id", "text")
    val got = Dedup.crossJaccardPairs(train, eval_, "doc_id", "text",
        k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 1~2 within-train pair MUST NOT appear; both 1~10 and 2~10 must
    assert(got == Set((1L, 10L), (2L, 10L)))
    // exact-copy pair scores jaccard 1.0
    val j = Dedup.crossJaccardPairs(train, eval_, "doc_id", "text",
        k = 3, threshold = 0.5)
      .filter(col("a_id") === 1L).head().getDouble(2)
    assert(j == 1.0)
  }

  test("dedupAgainstCorpus drops exact normalized copies, keeps the rest") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "Shared   Document text"),  // normalizes same as incoming 10
      (2L, "other ingested doc")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "shared document TEXT"),   // case/whitespace variant -> drop
      (11L, "genuinely new content")).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainstCorpus(incoming, corpus, "text")
    assert(kept.columns.toSeq == Seq("doc_id", "text")) // no temp column leak
    assert(kept.collect().map(_.getLong(0)).toSeq == Seq(11L))
  }

  test("stripCommonLines removes high-df lines, keeps order and multiplicity") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "keep1\nBOILER\nkeep2", "en"),
      (2L, "BOILER\nx", "en"),
      (3L, "BOILER", "en"),
      (4L, "a\na\nBOILER", "de")).toDF("doc_id", "text", "lang")
    val out = Dedup.stripCommonLines(docs, "doc_id", "text", maxDf = 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 == "keep1\nkeep2")   // order preserved around the strip
    assert(out(2L)._1 == "x")
    assert(out(3L)._1 == "")               // all-boilerplate doc -> empty, not dropped
    assert(out(4L)._1 == "a\na")           // intra-doc repeats of a df=1 line survive
    assert(out(4L)._2 == "de")             // non-text columns ride through
    assert(out.size == 4)
  }
}
