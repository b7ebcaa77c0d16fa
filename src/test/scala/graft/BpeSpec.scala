package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrainer
import graft.operators.BpeTrainer.{EndOfWord, Merge}

class BpeSpec extends AnyFunSuite with SparkFixture {

  /** Plain local classic BPE (Sennrich ACL'16 alg. 1) — the oracle the
    * distributed batch=1 trainer must reproduce merge-for-merge. */
  private def referenceBpe(
      words: Map[String, Long], numMerges: Int, minCount: Long): Seq[(String, String)] = {
    var tbl: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, n) => (w.map(_.toString).toVector :+ EndOfWord, n) }
    val out = Seq.newBuilder[(String, String)]
    var done = false
    for (_ <- 0 until numMerges if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (sym, n) =>
        sym.zip(sym.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      val best = counts.toSeq.filter(_._2 >= minCount)
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case None => done = true
        case Some(((l, r), _)) =>
          out += ((l, r))
          tbl = tbl.map { case (sym, n) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < sym.length) {
              if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += sym(i); i += 1 }
            }
            (b.result(), n)
          }
      }
    }
    out.result()
  }

  private def corpusDf = {
    val s = spark
    import s.implicits._
    // the paper's running example vocabulary, as documents
    Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest"),
      (3L, "newest newest newest newest widest"),
      (4L, "widest widest")).toDF("doc_id", "text")
  }

  private val wordFreqs = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("batch=1 training == classic BPE reference, merge for merge") {
    val got = BpeTrainer.train(corpusDf, "text", numMerges = 10, batch = 1)
      .map(m => (m.left, m.right))
    val want = referenceBpe(wordFreqs, 10, minCount = 2L)
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("training is deterministic across runs") {
    val a = BpeTrainer.train(corpusDf, "text", numMerges = 8, batch = 1)
    val b = BpeTrainer.train(corpusDf, "text", numMerges = 8, batch = 1)
    assert(a == b)
  }

  test("batched merges are symbol-disjoint per round and build a working vocab") {
    val merges = BpeTrainer.train(corpusDf, "text", numMerges = 9, batch = 4)
    assert(merges.map(_.rank) == merges.indices)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    for (w <- wordFreqs.keys) {
      val toks = BpeTrainer.encodeWord(w, ranks)
      assert(toks.mkString == w + EndOfWord, s"round trip for $w -> $toks")
      assert(toks.length <= w.length + 1)
    }
  }

  test("encodeWord applies merges lowest-rank-first") {
    // ranks: (e,s) then (es,t): "best" -> b,e,s,t,</w> -> b,es,t -> b,est
    val ranks = Map(("e", "s") -> 0, ("es", "t") -> 1)
    assert(BpeTrainer.encodeWord("best", ranks) == Seq("b", "est", EndOfWord))
  }

  test("tokenizeCount counts subwords under the trained vocab") {
    val merges = BpeTrainer.train(corpusDf, "text", numMerges = 20, batch = 1)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val got = BpeTrainer.tokenizeCount(corpusDf, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: "low" x5 — fully merged after 20 merges on this tiny corpus
    val lowToks = BpeTrainer.encodeWord("low", ranks).length
    assert(got(1L) == 5L * lowToks)
    val expected2 = 2L * BpeTrainer.encodeWord("lower", ranks).length +
      2L * BpeTrainer.encodeWord("newest", ranks).length
    assert(got(2L) == expected2)
  }
}
