package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis
import graft.operators.{Chunking, Dedup, Snapshot}

/** Round-11 curation additions: chunk reassembly, snapshot diff,
  * edit-distance pairs, linear quality model. */
class CurationOpsSpec extends AnyFunSuite with SparkFixture {

  test("unchunkDocs round-trips chunkDocs byte-for-byte (incl. edge lengths)") {
    val s = spark
    import s.implicits._
    // lengths straddling every boundary: < chunk, == chunk, == chunk+1,
    // multiple full chunks, and a final chunk barely past the overlap
    val texts = Seq(1, 3, 4, 5, 7, 8, 9, 12, 40)
      .map(n => (1 to n).map(i => s"w$i").mkString(" "))
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val chunks = Chunking.chunkDocs(d, "doc_id", "text", chunkTokens = 4, overlap = 1)
    val back = Chunking.unchunkDocs(chunks, "id", "chunk_id", "chunk_text", overlap = 1)
    val got = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == t, s"doc $i")
    }
  }

  test("property: chunk->unchunk round trip over random (len, chunk, overlap)") {
    import org.scalacheck.{Gen, rng}
    val s = spark
    import s.implicits._
    val gen = for {
      n <- Gen.chooseNum(1, 120)          // tokens per doc
      chunk <- Gen.chooseNum(2, 50)       // chunk size
      overlap <- Gen.chooseNum(0, chunk - 1)
    } yield (n, chunk, overlap)
    val cases = Gen.listOfN(40, gen)
      .apply(Gen.Parameters.default, rng.Seed(7L)).get
    cases.foreach { case (n, chunk, overlap) =>
      val d = Seq((1L, (1 to n).map(i => s"t$i").mkString(" ")))
        .toDF("doc_id", "text")
      val rt = Chunking.unchunkDocs(
        Chunking.chunkDocs(d, "doc_id", "text", chunk, overlap),
        "id", "chunk_id", "chunk_text", overlap)
        .head().getString(1)
      val want = (1 to n).map(i => s"t$i").mkString(" ")
      assert(rt == want, s"n=$n chunk=$chunk overlap=$overlap")
    }
  }

  test("unchunkDocs strips overlap only from non-first chunks") {
    val s = spark
    import s.implicits._
    val chunks = Seq((9L, 0, "a b c"), (9L, 1, "c d e")).toDF("id", "cid", "txt")
    val got = Chunking.unchunkDocs(chunks, "id", "cid", "txt", overlap = 1)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((9L, "a b c d e")))
  }

  test("snapshotDiff reports all four statuses; hashed mode agrees") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("k", "v1", "v2")
    val nu = Seq((1L, "a", "x"), (2L, "B", "y"), (4L, "d", "w"))
      .toDF("k", "v1", "v2")
    val want = Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added")
    for (hashed <- Seq(false, true)) {
      val got = Snapshot.snapshotDiff(old, nu, Seq("k"), Seq("v1", "v2"), hashed)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, s"hashed=$hashed")
    }
  }

  test("applyChanges: diff(a,b) re-applied to a reproduces b (CDC round-trip)") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 30), (4L, "w", 40))
      .toDF("k", "v", "n")
    // b: 1 unchanged, 2 changed, 3 removed, 5 added
    val b = Seq((1L, "x", 10), (2L, "Y", 21), (4L, "w", 40), (5L, "q", 50))
      .toDF("k", "v", "n")
    val diff = Snapshot.snapshotDiff(a, b, Seq("k"), Seq("v", "n"))
    val upserts = b.join(
      diff.filter(col("status").isin("added", "changed")).select("k"), Seq("k"))
      .withColumn("is_delete", lit(false))
    val deletes = a.join(
      diff.filter(col("status") === "removed").select("k"), Seq("k"))
      .withColumn("is_delete", lit(true))
    val applied = Snapshot.applyChanges(
      a, upserts.unionByName(deletes), Seq("k"), "is_delete")
    assert(applied.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet)
    // delete of an absent key is a MERGE no-op
    val noop = Snapshot.applyChanges(a,
      Seq((99L, "-", 0, true)).toDF("k", "v", "n", "is_delete"), Seq("k"), "is_delete")
    assert(noop.collect().map(_.toSeq).toSet == a.collect().map(_.toSeq).toSet)
  }

  test("property: applyChanges(a, changes(a,b)) == b over random snapshot pairs") {
    import org.scalacheck.{Gen, rng}
    val s = spark
    import s.implicits._
    val gen = for {
      nA <- Gen.chooseNum(0, 30)
      nAdd <- Gen.chooseNum(0, 10)
      changed <- Gen.someOf(1 to 30)
      removed <- Gen.someOf(1 to 30)
    } yield (nA, nAdd, changed.toSet, removed.toSet)
    val cases = Gen.listOfN(25, gen)
      .apply(Gen.Parameters.default, rng.Seed(11L)).get
    cases.foreach { case (nA, nAdd, changedAll, removedAll) =>
      val aKeys = (1 to nA).map(_.toLong)
      val changed = changedAll.map(_.toLong).intersect(aKeys.toSet) -- removedAll.map(_.toLong)
      val removed = removedAll.map(_.toLong).intersect(aKeys.toSet)
      val added = (100 until 100 + nAdd).map(_.toLong)
      val a = aKeys.map(k => (k, s"v$k")).toDF("k", "v")
      val bRows = aKeys.filterNot(removed).map(k =>
        (k, if (changed(k)) s"V$k!" else s"v$k")) ++ added.map(k => (k, s"v$k"))
      val b = bRows.toDF("k", "v")
      val changes =
        (aKeys.filter(changed).map(k => (k, s"V$k!", false)) ++
          added.map(k => (k, s"v$k", false)) ++
          removed.toSeq.map(k => (k, "", true))).toDF("k", "v", "del")
      val applied = Snapshot.applyChanges(a, changes, Seq("k"), "del")
      assert(applied.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet,
        s"nA=$nA add=${added.size} chg=${changed.size} rm=${removed.size}")
    }
  }

  test("snapshotDiff struct compare is null-safe") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, Option.empty[String]), (2L, Option("b")))
      .toDF("k", "v")
    val nu = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "v")
    val got = Snapshot.snapshotDiff(old, nu, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("snapshotDiff hashed mode separates a value migrating across a null") {
    val s = spark
    import s.implicits._
    // raw multi-arg xxhash64 skips nulls, deterministically colliding
    // (null, x) with (x, null); the JSON-tagged hash must not
    val old = Seq((1L, Option.empty[String], Option("x"))).toDF("k", "a", "b")
    val nu = Seq((1L, Option("x"), Option.empty[String])).toDF("k", "a", "b")
    val got = graft.operators.Snapshot.snapshotDiff(
        old, nu, Seq("k"), Seq("a", "b"), hashed = true)
      .head().getString(1)
    assert(got == "changed")
  }

  test("interleaveBySource fails loudly on a source missing from the strides map") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "a"), (2L, "mystery")).toDF("id", "src")
    val ex = intercept[Exception] {
      graft.operators.Sampling.interleaveBySource(
        d, "src", "id", Map("a" -> 1L)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("editDistancePairs == brute-force levenshtein scan (differential)") {
    val s = spark
    import s.implicits._
    // a corpus with identical strings, 1-edit neighbors, short strings
    // (the synthetic-bucket path: len < q*(d+1)), and far strings
    val strs = Seq("kitten", "sitten", "sittin", "kitchen", "mitten",
      "ab", "ac", "b", "", "abcdefgh", "abcdefgi", "zzzzzz", "kitten")
    val d = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "s")
    for (maxDist <- Seq(1, 2); q <- Seq(1, 2, 3)) {
      val got = Dedup.editDistancePairs(d, "id", "s", maxDist, q)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = d.as("a").join(d.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          levenshtein(col("a.s"), col("b.s")).as("dist"))
        .filter(col("dist") <= maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute, s"maxDist=$maxDist q=$q")
    }
  }

  test("editDistancePairs maxBucket drops oversize duplicate groups only") {
    val s = spark
    import s.implicits._
    val d = ((1 to 10).map(i => (i.toLong, "samesame")) :+ (99L, "samesamX"))
      .toDF("id", "s")
    val capped = Dedup.editDistancePairs(d, "id", "s", maxDist = 1, q = 2,
      maxBucket = Some(3)).count()
    val full = Dedup.editDistancePairs(d, "id", "s", maxDist = 1, q = 2).count()
    assert(full == 10L * 11 / 2) // all pairs within distance 1
    assert(capped < full)
  }

  test("sampleKPerGroup: exactly k per group, small groups whole, deterministic") {
    val s = spark
    import s.implicits._
    val d = ((1 to 20).map(i => (i.toLong, "big")) ++ Seq((100L, "tiny")))
      .toDF("id", "grp")
    val got = graft.operators.Sampling.sampleKPerGroup(d, Seq("grp"), "id", 3)
    val byGrp = got.collect().map(r => r.getString(1)).groupBy(identity)
    assert(byGrp("big").length == 3 && byGrp("tiny").length == 1)
    // stable across runs (hash membership, not RNG)
    val again = graft.operators.Sampling.sampleKPerGroup(d, Seq("grp"), "id", 3)
    assert(got.collect().map(_.getLong(0)).toSet ==
      again.collect().map(_.getLong(0)).toSet)
    // and plans the map-side group limit before the exchange
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(600))
  }

  test("interleaveBySource realizes the stride ratio in any schedule prefix") {
    val s = spark
    import s.implicits._
    val d = ((1 to 60).map(i => (i.toLong, "a")) ++
      (101 to 160).map(i => (i.toLong, "b"))).toDF("id", "src")
    val got = graft.operators.Sampling.interleaveBySource(
        d, "src", "id", Map("a" -> 1L, "b" -> 3L))
      .select("id", "src", "sched")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // in the schedule order, a window of sched < 30 holds 30 a-rows
    // (stride 1) and 10 b-rows (stride 3): the 3:1 mix
    val prefix = got.filter(_._3 < 30)
    assert(prefix.count(_._2 == "a") == 30 && prefix.count(_._2 == "b") == 10)
    // schedule keys are unique per source and start at 0
    assert(got.filter(_._2 == "b").map(_._3).sorted.take(3).toSeq == Seq(0L, 3L, 6L))
  }

  test("bigramCoverage: hand-computed counts, minCount gate, short-doc null") {
    val s = spark
    import s.implicits._
    val ref = Seq((1L, "the cat sat"), (2L, "the cat ran"), (3L, "a dog")).toDF("id", "t")
    // ref bigram counts: "the cat"=2, "cat sat"=1, "cat ran"=1, "a dog"=1
    val docs = Seq(
      (10L, "the cat sat here"), // bigrams: the-cat(hit), cat-sat(no@min2), sat-here(no)
      (11L, "word")).toDF("id", "t") // 0 bigrams -> null coverage
    val got = TextAnalysis.bigramCoverage(docs, "id", "t", ref, "t", minCount = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got(10L) == ((3L, 1L, Some(1.0 / 3))))
    assert(got(11L) == ((0L, 0L, None)))
  }

  test("nfcNormalize: decomposed == precomposed after NFC; nulls pass through") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, Option("cafe\u0301 u\u0308ber")),     // combining marks
      (2L, Option("caf\u00e9 \u00fcber")),       // precomposed
      (3L, Option.empty[String])).toDF("id", "t")
    val got = d.select(col("id"),
        graft.plans.TextExpressions.nfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) == got(2L), "both forms normalize identically")
    assert(got(1L).get == "caf\u00e9 \u00fcber", "NFC composes to precomposed")
    assert(got(3L).isEmpty, "null passes through")
    // differential vs the JDK reference on the raw strings
    assert(got(1L).get == java.text.Normalizer.normalize(
      "cafe\u0301 u\u0308ber", java.text.Normalizer.Form.NFC))
  }

  test("linearQualityScore matches the documented hand computation") {
    val s = spark
    import s.implicits._
    // "big words ok a a 12": n_tok=6, chars=19, short=4 ('ok','a','a','12'),
    // digits=2, rep=1 (second 'a')
    val d = Seq((1L, "big words ok a a 12")).toDF("id", "text")
    val got = d.select(TextAnalysis.linearQualityScore(col("text")))
      .head().getLong(0)
    val expect = 8L * 6 + 19 - 16 * 4 - 4 * 2 - 2 * 1
    assert(got == expect)
  }

  test("curation ops plan shape: unchunk one shuffle; edit pairs no cross join") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val chunks = Chunking.chunkDocs(d, "doc_id", "text", 4, 1)
    val un = Chunking.unchunkDocs(chunks, "id", "chunk_id", "chunk_text", 1)
      .queryExecution.executedPlan.toString
    assert(!un.contains("CartesianProduct"))
    val ep = Dedup.editDistancePairs(
      d.select(col("doc_id").as("id"), col("text").as("s")), "id", "s", 1, 2)
      .queryExecution.executedPlan.toString
    assert(!ep.contains("CartesianProduct") && !ep.contains("BroadcastNestedLoop"), ep.take(500))
  }
}
