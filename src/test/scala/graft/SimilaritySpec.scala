package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkFixture {

  test("dot / norm / cosine on known vectors") {
    val s = spark
    import s.implicits._
    val d = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
    val got = d.select(
      Similarity.dot(col("a"), col("b")).as("dot"),
      Similarity.cosine(col("a"), col("b")).as("cos"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got(0)._1 == 0.0 && got(0)._2 == 0.0)
    assert(math.abs(got(1)._2 - 1.0) < 1e-12)
  }

  /** deterministic clustered corpus: 3 well-separated unit-ish centers,
    * members = center + small seeded noise. */
  private def clustered = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(3)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for {
      c <- 0 until 3
      m <- 0 until 10
    } yield {
      val v = centers(c).map(x => (x + 0.05 * rnd.nextGaussian()).toFloat)
      (c * 10L + m, v, c)
    }
    rows.toDF("vec_id", "embedding", "cluster")
  }

  test("bruteForceTopK: neighbors come from the query's own cluster") {
    val d = clustered
    val q = d.filter(col("vec_id").isin(0L, 10L, 20L))
    val top = Similarity.bruteForceTopK(d, q, "vec_id", "embedding", k = 3)
      .collect()
    assert(top.length == 9)
    top.foreach { r =>
      val qc = r.getLong(0) / 10; val nc = r.getLong(1) / 10
      assert(qc == nc, s"neighbor ${r.getLong(1)} not in query ${r.getLong(0)}'s cluster")
      assert(r.getDouble(3) > 0.9) // tight cluster -> high cosine
    }
  }

  test("bruteForceTopK: partial-agg path == rank-window fallback, plan has no Window") {
    val d = clustered
    val q = d.filter(col("vec_id").isin(0L, 10L, 20L))
    val agg = Similarity.bruteForceTopK(d, q, "vec_id", "embedding", k = 4)
    // string ids force the generic rank-window fallback on the same data
    val ds = d.withColumn("vid", format_string("%03d", col("vec_id")))
    val qs = ds.filter(col("vec_id").isin(0L, 10L, 20L))
    val win = Similarity.bruteForceTopK(ds, qs, "vid", "embedding", k = 4)
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.get(0).toString.toLong, r.get(1).toString.toLong,
        r.getInt(2), r.getDouble(3))).toSet
    assert(key(agg.collect()) == key(win.collect()))
    // scale shape: the top-k shuffle is a partial ObjectHashAggregate,
    // not a rank window over all N·Q scored rows
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
    assert(!plan.contains("Window"), plan.take(500))
  }

  test("TopKAgg ranks NaN scores like Spark's sort (NaN greatest)") {
    val s = spark
    import s.implicits._
    // scores include NaN; Spark's `ORDER BY score DESC` treats NaN as the
    // largest value, so the aggregate must rank the NaN candidate FIRST —
    // primitive comparisons would rank it last and diverge from the
    // rank-window fallback path
    val d = Seq((1L, Double.NaN), (2L, 0.9), (3L, 0.5), (4L, Double.NaN))
      .toDF("id", "score").withColumn("g", lit(0))
    val topk = graft.functions.TopKAggregate.topK(3)
    val agg = d.groupBy("g")
      .agg(topk(col("score"), col("id")).as("tk"))
      .select(posexplode(col("tk")))
      .select(col("col.id")).collect().map(_.getLong(0)).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id"))
    val win = d.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3).orderBy("rnk")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(agg == win, s"agg path $agg must match window path $win")
    assert(agg == Seq(1L, 4L, 2L))
  }

  test("lshTopK achieves high recall@1 vs brute force on clustered data") {
    val d = clustered
    val q = d.filter(col("vec_id") < 10) // cluster-0 members as queries
    val exact = Similarity.bruteForceTopK(d, q, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = Similarity.lshTopK(d, q, "vec_id", "embedding",
      dim = 16, k = 1, bits = 8, tables = 8)
    val approx = lsh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = exact.count { case (qid, nid) => approx.get(qid).contains(nid) }
    assert(hits >= 9, s"recall@1 = $hits/10") // ≥0.9 on tight clusters
    // scale shape: integral ids must take the bounded partial top-k
    // aggregate, not a rank window over the full candidate volume
    val plan = lsh.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
    assert(!plan.contains("Window"), plan.take(500))
  }

  test("ivfTopK achieves high recall@1 vs brute force on clustered data") {
    val d = clustered
    val q = d.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(d, q, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Similarity.ivfTopK(d, q, "vec_id", "embedding", k = 1,
      nCells = 6, nProbe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = exact.count { case (qid, nid) => approx.get(qid).contains(nid) }
    assert(hits >= 9, s"IVF recall@1 = $hits/10")
  }

  test("ivfTopK k-means refinement converges cells toward true clusters") {
    val d = clustered
    val q = d.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(d, q, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // adversarial start: nCells=3 on 3 true clusters, where the seeded
    // sample may land two centroids in one cluster — Lloyd iterations must
    // recover ≥ the unrefined recall and keep it high
    def recall(iters: Int) = {
      val approx = Similarity.ivfTopK(d, q, "vec_id", "embedding", k = 1,
        nCells = 3, nProbe = 1, iterations = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      exact.count { case (qid, nid) => approx.get(qid).contains(nid) }
    }
    val refined = recall(3)
    assert(refined >= recall(0), "refinement must not lose recall")
    assert(refined >= 9, s"refined IVF recall@1 = $refined/10")
  }

  test("ivfQuery is lazy and reuses a prebuilt index (no retraining)") {
    val d = clustered
    val q = d.filter(col("vec_id") < 10)
    // build once — the only eager step of the IVF path
    val index = Similarity.buildIvfIndex(d, "vec_id", "embedding",
      nCells = 6, iterations = 2)
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val plan1 = Similarity.ivfQuery(d, q, "vec_id", "embedding", k = 1, index, nProbe = 2)
    val plan2 = Similarity.ivfQuery(d, q, "vec_id", "embedding", k = 1, index, nProbe = 2)
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter == jobsBefore,
      s"composing ivfQuery must run zero Spark jobs (ran ${jobsAfter - jobsBefore})")
    // both composes answer from the same trained centroids
    assert(plan1.collect().toSeq == plan2.collect().toSeq)
    // and the wrapper (build+query) agrees with the split form
    val viaWrapper = Similarity.ivfTopK(d, q, "vec_id", "embedding", k = 1,
      nCells = 6, nProbe = 2, iterations = 2)
    assert(viaWrapper.collect().toSeq == plan1.collect().toSeq)
  }

  test("nearDupPairs finds planted duplicate vectors") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    val a = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val aDup = a.map(x => x + 0.001f)
    val rows = (0 until 20).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))) ++
      Seq((100L, a), (101L, aDup))
    val d = rows.toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(d, "vec_id", "embedding",
      dim = 16, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 101L)))
  }

  test("IVF index save/load round-trips and answers identically") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val d = rows.toDF("vec_id", "embedding")
    val built = Similarity.buildIvfIndex(d, "vec_id", "embedding",
      nCells = 4, iterations = 1)
    val path = java.nio.file.Files
      .createTempDirectory("ivf_idx").resolve("index").toString
    Similarity.saveIvfIndex(s, built, path)
    val loaded = Similarity.loadIvfIndex(s, path)
    assert(loaded == built)
    val q = d.filter($"vec_id" < 3)
    val a = Similarity.ivfQuery(d, q, "vec_id", "embedding", 2, built, 2)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val b = Similarity.ivfQuery(d, q, "vec_id", "embedding", 2, loaded, 2)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(a == b)
  }

  test("PQ encode: codes in range, identical vectors share codes") {
    val d = clustered
    val cb = Similarity.buildPqCodebook(d, "vec_id", "embedding",
      dim = 16, m = 4, nCodes = 4, iterations = 1)
    assert(cb.m == 4 && cb.nCodes == 4 && cb.dsub == 4)
    val codes = Similarity.pqEncodeCorpus(d, "vec_id", "embedding", cb).collect()
    assert(codes.length == 30)
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 4 && cs.forall(c => c >= 0 && c < 4))
    }
    // cluster members quantize near-identically: same-cluster rows share
    // far more code positions than cross-cluster rows on average
    val byId = codes.map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def agree(a: Long, b: Long) = byId(a).zip(byId(b)).count { case (x, y) => x == y }
    val same = (1L until 10L).map(i => agree(0L, i)).sum.toDouble / 9
    val cross = (10L until 20L).map(i => agree(0L, i)).sum.toDouble / 10
    assert(same > cross, s"same-cluster code agreement $same <= cross $cross")
  }

  test("pqTopK with exact re-rank: full recall@1 on clustered data, exact scores") {
    val d = clustered
    val q = d.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(d, q, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val cb = Similarity.buildPqCodebook(d, "vec_id", "embedding",
      dim = 16, m = 4, nCodes = 4, iterations = 1)
    // shortlist must cover the quantization-tied set: a tight cluster's
    // members all encode to the SAME codes (same PQ score), so a
    // shortlist smaller than the cluster keeps an id-ordered subset of a
    // tie — the textbook reason PQ shortlists are generous (>> k)
    val pq = Similarity.pqTopK(d, q, "vec_id", "embedding", k = 1, cb,
        shortlist = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val hits = exact.count { case (qid, (nid, _)) => pq.get(qid).exists(_._1 == nid) }
    assert(hits >= 9, s"PQ recall@1 = $hits/10")
    // re-ranked scores are EXACT cosine — bit-equal to brute force
    pq.foreach { case (qid, (nid, score)) =>
      if (exact(qid)._1 == nid) assert(score == exact(qid)._2)
    }
  }

  test("int8 quantization: codes in range, reconstruction error <= scale/2") {
    val d = clustered
    val enc = Similarity.quantizeInt8(d, "vec_id", "embedding")
      .join(d.select(col("vec_id").as("id"), col("embedding")), "id")
      .collect()
    assert(enc.length == 30)
    enc.foreach { r =>
      val q8 = r.getStruct(1)
      val codes = q8.getAs[Array[Byte]](0)
      val mn = q8.getDouble(1)
      val sc = q8.getDouble(2)
      val v = r.getSeq[Float](2)
      assert(codes.length == v.length)
      val mx = v.map(_.toDouble).max
      assert(mn == v.map(_.toDouble).min && sc == (mx - mn) / 255.0)
      // dequantized element within half a quantization step of the source
      v.indices.foreach { i =>
        val x = mn + (codes(i) & 0xFF) * sc
        assert(math.abs(x - v(i)) <= sc / 2 + 1e-12,
          s"elem $i err ${math.abs(x - v(i))} > ${sc / 2}")
      }
    }
  }

  test("int8Cosine: query/codes dimension mismatch fails loudly") {
    val s = spark
    import s.implicits._
    // a 3-dim query against 4-dim codes must error, not silently score
    // the truncated prefix (mixed-dimension corpora are data bugs)
    val d = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "embedding")
    val enc = Similarity.quantizeInt8(d, "vec_id", "embedding")
      .select(col("q8.codes"), col("q8.qmin"), col("q8.qscale"))
    val bad = enc.select(graft.plans.VectorExpressions.int8Cosine(
      typedLit(Array(1.0, 2.0, 3.0)), col("codes"), col("qmin"), col("qscale")))
    val e = intercept[Exception](bad.collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("dimension mismatch")), s"got: ${msgs(e)}")
  }

  test("int8 quantization: constant vector has zero scale and zero codes") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, Array(2.5f, 2.5f, 2.5f))).toDF("vec_id", "embedding")
    val r = Similarity.quantizeInt8(d, "vec_id", "embedding").collect()(0).getStruct(1)
    assert(r.getAs[Array[Byte]](0).forall(_ == 0))
    assert(r.getDouble(1) == 2.5 && r.getDouble(2) == 0.0)
  }

  test("int8TopK with exact re-rank: full recall@1 on clustered data, exact scores") {
    val d = clustered
    val q = d.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(d, q, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    // int8's per-element error (range/510) is far below cluster score
    // gaps, so even a modest shortlist keeps the true neighbor
    val i8 = Similarity.int8TopK(d, q, "vec_id", "embedding", k = 1,
        shortlist = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val hits = exact.count { case (qid, (nid, _)) => i8.get(qid).exists(_._1 == nid) }
    assert(hits >= 9, s"int8 recall@1 = $hits/10")
    // re-ranked scores are EXACT cosine — bit-equal to brute force
    i8.foreach { case (qid, (nid, score)) =>
      if (exact(qid)._1 == nid) assert(score == exact(qid)._2)
    }
  }

  test("ivfPqTopK composes cell pruning with PQ scoring at full recall") {
    val d = clustered
    val q = d.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(d, q, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val index = Similarity.buildIvfIndex(d, "vec_id", "embedding",
      nCells = 6, iterations = 1)
    val cb = Similarity.buildPqCodebook(d, "vec_id", "embedding",
      dim = 16, m = 4, nCodes = 4, iterations = 1)
    val got = Similarity.ivfPqTopK(d, q, "vec_id", "embedding", k = 1,
        index, cb, nProbe = 2, shortlist = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val hits = exact.count { case (qid, (nid, _)) => got.get(qid).exists(_._1 == nid) }
    assert(hits >= 9, s"IVF-PQ recall@1 = $hits/10")
    // re-ranked scores stay exact
    got.foreach { case (qid, (nid, score)) =>
      if (exact(qid)._1 == nid) assert(score == exact(qid)._2)
    }
  }

  test("PQ codebook save/load round-trips; codes scan is Window-free partial top-k") {
    val s = spark
    import s.implicits._
    val d = clustered
    val cb = Similarity.buildPqCodebook(d, "vec_id", "embedding",
      dim = 16, m = 4, nCodes = 4, iterations = 1)
    val path = java.nio.file.Files
      .createTempDirectory("pq_cb").resolve("codebook").toString
    Similarity.savePqCodebook(s, cb, path)
    val loaded = Similarity.loadPqCodebook(s, path)
    assert(loaded == cb)
    val q = d.filter($"vec_id" < 3)
    val top = Similarity.pqTopK(d, q, "vec_id", "embedding", 2, loaded, shortlist = 5)
    val a = top.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val b = Similarity.pqTopK(d, q, "vec_id", "embedding", 2, cb, shortlist = 5)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(a == b)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("Window"),
      plan.take(500))
  }

  test("semanticDedupPairs finds every within-cluster near-dup pair") {
    val s = spark
    import s.implicits._
    val d = clustered
    // plant twins: vec 0 and vec 10 duplicated under new ids, tiny shift
    val twins = d.filter(col("vec_id").isin(0L, 20L))
      .select((col("vec_id") + 100L).as("vec_id"),
        transform(col("embedding"), x => x + lit(1e-4f)).as("embedding"),
        col("cluster"))
    val corpus = d.unionByName(twins)
    val index = Similarity.buildIvfIndex(corpus, "vec_id", "embedding",
      nCells = 3, iterations = 2)
    val pairs = Similarity.semanticDedupPairs(
        corpus, "vec_id", "embedding", index, threshold = 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)) && pairs.contains((20L, 120L)),
      s"planted twins not found: $pairs")
    // within-cluster recall vs brute force: every same-cell exact pair
    // above threshold must be present (the cells ARE the true clusters
    // after refinement, so here that is every exact pair)
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val exact = for {
      a <- vecs.keys; b <- vecs.keys
      if a < b && cos(vecs(a), vecs(b)) >= 0.9999
    } yield (a, b)
    assert(exact.toSet.subsetOf(pairs), s"missed: ${exact.toSet -- pairs}")
  }

  test("semanticDedup keeps one survivor per duplicate group") {
    val d = clustered
    val twins = d.filter(col("vec_id") === 0L)
      .select((col("vec_id") + 100L).as("vec_id"),
        transform(col("embedding"), x => x + lit(1e-4f)).as("embedding"),
        col("cluster"))
    val corpus = d.unionByName(twins)
    val index = Similarity.buildIvfIndex(corpus, "vec_id", "embedding",
      nCells = 3, iterations = 2)
    val kept = Similarity.semanticDedup(
        corpus, "vec_id", "embedding", index, threshold = 0.9999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && !kept.contains(100L),
      s"twin should drop, original survive: $kept")
    assert(kept.size == 30, s"expected 30 survivors, got ${kept.size}")
  }
}
