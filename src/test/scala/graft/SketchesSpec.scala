package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite with SparkFixture {

  private def lineitem =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("approxDistinct is within the declared rsd of the exact count") {
    val li = lineitem
    val exact = li.groupBy("l_returnflag")
      .agg(count_distinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxDistinct(li, "l_partkey", Seq("l_returnflag"), rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      // 4 sigma of the declared 5% relative standard deviation
      assert(math.abs(a - n) <= math.max(1.0, 0.20 * n),
        s"group $k: approx $a vs exact $n")
    }
  }

  test("approxQuantiles bounds rank error by 1/accuracy") {
    val li = lineitem
    val n = li.count()
    val probs = Seq(0.1, 0.5, 0.9)
    val got = Sketches.approxQuantiles(li, "l_extendedprice", probs, accuracy = 1000)
      .head().getSeq[Double](0)
    val sorted = li.select("l_extendedprice").orderBy("l_extendedprice")
      .collect().map(_.getDouble(0))
    probs.zip(got).foreach { case (p, q) =>
      // rank of the returned value must be within n/accuracy of p*n
      val rank = sorted.count(_ <= q)
      val err = math.abs(rank - p * n)
      assert(err <= math.max(2.0, 2.0 * n / 1000.0),
        s"p=$p: value $q has rank $rank, expected ~${p * n}")
    }
  }

  test("sketch aggregation partial-aggregates before the exchange") {
    val plan = Sketches.approxDistinct(lineitem, "l_partkey", Seq("l_returnflag"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"), plan.take(600))
  }

  test("hllSketch: estimate within 5% of a 10k-distinct exact count") {
    val s0 = spark
    import s0.implicits._
    val d = (1L to 10000L).map(i => ("g", i)).toDF("g", "v")
    val est = d.groupBy("g").agg(Sketches.hllSketch(col("v")).as("sk"))
      .select(Sketches.hllEstimate(col("sk"))).head().getDouble(0)
    assert(math.abs(est - 10000.0) <= 500.0, s"estimate $est off by > 5%")
  }

  test("hllMerge is lossless: merged per-batch sketches == whole-corpus sketch") {
    val s0 = spark
    import s0.implicits._
    val d = (1L to 5000L).map(i => (i % 4, i)).toDF("batch", "v")
    val whole = d.agg(Sketches.hllSketch(col("v")).as("sk"))
      .head().getAs[Array[Byte]](0)
    val merged = d.groupBy("batch").agg(Sketches.hllSketch(col("v")).as("sk"))
      .agg(Sketches.hllMerge(col("sk")).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, merged),
      "sketch(A union B) must be bit-identical to merge(sketch(A), sketch(B))")
    // and the scalar expression agrees with the driver-side estimator
    val viaCol = d.agg(Sketches.hllSketch(col("v")).as("sk"))
      .select(Sketches.hllEstimate(col("sk"))).head().getDouble(0)
    assert(viaCol == graft.functions.HllSketch.estimate(whole))
  }

  test("hllMerge refuses sketches of different precision") {
    val a = new Array[Byte](1 << 12)
    val b = new Array[Byte](1 << 10)
    intercept[IllegalArgumentException] {
      graft.functions.HllSketch.mergeRegs(a, b)
    }
  }

  test("MG heavy hitters: retention + undercount bounds hold on a skewed stream") {
    val s0 = spark
    import s0.implicits._
    val k = 8
    // 3 hot items (1000/600/400) + 500 singletons: n = 2500,
    // n/(k+1) ~ 277 -> hot items 1000/600/400 are guaranteed retained
    val rows = (Seq.fill(1000)("hot1") ++ Seq.fill(600)("hot2") ++
      Seq.fill(400)("hot3") ++ (1 to 500).map(i => s"cold$i"))
    // seeded: the Spark-level run is the deterministic witness; the
    // randomized coverage lives in the explicit fuzz spec below
    val d = new scala.util.Random(42).shuffle(rows).toDF("token").repartition(8)
    val mg = d.agg(Sketches.heavyHitters(col("token"), k).as("mg"))
      .head().getMap[String, Long](0)
    val n = rows.length
    assert(mg.size <= k)
    Seq("hot1" -> 1000L, "hot2" -> 600L, "hot3" -> 400L).foreach { case (t0, f) =>
      assert(mg.contains(t0), s"$t0 (f=$f > n/(k+1)=${n / (k + 1)}) must be retained")
      val c = mg(t0)
      assert(c <= f && (f - c) * (k + 1) <= n,
        s"$t0 count $c outside [f - n/(k+1), f] = [${f - n / (k + 1)}, $f]")
    }
  }

  test("MG fuzz: <=k invariant and count bounds hold across 400 seeded partition/merge trials") {
    // Regression fuzz for the mutate-while-iterating defect: updating a
    // Scala 2.13 HashMap under a live keysIterator triggers preemptive
    // table growth (put0 grows when contentSize+1 >= threshold even for
    // existing keys), rehashing mid-loop so the iterator skips entries —
    // trimmed maps kept > k keys with unsubtracted (too-high) counts.
    // k=8 crosses the 16-slot table's threshold (12) during merge;
    // k=12 sits AT the threshold so the reduce decrement loop crosses it.
    val rnd = new scala.util.Random(20260816L)
    Seq(8, 12).foreach { k =>
      val agg = new graft.functions.MgSketch.SketchAgg(k)
      val hot = Seq.fill(1000)("hot1") ++ Seq.fill(600)("hot2") ++ Seq.fill(400)("hot3")
      val cold = (1 to 500).map(i => s"cold$i")
      (1 to 200).foreach { trial =>
        val rows = rnd.shuffle(hot ++ cold)
        val nPart = 2 + rnd.nextInt(2) // 2..3 partitions — the reproduction shape
        val per = math.max(1, math.ceil(rows.size.toDouble / nPart).toInt)
        val partials = rows.grouped(per).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
        val m = agg.finish(partials.reduce(agg.merge))
        val n = rows.length
        assert(m.size <= k, s"k=$k trial $trial (nPart=$nPart): size ${m.size} > k")
        Seq("hot1" -> 1000L, "hot2" -> 600L, "hot3" -> 400L).foreach { case (t0, f) =>
          assert(m.contains(t0),
            s"k=$k trial $trial: $t0 (f=$f > n/(k+1)=${n / (k + 1)}) dropped")
          val c = m(t0)
          assert(c <= f && (f - c) * (k + 1) <= n,
            s"k=$k trial $trial: $t0 count $c outside [${f - n / (k + 1)}, $f]")
        }
      }
    }
  }

  test("MG merge rule: driver-side merge of stored sketches keeps the summed bound") {
    val k = 4
    val a = Map("x" -> 50L, "y" -> 20L, "z" -> 10L, "w" -> 5L) // n1 >= 85
    val b = Map("x" -> 30L, "q" -> 25L, "y" -> 8L, "r" -> 3L)  // n2 >= 66
    val m = graft.functions.MgSketch.mergeMaps(k, Seq(a, b))
    assert(m.size <= k)
    // the dominant item survives the merge with a summed-undercount bound
    assert(m.contains("x") && m("x") <= 80L)
  }

  test("hllSketch skips nulls (count-distinct semantics)") {
    val s0 = spark
    import s0.implicits._
    val d = Seq(Option(1L), None, Option(2L), None).toDF("v")
    val est = d.agg(Sketches.hllSketch(col("v")).as("sk"))
      .select(Sketches.hllEstimate(col("sk"))).head().getDouble(0)
    assert(math.abs(est - 2.0) < 0.5, s"nulls leaked into the sketch: $est")
    val allNull = Seq(Option.empty[Long]).toDF("v")
      .agg(Sketches.hllSketch(col("v")).as("sk"))
      .select(Sketches.hllEstimate(col("sk"))).head().getDouble(0)
    assert(allNull == 0.0)
  }

  test("hllMerge skips null sketches (outer-join absent days)") {
    val s0 = spark
    import s0.implicits._
    val whole = (1L to 100L).toDF("v")
      .agg(Sketches.hllSketch(col("v")).as("sk")).head().getAs[Array[Byte]](0)
    val withNull = Seq(Option(whole), Option.empty[Array[Byte]], Option(whole))
      .toDF("sk")
      .agg(Sketches.hllMerge(col("sk")).as("m")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(withNull, whole),
      "a null sketch must contribute nothing, not poison the merge")
  }

  test("stored sketches survive a parquet round trip and merge after reload") {
    val s0 = spark
    import s0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sk").toString
    // v: all-distinct (the HLL side); h: skewed (the MG side — an
    // all-distinct stream annihilates every MG counter by design)
    val d = (1L to 3000L).map(i => (i % 3, i, s"k${i % 5}")).toDF("day", "v", "h")
    // "write one sketch per day" — the storable-artifact deployment shape
    d.groupBy("day")
      .agg(Sketches.hllSketch(col("v")).as("hll"),
        Sketches.heavyHitters(col("h"), 8).as("mg"))
      .write.parquet(dir + "/sketches")
    val back = spark.read.parquet(dir + "/sketches")
    // HLL: reloaded per-day sketches merge to the same registers as
    // sketching the whole corpus directly (the lossless-merge law,
    // now THROUGH the storage format)
    val whole = d.agg(Sketches.hllSketch(col("v")).as("sk"))
      .head().getAs[Array[Byte]](0)
    val merged = back.agg(Sketches.hllMerge(col("hll")).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, merged))
    // MG: map column round-trips; driver-side merge of the reloaded
    // maps retains the dominant keys
    val maps = back.collect().map(_.getMap[String, Long](2))
      .map(m => m.toMap)
    val mgAll = graft.functions.MgSketch.mergeMaps(8, maps.toSeq)
    assert(mgAll.size <= 8 && mgAll.nonEmpty)
  }

  // ------------------------------------------------------------- KLL

  test("kllSketch: exact quantiles below the compaction threshold; exact min/max always") {
    val s0 = spark
    import s0.implicits._
    // 100 values < the k=256 level-0 capacity -> no compaction, exact
    val d = (1L to 100L).toDF("v").repartition(4)
    val sk = d.agg(Sketches.kllSketch(col("v")).as("sk"))
    val row = sk.select(
      Sketches.kllCount(col("sk")),
      Sketches.kllQuantile(col("sk"), 0.0),
      Sketches.kllQuantile(col("sk"), 0.25),
      Sketches.kllQuantile(col("sk"), 0.5),
      Sketches.kllQuantile(col("sk"), 0.75),
      Sketches.kllQuantile(col("sk"), 1.0)).head()
    assert(row.getLong(0) == 100L)
    assert(row.getDouble(1) == 1.0 && row.getDouble(5) == 100.0)
    assert(row.getDouble(2) == 25.0 && row.getDouble(3) == 50.0 &&
      row.getDouble(4) == 75.0)
  }

  test("kll rank error stays bounded across partitionings; n/min/max exact") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val n = li.count()
    val sorted = li.select(col("l_extendedprice").cast("double"))
      .orderBy("l_extendedprice").collect().map(_.getDouble(0))
    for (parts <- Seq(1, 7, 32)) {
      val sk = li.repartition(parts)
        .agg(Sketches.kllSketch(col("l_extendedprice")).as("sk"))
      val row = sk.select(
        Sketches.kllCount(col("sk")),
        Sketches.kllQuantile(col("sk"), 0.0),
        Sketches.kllQuantile(col("sk"), 1.0),
        Sketches.kllQuantile(col("sk"), 0.25),
        Sketches.kllQuantile(col("sk"), 0.5),
        Sketches.kllQuantile(col("sk"), 0.75)).head()
      assert(row.getLong(0) == n, s"parts=$parts: n must be exact")
      assert(row.getDouble(1) == sorted.head && row.getDouble(2) == sorted.last,
        s"parts=$parts: min/max must be exact")
      // measured rank error on this fixture is ~1% of n at k=256;
      // margin to 2.5% (the registry query pins a value-domain bound)
      Seq(0.25 -> row.getDouble(3), 0.5 -> row.getDouble(4),
          0.75 -> row.getDouble(5)).foreach { case (p, est) =>
        val rank = sorted.count(_ < est)
        assert(math.abs(rank - p * n) <= 0.025 * n,
          s"parts=$parts p=$p: est $est has rank $rank, expected ~${p * n}")
      }
    }
  }

  test("kll merge: n additive, per-batch merge bound matches whole-corpus bound") {
    val s0 = spark
    import s0.implicits._
    val d = (1L to 20000L).map(i => (i % 4, (i * 2654435761L) % 100000L))
      .toDF("batch", "v").repartition(8)
    val merged = d.groupBy("batch").agg(Sketches.kllSketch(col("v")).as("sk"))
      .agg(Sketches.kllMerge(col("sk")).as("sk"))
      .select(Sketches.kllCount(col("sk")),
        Sketches.kllQuantile(col("sk"), 0.5)).head()
    assert(merged.getLong(0) == 20000L, "merged n must equal the union's count")
    val exactMedian = d.select(expr("percentile(v, 0.5)")).head().getDouble(0)
    // value domain is ~uniform over [0, 1e5): 2.5% rank error ~ 2500 in value
    assert(math.abs(merged.getDouble(1) - exactMedian) <= 2500.0,
      s"merged median ${merged.getDouble(1)} vs exact $exactMedian")
    // driver-side: merging NON-EMPTY sketches of different k must fail
    // loudly (an empty sketch is mergeable at any k — next test)
    val sa = new graft.functions.KllSketch.State(64)
    sa.update(1.0)
    val sb = new graft.functions.KllSketch.State(128)
    sb.update(2.0)
    val a = graft.functions.KllSketch.serialize(sa)
    val b = graft.functions.KllSketch.serialize(sb)
    intercept[IllegalArgumentException] {
      graft.functions.KllSketch.deserialize(a)
        .mergeIn(graft.functions.KllSketch.deserialize(b))
    }
  }

  test("kll: empty sketches merge across k; per-level parity is real state") {
    import graft.functions.KllSketch
    // MergeAgg serializes an all-null group as an empty DefaultK(256)
    // sketch; folding that stored row into a k=512 column must be a
    // no-op, not an exception — in either merge direction
    val empty256 = KllSketch.deserialize(
      KllSketch.serialize(new KllSketch.State(256)))
    val big = new KllSketch.State(512)
    (1L to 1000L).foreach(i => big.update(i.toDouble))
    val m1 = big.mergeIn(empty256)
    assert(m1.k == 512 && m1.n == 1000L)
    val empty256b = KllSketch.deserialize(
      KllSketch.serialize(new KllSketch.State(256)))
    val m2 = empty256b.mergeIn(m1) // adopts the non-empty side's k
    assert(m2.k == 512 && m2.n == 1000L)
    assert(KllSketch.quantile(KllSketch.serialize(m2), 0.0) == 1.0)
    assert(KllSketch.quantile(KllSketch.serialize(m2), 1.0) == 1000.0)
    // per-level compaction parity drives the offset alternation, so it
    // must survive a store/reload cycle (dropping it would restart every
    // level at even parity and reintroduce the rank bias the per-level
    // alternation cancels) and merges must sum it per level
    val st = new KllSketch.State(64)
    (1L to 50000L).foreach(i => st.update(((i * 2654435761L) % 100000L).toDouble))
    assert(st.levelCompactions.head > 1L, "level 0 must have compacted repeatedly")
    assert(st.levelCompactions.sum == st.compactions,
      "global counter must equal the per-level sum")
    val rt = KllSketch.deserialize(KllSketch.serialize(st))
    assert(rt.levelCompactions == st.levelCompactions,
      "per-level compaction counts must survive serialization")
    assert(rt.n == st.n && rt.minV == st.minV && rt.maxV == st.maxV)
    // stored sketches are durable artifacts: a foreign/older layout must
    // fail LOUDLY at the version gate, never silently misalign into a
    // corrupt sketch (both the full deserialize and the fixed-offset
    // count() fast path check the magic)
    val foreign = KllSketch.serialize(st).clone()
    foreign(0) = 0; foreign(1) = 0; foreign(2) = 0; foreign(3) = 64 // old "int k" head
    intercept[IllegalArgumentException](KllSketch.deserialize(foreign))
    intercept[IllegalArgumentException](KllSketch.count(foreign))
  }

  test("kll sketches survive a parquet round trip; nulls and empties are safe") {
    val s0 = spark
    import s0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kll").toString
    val d = (1L to 3000L).map(i => (i % 3, i.toDouble)).toDF("day", "v")
    d.groupBy("day").agg(Sketches.kllSketch(col("v")).as("kll"))
      .write.parquet(dir + "/sketches")
    val back = spark.read.parquet(dir + "/sketches")
    val row = back.agg(Sketches.kllMerge(col("kll")).as("sk"))
      .select(Sketches.kllCount(col("sk")),
        Sketches.kllQuantile(col("sk"), 0.0),
        Sketches.kllQuantile(col("sk"), 1.0),
        Sketches.kllQuantile(col("sk"), 0.5)).head()
    assert(row.getLong(0) == 3000L)
    assert(row.getDouble(1) == 1.0 && row.getDouble(2) == 3000.0)
    assert(math.abs(row.getDouble(3) - 1500.0) <= 75.0) // 2.5% of n in rank==value
    // nulls skipped; an all-null column sketches to n=0 / NaN quantile
    val empty = Seq(Option.empty[Double], Option.empty[Double]).toDF("v")
      .agg(Sketches.kllSketch(col("v")).as("sk"))
      .select(Sketches.kllCount(col("sk")),
        Sketches.kllQuantile(col("sk"), 0.5)).head()
    assert(empty.getLong(0) == 0L && empty.getDouble(1).isNaN)
    // null sketches (outer-join absent days) contribute nothing
    val one = d.agg(Sketches.kllSketch(col("v")).as("sk")).head().getAs[Array[Byte]](0)
    val viaNull = Seq(Option(one), Option.empty[Array[Byte]]).toDF("sk")
      .agg(Sketches.kllMerge(col("sk")).as("m"))
      .select(Sketches.kllCount(col("m"))).head().getLong(0)
    assert(viaNull == 3000L)
  }
}
