package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift
import graft.operators.Drift.{CategoricalDim, NumericDim}

class DriftSpec extends AnyFunSuite with SparkFixture {

  private def refCur() = {
    val s = spark
    import s.implicits._
    // ref: 6 rows over 2 numeric bins + 3 categories; cur shifts the
    // numeric mass up, introduces a BRAND-NEW category and nulls
    val ref = Seq(
      (1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "a"),
      (4L, 40.0, "b"), (5L, 50.0, "b"), (6L, 60.0, "c"))
      .toDF("id", "x", "k")
    val cur = Seq(
      (1L, Some(110.0), Some("a")), (2L, Some(120.0), Some("d")),
      (3L, Some(130.0), Some("d")), (4L, None, None))
      .toDF("id", "x", "k")
    (ref, cur)
  }

  test("numeric binning: edge semantics (count of edges <= x) and null bin") {
    val (ref, cur) = refCur()
    val dims = Seq(NumericDim("x", Seq(25.0, 100.0)): Drift.Dim)
    val got = Drift.bins(ref, cur, dims).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    // ref: 10,20 < 25 -> b00; 30,40,50,60 in [25,100) -> b01; cur: all
    // non-null >= 100 -> b02; one null -> z_null
    assert(got == Map(
      "b00" -> ((2L, 0L)), "b01" -> ((4L, 0L)),
      "b02" -> ((0L, 3L)), "z_null" -> ((0L, 1L))))
  }

  test("categorical: top set from the REFERENCE side; new category -> y_other") {
    val (ref, cur) = refCur()
    val dims = Seq(CategoricalDim("k", top = 2): Drift.Dim)
    val got = Drift.bins(ref, cur, dims).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    // ref top-2 by freq (ties by value): a(3), b(2). c -> y_other on the
    // ref side; cur's brand-new d (unseen in ref) also lands in y_other,
    // and the cur null goes to z_null.
    assert(got == Map(
      "v_a" -> ((3L, 1L)), "v_b" -> ((2L, 0L)),
      "y_other" -> ((1L, 2L)), "z_null" -> ((0L, 1L))))
  }

  test("report: PSI finite with empty bins, non-negative, identical-side PSI is 0") {
    val (ref, cur) = refCur()
    val dims: Seq[Drift.Dim] = Seq(
      NumericDim("x", Seq(25.0, 100.0)), CategoricalDim("k", top = 2))
    val rep = Drift.report(ref, cur, dims, psiBpThreshold = 1000L).collect()
      .map(r => r.getString(0) -> ((r.getLong(4), r.getBoolean(5)))).toMap
    assert(rep.keySet == Set("x", "k"))
    assert(rep.values.forall { case (bp, _) => bp >= 0L })
    // total numeric displacement: every cur row left the ref bins
    assert(rep("x")._1 > 2500L && rep("x")._2)
    // same frame on both sides -> every smoothed p equals q -> PSI 0
    val same = Drift.report(ref, ref, dims).collect()
    assert(same.forall(r => r.getLong(4) == 0L && !r.getBoolean(5)))
  }

  test("report is partitioning-invariant (sorted sequential fold)") {
    val (ref, cur) = refCur()
    val dims: Seq[Drift.Dim] = Seq(
      NumericDim("x", Seq(25.0, 100.0)), CategoricalDim("k", top = 2))
    val a = Drift.report(ref.repartition(1), cur.repartition(1), dims).collect()
    val b = Drift.report(ref.repartition(7), cur.repartition(7), dims).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }

  test("binsBy/reportBy: per-group cells, global top sets, absent group still scores") {
    val s = spark
    import s.implicits._
    val ref = Seq(
      ("g1", 10.0, "a"), ("g1", 20.0, "a"), ("g1", 200.0, "b"),
      ("g2", 10.0, "c"), ("g2", 15.0, "c"))  // c: 2 global vs a: 2 -> tie, a wins by value
      .toDF("src", "x", "k")
    val cur = Seq(
      ("g1", 150.0, "a"),           // g1 numeric mass moved up
      ("g3", 10.0, "zz"))           // brand-new group, brand-new category
      .toDF("src", "x", "k")
    val dims: Seq[Drift.Dim] = Seq(
      NumericDim("x", Seq(100.0)), CategoricalDim("k", top = 1))
    val cells = Drift.binsBy(ref, cur, dims, Seq("src")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // global top-1 of k: a and c both count 2, tie-break by value -> a
    assert(cells(("g1", "k", "v_a")) == ((2L, 1L)))
    assert(cells(("g2", "k", "y_other")) == ((2L, 0L))) // c collapses: global top set
    assert(cells(("g3", "k", "y_other")) == ((0L, 1L))) // new group, zero-filled ref side
    assert(cells(("g1", "x", "b00")) == ((2L, 0L)))
    assert(cells(("g1", "x", "b01")) == ((1L, 1L)))
    val rep = Drift.reportBy(ref, cur, dims, Seq("src")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    assert(rep.keySet.map(_._1) == Set("g1", "g2", "g3"),
      "groups on either side all score")
    assert(rep.values.forall(_ >= 0L))
    // group columns must not also be dimensions
    intercept[IllegalArgumentException](
      Drift.binsBy(ref, cur, dims, Seq("x")))
    intercept[IllegalArgumentException](
      Drift.binsBy(ref, cur, dims, Nil))
  }

  test("kllEdges: deterministic reference-quantile edges feed NumericDim") {
    val s = spark
    import s.implicits._
    val ref = (1 to 1000).map(_.toDouble).toDF("x")
    val edges = Drift.kllEdges(ref, "x", nBins = 4)
    assert(edges.size == 3 && edges == edges.sorted && edges.distinct == edges)
    // quartile edges of 1..1000 land near 250/500/750 (KLL rank error
    // is a few % at n=1000 with the default k)
    assert(edges.zip(Seq(250.0, 500.0, 750.0)).forall {
      case (e, t) => math.abs(e - t) <= 30 }, s"edges off: $edges")
    // RNG-free: the same partitioning reproduces the edges exactly;
    // a different partitioning stays within the sketch's rank error
    // (the contract is derive-once-and-store, like the sketch itself)
    assert(Drift.kllEdges(ref, "x", 4) == edges)
    val e7 = Drift.kllEdges(ref.repartition(7), "x", 4)
    assert(e7.zip(Seq(250.0, 500.0, 750.0)).forall {
      case (e, t) => math.abs(e - t) <= 30 }, s"repartitioned edges off: $e7")
    // composes into the binning contract without further plumbing
    val b = Drift.bins(ref, ref.limit(100), Seq(NumericDim("x", edges): Drift.Dim))
      .collect()
    assert(b.map(_.getLong(2)).sum == 1000L && b.map(_.getLong(3)).sum == 100L)
    // a constant column (one heavy atom) collapses to a single edge;
    // an all-null column yields none
    assert(Drift.kllEdges(Seq.fill(50)(7.0).toDF("x"), "x", 4) == Seq(7.0))
    assert(Drift.kllEdges(Seq[Option[Double]](None, None).toDF("x"), "x", 4).isEmpty)
    intercept[IllegalArgumentException](Drift.kllEdges(ref, "x", 1))
  }

  test("API guards: bad edges, duplicate dims, empty dims") {
    val (ref, cur) = refCur()
    intercept[IllegalArgumentException](NumericDim("x", Seq(2.0, 1.0)))
    intercept[IllegalArgumentException](NumericDim("x", Seq(1.0, 1.0)))
    intercept[IllegalArgumentException](NumericDim("x", Nil))
    intercept[IllegalArgumentException](CategoricalDim("k", top = 0))
    intercept[IllegalArgumentException](
      Drift.bins(ref, cur, Seq(CategoricalDim("k"), CategoricalDim("k"))))
    intercept[IllegalArgumentException](Drift.bins(ref, cur, Nil))
  }

  test("NaN values get their own bin; NaN edges rejected") {
    val s = spark
    import s.implicits._
    val ref = Seq(1.0, 2.0, 3.0).toDF("x")
    val cur = Seq(Some(1.0), Some(Double.NaN), None).toDF("x")
    val got = Drift.bins(ref, cur, Seq(NumericDim("x", Seq(2.5)): Drift.Dim))
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    // NaN must NOT alias into the top bin b01 — it is its own bin, so a
    // NaN-rate shift reads as drift
    assert(got == Map(
      "b00" -> ((2L, 1L)), "b01" -> ((1L, 0L)),
      "y_nan" -> ((0L, 1L)), "z_null" -> ((0L, 1L))))
    intercept[IllegalArgumentException](NumericDim("x", Seq(1.0, Double.NaN)))
  }

  test("spec save/load round-trip: loaded bins == resolved bins") {
    val (ref, cur) = refCur()
    val dims: Seq[Drift.Dim] = Seq(
      NumericDim("x", Seq(25.0, 100.0)), CategoricalDim("k", top = 2))
    val spec = Drift.resolve(ref, dims)
    val path = java.nio.file.Files.createTempDirectory("graft-driftspec").toString + "/spec"
    Drift.saveSpec(spark, spec, path)
    val loaded = Drift.loadSpec(spark, path)
    assert(loaded == spec)
    // and the report computed through the loaded spec is identical
    def rep(e: Seq[(String, org.apache.spark.sql.Column)]) =
      Drift.reportFromContingency(Drift.binsWith(e, ref, cur)).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    assert(rep(Drift.exprsFromSpec(loaded)) == rep(Drift.exprsFromSpec(spec)))
    // an empty categorical top set (all-null ref column) survives the
    // round trip via the marker row
    val s = spark
    import s.implicits._
    val nullRef = Seq[(Option[String], Long)]((None, 1L), (None, 2L)).toDF("k", "id")
    val spec2 = Drift.resolve(nullRef, Seq(CategoricalDim("k")))
    val p2 = java.nio.file.Files.createTempDirectory("graft-driftspec2").toString + "/spec"
    Drift.saveSpec(spark, spec2, p2)
    assert(Drift.loadSpec(spark, p2) == spec2)
    assert(spec2.dims.head.topVals.isEmpty)
  }

  test("scoreWindows: per-window psi_bp == the batch report over that window's rows") {
    val s = spark
    import s.implicits._
    // two "windows" of current data scored against one reference
    val ref = Seq(10.0, 20.0, 30.0, 40.0, 110.0).toDF("x")
    val w1  = Seq(10.0, 20.0, 30.0).toDF("x")                 // close to ref
    val w2  = Seq(110.0, 120.0, 130.0, 140.0).toDF("x")       // shifted up
    val dims: Seq[Drift.Dim] = Seq(NumericDim("x", Seq(25.0, 100.0)))
    val exprs = Drift.cellExprs(ref, dims)
    val refC = Drift.referenceCounts(ref, exprs)
    val scored = Drift.scoreWindows(
        wb2(w1, exprs, 1L).unionByName(wb2(w2, exprs, 2L)),
        refC, "window_s").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(5)).toMap
    // the batch report over the same window's rows, same term order
    def batchPsi(w: org.apache.spark.sql.DataFrame): Long =
      Drift.reportFromContingency(Drift.binsWith(exprs, ref, w)).collect()
        .head.getLong(4)
    assert(scored((1L, "x")) == batchPsi(w1))
    assert(scored((2L, "x")) == batchPsi(w2))
    // the shifted window reads as much more drifted
    assert(scored((2L, "x")) > scored((1L, "x")))
    // a window bin the REFERENCE never saw (possible only when label
    // expressions were resolved elsewhere) still zero-fills on the ref
    // side — same cells as the batch face, term for term
    val refNarrow = Seq(10.0, 20.0).toDF("x") // only b00
    val wWide = Seq(50.0, 110.0).toDF("x")    // b01 + b02, both ref-unseen
    val exprsN = Drift.cellExprs(refNarrow, dims)
    val scoredN = Drift.scoreWindows(
        wb2(wWide, exprsN, 9L), Drift.referenceCounts(refNarrow, exprsN),
        "window_s").collect()
    val batchN = Drift.reportFromContingency(
        Drift.binsWith(exprsN, refNarrow, wWide)).collect()
    assert(scoredN.head.getLong(5) == batchN.head.getLong(4),
      s"ref-unseen bins diverged: ${scoredN.toSeq} vs ${batchN.toSeq}")
    assert(scoredN.head.getLong(4) == 3L) // bins = b00 ∪ {b01, b02}
    // an EMPTY reference (monitor bootstrapped before the first crawl)
    // scores with ref_n=0 zero-fill — maximal drift, loudly visible —
    // never a silent null row; equals the batch face over an empty ref
    val scoredE = Drift.scoreWindowsWith(
        wb2(w1, exprs, 7L), Drift.RefCells(Map.empty), "window_s").collect()
    assert(scoredE.length == 1 && scoredE.head.getLong(2) == 0L &&
      !scoredE.head.isNullAt(5), s"empty-ref scoring nulled: ${scoredE.toSeq}")
    val batchE = Drift.reportFromContingency(
        Drift.binsWith(exprs, ref.limit(0), w1)).collect()
    assert(scoredE.head.getLong(5) == batchE.head.getLong(4))
    // (with only 2 observed bins the smoothing keeps an empty-ref PSI
    // modest — ~405 bp here — so no drifted assertion: the contract is
    // equality with the batch face, not a threshold)
  }

  // the windowed contingency shape for a single tagged window (shared
  // by the scoreWindows tests)
  private def wb2(w: org.apache.spark.sql.DataFrame,
                  exprs: Seq[(String, org.apache.spark.sql.Column)],
                  tag: Long): org.apache.spark.sql.DataFrame =
    w.select(Drift.cellColumn(exprs).as("cell"))
      .groupBy(col("cell.column").as("column"), col("cell.bin").as("bin"))
      .agg(count(lit(1)).as("cur_n"))
      .withColumn("window_s", lit(tag))
      .select("window_s", "column", "bin", "cur_n")

  test("scale shape: one shuffle per side, contingency join stays tiny") {
    val (ref, cur) = refCur()
    val dims: Seq[Drift.Dim] = Seq(
      NumericDim("x", Seq(25.0, 100.0)), CategoricalDim("k", top = 2))
    val plan = Drift.bins(ref, cur, dims).queryExecution.executedPlan.toString
    // the per-side aggregate must partial-aggregate before its exchange
    // (map-side combine caps the shuffle at O(partitions x bins))
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      s"expected partial+final aggregates per side in:\n$plan")
  }
}
