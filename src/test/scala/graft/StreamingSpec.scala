package graft

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event

class StreamingSpec extends AnyFunSuite with SparkFixture {

  /** minutes after a fixed epoch-day base, as a timestamp */
  private def ts(min: Long) = new Timestamp(86400000L + min * 60000L)

  private def ev(id: Long, min: Long, user: Long, v: Double = 1.0) =
    Event(id, ts(min), user, "click", v, "{}")

  test("sessionizeBatch: gap splits, per-session aggregates") {
    val s = spark
    import s.implicits._
    val events = Seq(
      ev(1, 0, 1, 1.0), ev(2, 10, 1, 2.0), ev(3, 50, 1, 4.0), // 10->50 > 30min gap
      ev(4, 5, 2, 8.0)).toDF()
    val got = StreamingOps.sessionizeBatch(events, gapMinutes = 30)
      .orderBy("user_id", "session_id").collect()
    assert(got.length == 3)
    // columns: user_id, session_id, session_start, session_end, n_events, total_value
    val first = got(0)
    assert(first.getLong(0) == 1L && first.getLong(4) == 2L) // n_events
    assert(first.getDouble(5) == 3.0) // total_value 1+2
    assert(got(1).getLong(4) == 1L && got(1).getDouble(5) == 4.0)
    assert(got(2).getLong(0) == 2L)
  }

  test("sessionize on a batch Dataset emits open sessions and matches sessionizeBatch") {
    val s = spark
    import s.implicits._
    val events = Seq(
      ev(1, 0, 1, 1.0), ev(2, 10, 1, 2.0), ev(3, 50, 1, 4.0), // 2 sessions
      ev(4, 5, 2, 8.0)) // single still-open session — the regression case
    val got = StreamingOps.sessionize(events.toDS(), Duration.ofMinutes(30))
      .collect().map(o => (o.user_id, o.session_start.getTime, o.n_events, o.total_value))
      .sortBy(x => (x._1, x._2))
    val batch = StreamingOps.sessionizeBatch(events.toDF(), gapMinutes = 30)
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).getTime, r.getLong(4), r.getDouble(5)))
    assert(got.length == 3) // user 2's only session must not be dropped
    assert(got.toSeq == batch.toSeq)
  }

  test("tumblingAgg in batch mode groups into hour windows") {
    val s = spark
    import s.implicits._
    val events = Seq(ev(1, 1, 1), ev(2, 30, 1), ev(3, 70, 1)).toDF()
    val got = StreamingOps.tumblingAgg(events, "1 hour", "0 seconds")
      .orderBy("window_start").collect()
    assert(got.length == 2)
    assert(got(0).getLong(2) == 2L) // first hour has 2 events
    assert(got(1).getLong(2) == 1L)
  }

  test("streaming sessionize emits a session after event-time timeout") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingOps.sessionize(input.toDS(), Duration.ofMinutes(30))
      .writeStream.format("memory").queryName("t_sessions")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 0, 1, 1.0), ev(2, 10, 1, 2.0))
      q.processAllAvailable() // watermark still at batch-1 max - lateness
      input.addData(ev(3, 600, 99)) // push watermark far past user-1 timeout
      q.processAllAvailable()
      input.addData(ev(4, 601, 99)) // next batch processes the timeout
      q.processAllAvailable()
      val got = spark.table("t_sessions").collect()
      val u1 = got.find(_.getLong(0) == 1L)
      assert(u1.isDefined, s"user-1 session not emitted: ${got.mkString(";")}")
      assert(u1.get.getLong(3) == 2L) // both events in one session
      assert(u1.get.getDouble(4) == 3.0)
    } finally stopStream(q)
  }

  test("streaming sessionize over events.parquet == batch sessionize (differential)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    // real corpus replay: 1000 events / 15 users at sf0.001. readEventsNs
    // normalizes ts to ns longs whatever the file carries; both paths
    // consume the SAME ms-precision conversion so the comparison is exact.
    val raw = graft.sources.PsIO.readEventsNs(s, "/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), timestamp_millis(expr("ts div 1000000")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val all = raw.as[Event].collect().sortBy(_.ts.getTime) // sorted replay: nothing late
    val batch = StreamingOps.sessionizeBatch(raw, gapMinutes = 30)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))
      .sortBy(x => (x._1, x._2))

    val input = MemoryStream[Event]
    val q = StreamingOps.sessionize(input.toDS(), Duration.ofMinutes(30))
      .writeStream.format("memory").queryName("t_diff_sessions")
      .outputMode("append").start()
    try {
      // replay in 3 time-ordered micro-batches (sessions span batches via
      // state), then sentinel batches push the watermark past every real
      // session's timeout so all of them close and emit
      val chunks = all.grouped((all.length + 2) / 3).toSeq
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      val flushT = all.last.ts.getTime + 86400000L
      input.addData(Event(-1L, new Timestamp(flushT), -1L, "flush", 0.0, "{}"))
      q.processAllAvailable()
      input.addData(Event(-2L, new Timestamp(flushT + 60000L), -1L, "flush", 0.0, "{}"))
      q.processAllAvailable()

      val got = s.table("t_diff_sessions")
        .filter(col("user_id") >= 0).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))
        .sortBy(x => (x._1, x._2))
      assert(got.length == batch.length,
        s"streaming closed ${got.length} sessions, batch found ${batch.length}")
      assert(got.toSeq == batch.toSeq,
        "streaming sessions must equal batch sessions on the same replay")
    } finally stopStream(q)
  }

  test("streamingDriftBins == batch face; window report == Drift.report on the slice") {
    import graft.operators.Drift
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val raw = graft.sources.PsIO.readEventsNs(s, "/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), timestamp_millis(expr("ts div 1000000")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val dims: Seq[Drift.Dim] = Seq(
      Drift.NumericDim("value", Seq(10.0, 100.0)),
      Drift.CategoricalDim("event_type", top = 3))
    // bin labels resolved ONCE against the static reference (= the full
    // batch here); the stream must never re-derive top sets
    val exprs = Drift.cellExprs(raw, dims)

    // batch face: the same transform on the batch frame (watermark no-op)
    val batch = StreamingOps.streamingDriftBins(raw, exprs, "1 hour", "0 seconds")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2, x._3))
    assert(batch.nonEmpty)

    val all = raw.as[Event].collect().sortBy(_.ts.getTime)
    val input = MemoryStream[Event]
    val q = StreamingOps.streamingDriftBins(input.toDF(), exprs, "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("t_drift_bins")
      .outputMode("append").start()
    try {
      all.grouped((all.length + 2) / 3)
        .foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      // sentinel far past the horizon: watermark passes every real window
      val flushT = all.last.ts.getTime + 7200000L
      input.addData(Event(-1L, new Timestamp(flushT), -1L, "flush", 0.0, "{}"))
      q.processAllAvailable()
      val got = s.table("t_drift_bins")
        .filter(col("window_start") < new Timestamp(flushT - 3600000L))
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2, x._3))
      assert(got.toSeq == batch.toSeq,
        "streaming per-window contingency must equal the batch face")
    } finally stopStream(q)

    // scoring composition: one window's emitted cells joined to the
    // static reference counts + reportFromContingency == Drift.report
    // of that window's slice (the exact batch semantics, per window)
    val w0 = batch.map(_._1).min
    val slice = raw.filter(col("ts") >= new Timestamp(w0)
      && col("ts") < new Timestamp(w0 + 3600000L))
    val refCounts = Drift.bins(raw, raw, dims).select("column", "bin", "ref_n")
    val winCells = StreamingOps.streamingDriftBins(raw, exprs, "1 hour", "0 seconds")
      .filter(col("window_start") === new Timestamp(w0))
      .select(col("column"), col("bin"), col("cur_n"))
    val joined = refCounts.join(winCells, Seq("column", "bin"), "full_outer")
      .select(col("column"), col("bin"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val viaStream = Drift.reportFromContingency(joined).collect().map(_.toString).sorted
    val viaBatch = Drift.report(raw, slice, dims).collect().map(_.toString).sorted
    assert(viaStream.sameElements(viaBatch),
      "windowed contingency + reportFromContingency must equal Drift.report on the slice")
  }

  test("streamingNearDupCandidates over documents == batch LSH candidate set (differential)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // the batch candidate relation from the SAME shared banding
    val batchCand = {
      val b = graft.operators.Dedup.lshBandBuckets(docs, "doc_id", "text")
      val l = b.select(col("band"), col("bucket"), col("id").as("a_id"))
      val r = b.select(col("band"), col("bucket"), col("id").as("b_id"))
      l.join(r, Seq("band", "bucket")).filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    }
    val rows = docs.as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingNearDupCandidates(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("t_neardup_cand")
      .outputMode("append").start()
    try {
      // 3 micro-batches: pairs must form across batches via bucket state
      rows.grouped((rows.length + 2) / 3).foreach { c =>
        input.addData(c.toSeq); q.processAllAvailable()
      }
      val got = s.table("t_neardup_cand").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == batchCand,
        s"streaming candidates ${got.size} != batch candidates ${batchCand.size}")
      // every batch-CONFIRMED near-dup pair is among the candidates
      val confirmed = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")
        .select("a_id", "b_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(confirmed.subsetOf(got))
    } finally stopStream(q)
  }

  test("streaming CDC loop: foreachBatch applyChanges maintains a parquet snapshot") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    // version-0 snapshot on disk
    val v0 = (1L to 10L).map(k => (k, s"v$k"))
    v0.toDF("k", "v").write.parquet(s"$root/v0")
    val version = new java.util.concurrent.atomic.AtomicInteger(0)

    val input = MemoryStream[(Long, String, Long, Boolean)] // k, v, ts, del
    val q = input.toDF().toDF("k", "v", "ts", "del")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // reduce the raw CDC feed to latest-per-key (streamingDelta's
        // ordering rule: ts, delete-last), then MERGE into the snapshot
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy(col("ts").desc, col("del").desc)
        val latest = batch.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn", "ts")
        val cur = version.get()
        val snap = s.read.parquet(s"$root/v$cur")
        graft.operators.Snapshot.applyChanges(snap, latest, Seq("k"), "del")
          .write.parquet(s"$root/v${cur + 1}")
        version.incrementAndGet()
        ()
      }
      .start()
    try {
      input.addData((3L, "v3-new", 10L, false), (11L, "v11", 11L, false))
      q.processAllAvailable()
      input.addData((5L, "", 20L, true), (11L, "v11-new", 21L, false))
      q.processAllAvailable()
      // same-batch churn: insert then delete nets to absent
      input.addData((12L, "v12", 30L, false), (12L, "", 31L, true))
      q.processAllAvailable()
      val fin = s.read.parquet(s"$root/v${version.get()}")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect = (v0.toMap - 5L) ++ Map(3L -> "v3-new", 11L -> "v11-new")
      assert(fin == expect, s"snapshot diverged: $fin")
    } finally stopStream(q)
  }

  test("HLL sketch aggregates run on a windowed stream; stored windows merge to the total") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[Event]
    // distinct users per hour window, as STORED sketches (append mode:
    // windows emit once closed by the watermark)
    val q = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.operators.Sketches.hllSketch(col("user_id")).as("sk"))
      .select(col("window.start").as("ws"), col("sk"))
      .writeStream.format("memory").queryName("t_hll_win")
      .outputMode("append").start()
    try {
      def ev(id: Long, h: Int, u: Long) =
        Event(id, new Timestamp(3600000L * h + id), u, "e", 1.0, "{}")
      // hour 0: users 1-20; hour 1: users 11-30; flush via hour 3
      input.addData((1 to 20).map(i => ev(i, 0, i.toLong)))
      input.addData((1 to 20).map(i => ev(100 + i, 1, 10L + i)))
      q.processAllAvailable()
      input.addData(ev(999, 3, -1L))
      q.processAllAvailable()
      val wins = s.table("t_hll_win").collect()
        .map(r => r.getTimestamp(0).getTime -> r.getAs[Array[Byte]](1)).toMap
      assert(wins.keySet == Set(0L, 3600000L))
      def est(b: Array[Byte]) = graft.functions.HllSketch.estimate(b)
      assert(math.abs(est(wins(0L)) - 20.0) < 2.0)
      assert(math.abs(est(wins(3600000L)) - 20.0) < 2.0)
      // the stored per-window sketches merge to the cross-window total
      // (30 distinct users) without touching the events again
      val merged = graft.functions.HllSketch.mergeRegs(wins(0L), wins(3600000L))
      assert(math.abs(est(merged) - 30.0) < 3.0)
    } finally stopStream(q)
  }

  test("KLL sketch aggregates run on a windowed stream; stored windows merge to the total") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[Event]
    // per-hour value-quantile sketches as STORED binaries (append mode)
    val q = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.operators.Sketches.kllSketch(col("value")).as("sk"))
      .select(col("window.start").as("ws"), col("sk"))
      .writeStream.format("memory").queryName("t_kll_win")
      .outputMode("append").start()
    try {
      def ev(id: Long, h: Int, v: Double) =
        Event(id, new Timestamp(3600000L * h + id), 1L, "e", v, "{}")
      // hour 0: values 1..100; hour 1: values 101..200; flush via hour 3
      input.addData((1 to 100).map(i => ev(i, 0, i.toDouble)))
      input.addData((1 to 100).map(i => ev(200 + i, 1, 100.0 + i)))
      q.processAllAvailable()
      input.addData(ev(999, 3, 0.0))
      q.processAllAvailable()
      val wins = s.table("t_kll_win").collect()
        .map(r => r.getTimestamp(0).getTime -> r.getAs[Array[Byte]](1)).toMap
      assert(wins.keySet == Set(0L, 3600000L))
      import graft.functions.KllSketch
      assert(KllSketch.count(wins(0L)) == 100L)
      assert(KllSketch.quantile(wins(0L), 0.5) == 50.0) // n < k: exact
      // the stored per-window sketches merge to cross-window quantiles
      // without touching the events again; 200 items still fit the
      // level-0 capacity, so the merged median/extremes are exact
      val merged = KllSketch.serialize(
        KllSketch.deserialize(wins(0L)).mergeIn(KllSketch.deserialize(wins(3600000L))))
      assert(KllSketch.count(merged) == 200L)
      assert(KllSketch.quantile(merged, 0.0) == 1.0 &&
        KllSketch.quantile(merged, 1.0) == 200.0)
      assert(KllSketch.quantile(merged, 0.5) == 100.0)
    } finally stopStream(q)
  }

  test("streamingNearDupCandidates caps hot buckets at maxBucket members") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    // identical docs share EVERY band bucket; with maxBucket=3 only the
    // 3 lowest ids are admitted, so the pair set stops at 3 choose 2
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingNearDupCandidates(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", maxBucket = 3)
      .writeStream.format("memory").queryName("t_neardup_cap")
      .outputMode("append").start()
    try {
      input.addData((1L to 6L).map(i => (i, "the same exact document text")))
      q.processAllAvailable()
      val got = s.table("t_neardup_cap").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    } finally stopStream(q)
  }

  test("stream-stream interval join == batch interval join (differential)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val raw = graft.sources.PsIO.readEventsNs(s, "/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), timestamp_millis(expr("ts div 1000000")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val delay = expr("INTERVAL 30 MINUTES")
    val batch = StreamingOps.intervalJoin(
        raw.filter(col("event_type") === "click"),
        raw.filter(col("event_type") === "purchase"),
        "user_id", "ts", delay, lateness = None)
      .select("l_event_id", "r_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted

    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = StreamingOps.intervalJoin(
      clicks.toDS().toDF(), purchases.toDS().toDF(),
      "user_id", "ts", delay, lateness = Some("10 minutes"))
    val q = joined.writeStream.format("memory").queryName("t_ssjoin")
      .outputMode("append").start()
    try {
      // time-ordered replay in 2 chunks per side: matches spanning
      // chunks must come from buffered join state, not co-arrival
      val all = raw.as[Event].collect().sortBy(_.ts.getTime)
      val (c, p) = (all.filter(_.event_type == "click"),
        all.filter(_.event_type == "purchase"))
      clicks.addData(c.take(c.length / 2).toSeq)
      purchases.addData(p.take(p.length / 2).toSeq)
      q.processAllAvailable()
      clicks.addData(c.drop(c.length / 2).toSeq)
      purchases.addData(p.drop(p.length / 2).toSeq)
      q.processAllAvailable()
      val got = s.table("t_ssjoin").select("l_event_id", "r_event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == batch.toSeq,
        s"streaming join emitted ${got.length} pairs, batch ${batch.length}")
    } finally stopStream(q)
  }

  test("readEventStream: file source feeds the same windowed agg") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Seq(ev(1, 1, 1, 1.0), ev(2, 30, 2, 2.0)).toDF()
      .write.mode("overwrite").parquet(dir)
    val q = StreamingOps.tumblingAgg(
        StreamingOps.readEventStream(s, dir), "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("t_filewin")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("t_filewin").collect()
      assert(got.length == 1) // both clicks fall in the same hour window
      assert(got.head.getLong(2) == 2L && got.head.getDouble(3) == 3.0)
    } finally stopStream(q)
  }

  test("streamingDedup drops duplicate keys within the watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingOps.streamingDedup(input.toDS().toDF(), Seq("user_id"))
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 0, 1), ev(2, 1, 1), ev(3, 2, 2)) // user 1 twice
      q.processAllAvailable()
      val got = spark.table("t_dedup").collect()
      assert(got.length == 2) // one row per user
      assert(got.map(_.getLong(2)).toSet == Set(1L, 2L))
    } finally stopStream(q)
  }

  test("streaming image dedup: dHash computed in-stream, duplicates dropped by hash") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.operators.Multimodal
    def png(v: Int) = Multimodal.ImageCodec.encodePng(8, 8,
      Array.tabulate(8 * 8 * 3)(i => (((i / 3) % 8) * v % 256).toByte))
    val input = MemoryStream[Multimodal.MediaRecord]
    // live-ingestion shape: perceptual hash as a map-only stage feeding
    // the watermark-bounded stateful dedup — dHash needs no state, so it
    // composes into readStream pipelines as-is
    val hashed = input.toDS()
      .map(m => (m.id, new Timestamp(86400000L + m.id),
        Multimodal.ImageCodec.dHash(m.payload).getOrElse(-1L)))
      .toDF("id", "ts", "dhash")
    val q = StreamingOps.streamingDedup(hashed, Seq("dhash"))
      .writeStream.format("memory").queryName("t_imgdedup")
      .outputMode("append").start()
    try {
      input.addData(
        Multimodal.MediaRecord(1L, "image/png", png(31), 8, 8, 0L),
        Multimodal.MediaRecord(2L, "image/png", png(31), 8, 8, 0L), // same image again
        Multimodal.MediaRecord(3L, "image/png", png(97), 8, 8, 0L))
      q.processAllAvailable()
      val got = s.table("t_imgdedup").collect().map(_.getLong(0)).sorted.toSeq
      assert(got.length == 2 && got.contains(3L)) // one of {1,2} + 3
    } finally stopStream(q)
  }

  test("stateless curation ops (redact/quality/langid) run unchanged on a stream") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.functions.TextAnalysis
    val docs = Seq(
      (1L, "the cat and the dog mail me at a.b@c.example now"),
      (2L, "der und die das ist von https://x.example/y ok"),
      (3L, "short"))
    def curate(df: org.apache.spark.sql.DataFrame) = df.select(
      col("_1").as("id"),
      TextAnalysis.redactPii(col("_2")).as("clean"),
      TextAnalysis.qualityScore(col("_2")).as("q"),
      TextAnalysis.langId(col("_2")).as("lang"),
      // the online boilerplate ops are stateless projections too —
      // their streaming-safety claim is exactly this test
      TextAnalysis.dedupLines(col("_2"), sep = " ").as("dl"),
      TextAnalysis.stripLines(col("_2"), Seq("the"), sep = " ").as("sl"))
    val input = MemoryStream[(Long, String)]
    val q = curate(input.toDS().toDF())
      .writeStream.format("memory").queryName("t_curate")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("t_curate").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3),
          r.getString(4), r.getString(5)))
        .sortBy(_._1).toSeq
      val batch = curate(docs.toDF()).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3),
          r.getString(4), r.getString(5)))
        .sortBy(_._1).toSeq
      assert(streamed == batch) // per-row ops: stream face == batch face
      assert(streamed.head._2.contains("<EMAIL>"))
      assert(streamed(1)._2.contains("<URL>") && streamed(1)._4 == "de")
      assert(streamed.head._5.startsWith("the cat and") &&
        !streamed.head._5.split(" ").groupBy(identity).values.exists(_.length > 1))
      assert(!streamed.head._6.split(" ").contains("the"))
    } finally stopStream(q)
  }

  test("Checks.flag routes bad rows unchanged on a stream (stateless gate)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.operators.Checks
    val rows = Seq((1L, 10.0, "F"), (2L, 999.0, "O"), (3L, 50.0, "X"))
    def gate(df: org.apache.spark.sql.DataFrame) = Checks.flag(
      df.toDF("id", "amount", "status"),
      Seq(Checks.InRange("amount", 0.0, 500.0),
        Checks.OneOf("status", Seq("F", "O"))))
    val input = MemoryStream[(Long, Double, String)]
    val q = gate(input.toDS().toDF())
      .writeStream.format("memory").queryName("t_checks")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
        .sortBy(_._1).toSeq
      assert(shape(spark.table("t_checks")) == shape(gate(rows.toDF())),
        "streamed flags must equal the batch face")
      assert(shape(spark.table("t_checks")).map(_._4) == Seq(false, true, true))
    } finally stopStream(q)
  }

  test("readJsonQuarantine parsing runs unchanged on a stream (text + from_json)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    // the quarantine reader's parse stage is stateless column work, so
    // the same schema'd split runs on a line stream (live ingestion)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val full = org.apache.spark.sql.types.StructType(schema.fields)
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    val input = MemoryStream[String]
    val parsed = input.toDF().select(
      from_json(col("value"), full,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")).as("j"))
      .select(col("j.*"))
    val q = parsed.writeStream.format("memory").queryName("t_jsonq")
      .outputMode("append").start()
    try {
      input.addData("""{"k": 1, "v": "a"}""", "busted line", """{"k": 2, "v": "b"}""")
      q.processAllAvailable()
      val rows = s.table("t_jsonq").collect()
      assert(graft.sources.PsIO.jsonGood(s.table("t_jsonq")).count() == 2)
      assert(graft.sources.PsIO.jsonQuarantined(s.table("t_jsonq"))
        .select("_corrupt").collect().map(_.getString(0)).toSeq == Seq("busted line"))
      assert(rows.length == 3)
    } finally stopStream(q)
  }

  test("chunkDocs runs unchanged on a stream (per-row explode, no state)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), (2L, "a b c"))
    def chunk(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Chunking.chunkDocs(
        df.select(col("_1").as("doc_id"), col("_2").as("text")),
        "doc_id", "text", chunkTokens = 4, overlap = 1)
    val input = MemoryStream[(Long, String)]
    val q = chunk(input.toDS().toDF())
      .writeStream.format("memory").queryName("t_chunk")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("t_chunk").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      val batch = chunk(docs.toDF()).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally stopStream(q)
  }

  test("file source -> windowed agg -> parquet file sink round-trips") {
    val s = spark
    import s.implicits._
    // the full deployment shape: readStream over a landing directory,
    // watermarked tumbling agg, append-mode parquet sink + checkpoint —
    // then the sink directory reads back as a plain batch table
    val srcDir = java.nio.file.Files.createTempDirectory("graft-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck").toString
    Seq(ev(1, 1, 1, 1.0), ev(2, 30, 2, 2.0)).toDF()
      .write.mode("append").parquet(srcDir)
    val q = StreamingOps.tumblingAgg(
        StreamingOps.readEventStream(s, srcDir), "1 hour", "5 minutes")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // new files arriving push the watermark past the first window
      Seq(ev(3, 300, 1)).toDF().write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      Seq(ev(4, 301, 1)).toDF().write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val got = s.read.parquet(outDir).collect()
      assert(got.exists(r => r.getLong(2) == 2L && r.getDouble(3) == 3.0),
        s"closed first-hour window missing from file sink: ${got.mkString(";")}")
    } finally stopStream(q)
  }

  test("streamingAsOf: batch face == native as-of; streaming replay == batch face") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val raw = graft.sources.PsIO.readEventsNs(s, "/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"),
        timestamp_millis(expr("ts div 1000000")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val clicks = raw.filter(col("event_type") === "click")
    // dedup rights per (user, ts): same-instant rights are ambiguous in
    // any as-of (see batch operator's contract)
    val purchases = raw.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max(struct(col("value"), col("event_id"))).as("m"))
      .select(col("user_id"), col("ts"),
        col("m.event_id").as("event_id"), col("m.value").as("value"))

    def toMap(rows: Array[(Long, Option[Long], Option[Double])]) =
      rows.map(r => r._1 -> (r._2, r._3)).toMap

    val native = graft.operators.AsOfJoin.asof(
        clicks.select("event_id", "user_id", "ts"), purchases,
        Seq("user_id"), "ts", "ts", Seq("event_id", "value"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val nativeMap = toMap(native)

    val batchFace = StreamingOps.streamingAsOf(
        clicks, purchases, "user_id", "ts", "event_id", "value")
      .collect().map(j => (j.l_id, j.r_id, j.r_value))
    assert(toMap(batchFace) == nativeMap, "batch face of streamingAsOf vs native")
    assert(nativeMap.nonEmpty && nativeMap.values.exists(_._1.isDefined))

    // streaming replay: time-ordered chunks into both MemoryStreams,
    // then sentinel batches push the watermark past every real left
    val lIn = MemoryStream[Event]
    val rIn = MemoryStream[Event]
    val q = StreamingOps.streamingAsOf(
        lIn.toDS().toDF(), rIn.toDS().toDF(),
        "user_id", "ts", "event_id", "value", lateness = "10 minutes")
      .writeStream.format("memory").queryName("t_asof")
      .outputMode("append").start()
    try {
      val lAll = clicks.as[Event].collect().sortBy(_.ts.getTime)
      val rAll = purchases
        .select(col("event_id"), col("ts"), col("user_id"),
          lit("purchase").as("event_type"), col("value"), lit("{}").as("props"))
        .as[Event].collect().sortBy(_.ts.getTime)
      val cutoffs = Seq(0.33, 0.66, 1.0).map(f =>
        lAll(math.min(lAll.length - 1, (lAll.length * f).toInt - 1)).ts.getTime)
      var (lPrev, rPrev) = (0L, 0L)
      cutoffs.foreach { c =>
        rIn.addData(rAll.filter(e => e.ts.getTime > rPrev && e.ts.getTime <= c).toSeq)
        lIn.addData(lAll.filter(e => e.ts.getTime > lPrev && e.ts.getTime <= c).toSeq)
        lPrev = c; rPrev = c
        q.processAllAvailable()
      }
      // leftovers (rights later than the last click) + watermark flush
      rIn.addData(rAll.filter(_.ts.getTime > rPrev).toSeq)
      val flushT = math.max(lAll.last.ts.getTime, rAll.last.ts.getTime) + 86400000L
      Seq(flushT, flushT + 60000L, flushT + 120000L).foreach { t =>
        lIn.addData(Event(-1L, new Timestamp(t), -1L, "click", 0.0, "{}"))
        q.processAllAvailable()
      }
      val got = s.table("t_asof").filter(col("key") >= 0).collect()
        .map(r => (r.getLong(1),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      assert(got.length == native.length,
        s"streaming emitted ${got.length} of ${native.length} lefts")
      assert(toMap(got) == nativeMap, "streaming replay vs native batch as-of")
    } finally stopStream(q)
  }

  test("streaming tumblingAgg emits closed windows under append mode") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingOps.tumblingAgg(input.toDS().toDF(), "1 hour", "5 minutes")
      .writeStream.format("memory").queryName("t_windows")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 1, 1, 1.0), ev(2, 30, 2, 2.0))
      q.processAllAvailable()
      input.addData(ev(3, 300, 1)) // watermark -> closes the first window
      q.processAllAvailable()
      input.addData(ev(4, 301, 1))
      q.processAllAvailable()
      val got = spark.table("t_windows").collect()
      assert(got.exists(r => r.getLong(2) == 2L && r.getDouble(3) == 3.0),
        s"closed first-hour window missing: ${got.mkString(";")}")
    } finally stopStream(q)
  }

  test("dedupAgainstCorpus runs unchanged on a stream (stream-static anti-join)") {
    // incremental ingestion IS a streaming shape: the live feed drops rows
    // whose normalized fingerprint the static ingested corpus already has.
    // Stateless per micro-batch — the corpus relation is joined fresh each
    // batch, no state store, so the same operator serves backfill (batch)
    // and live (stream) with identical semantics.
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val corpus = Seq(
      (1L, "Shared   Document text"),
      (2L, "other ingested doc")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.Dedup
      .dedupAgainstCorpus(input.toDS().toDF("doc_id", "text"), corpus, "text")
      .writeStream.format("memory").queryName("t_incr")
      .outputMode("append").start()
    try {
      input.addData((10L, "shared document TEXT"), (11L, "genuinely new content"))
      q.processAllAvailable()
      input.addData((12L, "OTHER   ingested DOC"), (13L, "also new"))
      q.processAllAvailable()
      val got = spark.table("t_incr").collect().map(_.getLong(0)).toSet
      assert(got == Set(11L, 13L),
        s"normalized copies must drop, new docs pass: got $got")
    } finally stopStream(q)
  }

  test("streamingDelta: CDC transitions; batch-2 emissions == snapshotDiff") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import StreamingOps.ChangeIn

    // old snapshot: keys 1..5; new snapshot: 2 changed, 4 removed, 6 added
    val oldRows = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
    val newRows = Seq((1L, "a"), (2L, "B"), (3L, "c"), (5L, "e"), (6L, "f"))
    def fp(v: String): Long = v.hashCode.toLong

    val input = MemoryStream[ChangeIn]
    val q = StreamingOps.streamingDelta(
        input.toDF(), "key", col("fp"), "tsMs", col("delete"))
      .writeStream.format("memory").queryName("t_delta")
      .outputMode("append").start()
    try {
      // batch 1: the old snapshot arrives as initial upserts
      input.addData(oldRows.map { case (k, v) => ChangeIn(k, fp(v), 1000L, false) })
      q.processAllAvailable()
      val initial = spark.table("t_delta").as[StreamingOps.DeltaOut].collect()
      assert(initial.forall(_.status == "added") && initial.length == 5)

      // batch 2: the new snapshot as upserts + explicit deletes of absent keys
      val removedKeys = oldRows.map(_._1).toSet -- newRows.map(_._1).toSet
      input.addData(
        newRows.map { case (k, v) => ChangeIn(k, fp(v), 2000L, false) } ++
          removedKeys.toSeq.map(k => ChangeIn(k, 0L, 2000L, true)))
      q.processAllAvailable()
      val delta = spark.table("t_delta").as[StreamingOps.DeltaOut].collect()
        .filter(_.tsMs == 2000L).map(d => d.key -> d.status).toMap

      // the batch operator's verdicts on the same two snapshots
      val batch = graft.operators.Snapshot.snapshotDiff(
          oldRows.toDF("key", "v"), newRows.toDF("key", "v"),
          Seq("key"), Seq("v"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val batchDelta = batch.filter(_._2 != "unchanged")
      assert(delta == batchDelta, s"stream=$delta batch=$batchDelta")
    } finally stopStream(q)
  }

  // ---- checkpoint recovery ------------------------------------------
  // The differential tests above replay within ONE query; these kill the
  // query after batch k and restart it from its checkpoint (fresh query,
  // same MemoryStream + checkpointLocation + parquet sink — the file
  // sink is the exactly-once sink, unlike the memory sink which refuses
  // checkpoint recovery). The stateful ops hold real state across the
  // boundary, so a lost state store changes the emissions.

  /** Replay `batches` through sessionize into a parquet sink; if
    * `stopAfter` is set, stop + restart-from-checkpoint after that
    * batch index. Returns the committed session rows. */
  private def sessionReplay(
      batches: Seq[Seq[Event]], stopAfter: Option[Int]): Set[(Long, Long, Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ck-sess").toString
    val input = MemoryStream[Event]
    def start() = StreamingOps.sessionize(input.toDS(), Duration.ofMinutes(30))
      .writeStream.format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ck").outputMode("append").start()
    var q = start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b)
        q.processAllAvailable()
        if (stopAfter.contains(i)) { q.stop(); q = start() }
      }
      q.processAllAvailable()
    } finally stopStream(q)
    spark.read.parquet(s"$root/out").as[StreamingOps.SessionOut].collect()
      .map(o => (o.user_id, o.session_start.getTime, o.session_end.getTime,
        o.n_events, o.total_value)).toSet
  }

  test("sessionize restart from checkpoint == uninterrupted run (state survives)") {
    // user 1's session SPANS the kill point (events in batches 1 and 2,
    // 15 min apart — within the 30 min gap): a lost state store would
    // split it into two sessions and the sets would differ
    val batches = Seq(
      Seq(ev(1, 0, 1, 1.0), ev(2, 10, 1, 2.0), ev(3, 5, 2, 8.0)),
      Seq(ev(4, 25, 1, 4.0), ev(5, 50, 2, 16.0)),
      // flush: two sentinel batches push the watermark past every
      // session's timeout so all of them close and commit
      Seq(ev(6, 600, 99)),
      Seq(ev(7, 601, 99)))
    val interrupted = sessionReplay(batches, stopAfter = Some(1))
    val uninterrupted = sessionReplay(batches, stopAfter = None)
    assert(interrupted == uninterrupted,
      s"restart=$interrupted uninterrupted=$uninterrupted")
    // and the spanning session really is one session of 3 events
    val u1 = interrupted.filter(_._1 == 1L)
    assert(u1.size == 1 && u1.head._4 == 3L && u1.head._5 == 7.0,
      s"user-1 session split across the restart: $u1")
  }

  test("streamingDriftBins restart from checkpoint == uninterrupted run") {
    // the first hour's window SPANS the kill point (cells accumulate in
    // batches 1 and 2): lost windowed-agg state would emit partial
    // counts for it, double-commit would inflate them
    import graft.operators.Drift
    val dims: Seq[Drift.Dim] = Seq(
      Drift.NumericDim("value", Seq(5.0)),
      Drift.CategoricalDim("event_type", top = 1))
    val batches = Seq(
      Seq(ev(1, 0, 1, 1.0), ev(2, 10, 1, 9.0)),
      Seq(ev(3, 25, 2, 2.0), ev(4, 70, 1, 3.0)),
      // flush: push the watermark past every real window's end
      Seq(ev(5, 600, 99)),
      Seq(ev(6, 601, 99)))
    def replay(stopAfter: Option[Int]): Set[(Long, String, String, Long)] = {
      val s = spark
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      val root = java.nio.file.Files.createTempDirectory("graft-ck-drift").toString
      // labels resolved once against a static reference frame
      val ref = batches.flatten.toDF()
      val exprs = Drift.cellExprs(ref, dims)
      val input = MemoryStream[Event]
      def start() = StreamingOps.streamingDriftBins(
          input.toDF(), exprs, "1 hour", "0 seconds")
        .writeStream.format("parquet").option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ck").outputMode("append").start()
      var q = start()
      try {
        batches.zipWithIndex.foreach { case (b, i) =>
          input.addData(b)
          q.processAllAvailable()
          if (stopAfter.contains(i)) { q.stop(); q = start() }
        }
        q.processAllAvailable()
      } finally stopStream(q)
      spark.read.parquet(s"$root/out").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1),
          r.getString(2), r.getLong(3))).toSet
    }
    val interrupted = replay(stopAfter = Some(0))
    val uninterrupted = replay(stopAfter = None)
    assert(interrupted == uninterrupted,
      s"restart=$interrupted uninterrupted=$uninterrupted")
    // the spanning window's cells really merge across the kill: hour 0
    // has 3 events -> value bins b00 (1.0, 2.0) + b01 (9.0)
    val h0 = interrupted.filter(c => c._1 == ts(0).getTime && c._2 == "value")
      .map(c => c._3 -> c._4).toMap
    assert(h0 == Map("b00" -> 2L, "b01" -> 1L),
      s"spanning window mis-merged: $h0")
  }

  test("streamingDriftMonitor: scored closed windows == batch report, across restart") {
    import graft.operators.Drift
    val dims: Seq[Drift.Dim] = Seq(
      Drift.NumericDim("value", Seq(5.0)),
      Drift.CategoricalDim("event_type", top = 1))
    val batches = Seq(
      Seq(ev(1, 0, 1, 1.0), ev(2, 10, 1, 9.0)),
      Seq(ev(3, 25, 2, 2.0), ev(4, 70, 1, 3.0)),
      // flush: push the watermark past the real windows' ends
      Seq(ev(5, 600, 99)),
      Seq(ev(6, 601, 99)))
    type Key = (Long, String) // (window start ms, column)
    type Val = (Long, Long, Long, Long) // (ref_n, cur_n, bins, psi_bp)
    def replay(stopAfter: Option[Int]): Map[Key, Val] = {
      val s = spark
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      val root = java.nio.file.Files.createTempDirectory("graft-ck-driftmon").toString
      val ref = batches.flatten.toDF()
      val exprs = Drift.cellExprs(ref, dims)
      val refC = Drift.referenceCounts(ref, exprs)
      val input = MemoryStream[Event]
      // keyed map, not a list: foreachBatch is at-least-once across a
      // restart, and the replayed batch re-emits the same deterministic
      // rows — last write wins makes the replay idempotent here
      val got = scala.collection.concurrent.TrieMap.empty[Key, Val]
      def start() = StreamingOps.streamingDriftMonitor(
          input.toDF(), exprs, refC, s"$root/ck", "1 hour", "0 seconds") {
        (scored, _) =>
          scored.collect().foreach { r =>
            got.put((r.getTimestamp(0).getTime, r.getString(1)),
              (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))): Unit
          }
      }
      var q = start()
      try {
        batches.zipWithIndex.foreach { case (b, i) =>
          input.addData(b)
          q.processAllAvailable()
          if (stopAfter.contains(i)) { q.stop(); q = start() }
        }
        q.processAllAvailable()
      } finally stopStream(q)
      got.toMap
    }
    val uninterrupted = replay(stopAfter = None)
    val interrupted = replay(stopAfter = Some(0))
    assert(interrupted == uninterrupted,
      s"restart=$interrupted uninterrupted=$uninterrupted")
    // the monitor really closed the two real hourly windows
    assert(uninterrupted.keySet.map(_._1) ==
      Set(ts(0).getTime, ts(60).getTime), s"windows: ${uninterrupted.keySet}")
    // the differential: every streamed window's row equals the BATCH
    // face — streamingDriftBins in batch mode + the same scoreWindows
    val s = spark
    import s.implicits._
    val ref = batches.flatten.toDF()
    val exprs = Drift.cellExprs(ref, dims)
    val batchScored = Drift.scoreWindows(
        StreamingOps.streamingDriftBins(ref, exprs, "1 hour", "0 seconds"),
        Drift.referenceCounts(ref, exprs)).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    uninterrupted.foreach { case (k, v) =>
      assert(batchScored(k) == v, s"window $k: streaming=$v batch=${batchScored(k)}")
    }
  }

  test("streamingDriftMonitorRefreshing: a reference swap applies at the next batch") {
    import graft.operators.Drift
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ck-driftref").toString
    val refPath = s"$root/refcounts"
    val dims: Seq[Drift.Dim] = Seq(Drift.NumericDim("value", Seq(5.0)))
    // bins pinned against ref1; ref2 swaps the counts under the SAME bins
    val ref1 = Seq(ev(101, 0, 1, 1.0), ev(102, 1, 1, 2.0), ev(103, 2, 1, 9.0)).toDF()
    val ref2 = Seq(ev(201, 0, 1, 8.0), ev(202, 1, 1, 9.0), ev(203, 2, 1, 1.0)).toDF()
    val exprs = Drift.cellExprs(ref1, dims)
    def writeRef(df: org.apache.spark.sql.DataFrame): Unit =
      Drift.referenceCounts(df, exprs)
        .coalesce(1).write.mode("overwrite").parquet(refPath)
    writeRef(ref1)
    type Key = (Long, String)
    type Val = (Long, Long, Long, Long) // (ref_n, cur_n, bins, psi_bp)
    val got = scala.collection.concurrent.TrieMap.empty[Key, Val]
    val input = MemoryStream[Event]
    val q = StreamingOps.streamingDriftMonitorRefreshing(
        input.toDF(), exprs, refPath, s"$root/ck", "1 hour", "0 seconds") {
      (scored, _) =>
        scored.collect().foreach { r =>
          got.put((r.getTimestamp(0).getTime, r.getString(1)),
            (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))): Unit
        }
    }
    val winA = Seq(ev(1, 0, 1, 1.0), ev(2, 10, 1, 9.0))   // hour-0 window
    val winB = Seq(ev(3, 725, 1, 2.0), ev(4, 750, 1, 3.0)) // hour-12 window
    try {
      input.addData(winA); q.processAllAvailable()
      // two flush batches: watermark advances at batch END, emission
      // happens in the batch AFTER it passes the window end
      input.addData(Seq(ev(5, 300, 99))); q.processAllAvailable()
      input.addData(Seq(ev(6, 301, 99))); q.processAllAvailable()
      assert(got.keySet.map(_._1) == Set(ts(0).getTime), s"pre-swap: ${got.keySet}")
      writeRef(ref2) // month-over-month re-baseline: plain overwrite, no restart
      input.addData(winB); q.processAllAvailable()
      input.addData(Seq(ev(7, 1200, 99))); q.processAllAvailable()
      input.addData(Seq(ev(8, 1201, 99))); q.processAllAvailable()
    } finally stopStream(q)
    // the differential: each window matches the BATCH report against
    // the reference that was live when it closed
    def batchScored(events: Seq[Event], ref: org.apache.spark.sql.DataFrame): Map[Key, Val] =
      Drift.scoreWindows(
          StreamingOps.streamingDriftBins(events.toDF(), exprs, "1 hour", "0 seconds"),
          Drift.referenceCounts(ref, exprs)).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val expectA = batchScored(winA, ref1)((ts(0).getTime, "value"))
    val expectB = batchScored(winB, ref2)((ts(720).getTime, "value"))
    assert(got((ts(0).getTime, "value")) == expectA,
      s"pre-swap window: ${got((ts(0).getTime, "value"))} != $expectA")
    assert(got((ts(720).getTime, "value")) == expectB,
      s"post-swap window: ${got((ts(720).getTime, "value"))} != $expectB")
    // and the swap actually changed the scoring (ref1 vs ref2 disagree)
    assert(batchScored(winB, ref1)((ts(720).getTime, "value")) != expectB,
      "test fixture too weak: both references score winB identically")
  }

  test("streamingDriftMonitorRefreshing: an uncommitted rewrite keeps the cached reference") {
    import graft.operators.Drift
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ck-driftmid").toString
    val refPath = s"$root/refcounts"
    val dims: Seq[Drift.Dim] = Seq(Drift.NumericDim("value", Seq(5.0)))
    val ref1 = Seq(ev(101, 0, 1, 1.0), ev(102, 1, 1, 2.0), ev(103, 2, 1, 9.0)).toDF()
    val exprs = Drift.cellExprs(ref1, dims)
    Drift.referenceCounts(ref1, exprs)
      .coalesce(1).write.mode("overwrite").parquet(refPath)
    val got = scala.collection.concurrent.TrieMap.empty[(Long, String), Long]
    val input = MemoryStream[Event]
    val q = StreamingOps.streamingDriftMonitorRefreshing(
        input.toDF(), exprs, refPath, s"$root/ck", "1 hour", "0 seconds") {
      (scored, _) =>
        scored.collect().foreach { r =>
          got.put((r.getTimestamp(0).getTime, r.getString(1)), r.getLong(2)): Unit
        }
    }
    try {
      // close window 0 so the reference gets collected and cached
      input.addData(Seq(ev(1, 0, 1, 1.0))); q.processAllAvailable()
      input.addData(Seq(ev(10, 300, 99))); q.processAllAvailable()
      input.addData(Seq(ev(11, 301, 99))); q.processAllAvailable()
      // simulate a rewrite in flight: the committer's _SUCCESS marker is
      // gone — the probe must treat the artifact as uncommitted and the
      // monitor must keep scoring against the cached reference, not die
      val succ = new java.io.File(refPath, "_SUCCESS")
      assert(succ.exists(), "fixture expectation: Spark wrote _SUCCESS")
      assert(succ.delete())
      input.addData(Seq(ev(2, 725, 1, 2.0))); q.processAllAvailable()
      input.addData(Seq(ev(3, 1200, 99))); q.processAllAvailable()
      input.addData(Seq(ev(4, 1201, 99))); q.processAllAvailable()
    } finally stopStream(q)
    // both windows scored with ref1's counts (ref_n = 3) and no crash
    assert(got((ts(0).getTime, "value")) == 3L)
    assert(got((ts(720).getTime, "value")) == 3L)
  }

  test("streamingDriftMonitorRefreshing: no committed reference at first batch fails loudly") {
    import graft.operators.Drift
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ck-driftnone").toString
    val dims: Seq[Drift.Dim] = Seq(Drift.NumericDim("value", Seq(5.0)))
    val refDf = Seq(ev(101, 0, 1, 1.0)).toDF()
    val exprs = Drift.cellExprs(refDf, dims)
    val input = MemoryStream[Event]
    val q = StreamingOps.streamingDriftMonitorRefreshing(
        input.toDF(), exprs, s"$root/never_written", s"$root/ck",
        "1 hour", "0 seconds") { (_, _) => () }
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        input.addData(Seq(ev(1, 0, 1, 1.0))); q.processAllAvailable()
        input.addData(Seq(ev(2, 300, 99))); q.processAllAvailable()
        input.addData(Seq(ev(3, 301, 99))); q.processAllAvailable()
      }
      assert(e.getMessage.contains("no committed reference"))
    } finally stopStream(q)
  }

  test("streamingDelta restart from checkpoint keeps the CDC fingerprints") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import StreamingOps.ChangeIn
    val root = java.nio.file.Files.createTempDirectory("graft-ck-delta").toString
    val input = MemoryStream[ChangeIn]
    def start() = StreamingOps.streamingDelta(
        input.toDF(), "key", col("fp"), "tsMs", col("delete"))
      .writeStream.format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ck").outputMode("append").start()
    var q = start()
    try {
      input.addData(Seq(
        ChangeIn(1L, 11L, 1000L, false), ChangeIn(2L, 22L, 1000L, false),
        ChangeIn(4L, 44L, 1000L, false)))
      q.processAllAvailable()
      q.stop()
      q = start() // recover the per-key fingerprint state
      input.addData(Seq(
        ChangeIn(1L, 11L, 2000L, false), // same fp: NOTHING iff state survived
        ChangeIn(2L, 23L, 2000L, false), // changed fp
        ChangeIn(4L, 0L, 2000L, true),   // delete of a pre-restart key
        ChangeIn(6L, 66L, 2000L, false)))
      q.processAllAvailable()
    } finally stopStream(q)
    val post = spark.read.parquet(s"$root/out").as[StreamingOps.DeltaOut]
      .collect().filter(_.tsMs == 2000L).map(d => d.key -> d.status).toSet
    // a lost state store would re-emit key 1 as "added", turn key 2's
    // "changed" into "added", and swallow key 4's "removed"
    assert(post == Set(2L -> "changed", 4L -> "removed", 6L -> "added"),
      s"post-restart emissions: $post")
  }

  test("streamingNearDupCandidates restart keeps the LSH bucket members") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ck-lsh").toString
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val input = MemoryStream[(Long, String)]
    def start() = StreamingOps.streamingNearDupCandidates(
        input.toDF().toDF("id", "text"), "id", "text")
      .writeStream.format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ck").outputMode("append").start()
    var q = start()
    try {
      input.addData(Seq((1L, text), (2L, text))) // same text -> same buckets
      q.processAllAvailable()
      q.stop()
      q = start() // recover the per-bucket member lists
      input.addData(Seq((3L, text)))
      q.processAllAvailable()
    } finally stopStream(q)
    val pairs = spark.read.parquet(s"$root/out")
      .select("a_id", "b_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 3 pairs with 1 and 2 ONLY if the bucket state survived the
    // restart (alone in a fresh bucket it would emit nothing)
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"candidate pairs after restart: $pairs")
  }

  test("quality-gated stream restart == uninterrupted run (dedup state + flags survive)") {
    // The production shape: streamingDedup (stateful, watermark-bounded)
    // feeding Checks.flag (stateless row gate) into an exactly-once
    // parquet sink. The differential kills the query after batch 0 and
    // restarts from the checkpoint: a lost dedup state would let the
    // post-restart duplicate of event 2 through (one extra flagged row),
    // and a sink replay would duplicate batch-0 rows — either way the
    // row multisets differ from the uninterrupted run.
    import graft.operators.Checks
    val s = spark
    import s.implicits._
    def gated(df: org.apache.spark.sql.DataFrame) = Checks.flag(
      StreamingOps.streamingDedup(df, Seq("event_id"), "30 minutes"),
      Seq(Checks.InRange("value", 0.0, 10.0),
        Checks.OneOf("event_type", Seq("click", "view"))))
    val batches = Seq(
      Seq(ev(1, 0, 1, 2.0), ev(2, 1, 1, 99.0),              // 99.0 -> flagged
        Event(3, ts(2), 2, "purchase", 1.0, "{}")),         // type -> flagged
      Seq(ev(2, 3, 1, 99.0),                                // dup of pre-restart id 2
        ev(4, 4, 2, 5.0)))
    def run(stopAfter: Option[Int]): Seq[(Long, Double, String, Boolean, Boolean, Boolean)] = {
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      val root = java.nio.file.Files.createTempDirectory("graft-ck-gate").toString
      val input = MemoryStream[Event]
      def start() = gated(input.toDF())
        .writeStream.format("parquet").option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ck").outputMode("append").start()
      var q = start()
      try {
        batches.zipWithIndex.foreach { case (b, i) =>
          input.addData(b)
          q.processAllAvailable()
          if (stopAfter.contains(i)) { q.stop(); q = start() }
        }
        q.processAllAvailable()
      } finally stopStream(q)
      spark.read.parquet(s"$root/out")
        .select("event_id", "value", "event_type",
          "in_range_value_bad", "one_of_event_type_bad", "row_bad")
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
          r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
        .sortBy(t => (t._1, t._2)).toSeq
    }
    val interrupted = run(stopAfter = Some(0))
    val uninterrupted = run(stopAfter = None)
    assert(interrupted == uninterrupted,
      s"restart=$interrupted uninterrupted=$uninterrupted")
    // shape sanity on the surviving rows: 4 uniques, flags as planted
    assert(interrupted.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(interrupted.map(_._6) == Seq(false, true, true, false),
      s"row_bad pattern: $interrupted")
  }

  test("streamingDelta nets same-timestamp upsert+delete to the delete") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import StreamingOps.ChangeIn
    val input = MemoryStream[ChangeIn]
    val q = StreamingOps.streamingDelta(
        input.toDF(), "key", col("fp"), "tsMs", col("delete"))
      .writeStream.format("memory").queryName("t_delta2")
      .outputMode("append").start()
    try {
      input.addData(Seq(ChangeIn(7L, 42L, 1000L, false)))
      q.processAllAvailable()
      input.addData(Seq(
        ChangeIn(7L, 43L, 2000L, false), ChangeIn(7L, 0L, 2000L, true),
        ChangeIn(8L, 1L, 2000L, true))) // delete of an absent key: silent
      q.processAllAvailable()
      val got = spark.table("t_delta2").as[StreamingOps.DeltaOut].collect()
        .filter(_.tsMs == 2000L).map(d => (d.key, d.status)).toSet
      assert(got == Set((7L, "changed"), (7L, "removed")))
    } finally stopStream(q)
  }
}
