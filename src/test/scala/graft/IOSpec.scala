package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api._
import graft.sources.PsIO

/** IO round-trips (reference tests/test_io.py:23-55 analogue). */
class IOSpec extends AnyFunSuite with SparkFixture {

  private def sample = {
    val s = spark
    import s.implicits._
    Seq((1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", -3.0))
      .toDF("k", "name", "v")
  }

  test("csv round-trip: header + inferSchema recover values and types") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    PsIO.toCsv(sample, dir)
    val back = PsIO.readCsv(spark, dir)
    assert(back.columns.toSet == Set("k", "name", "v"))
    assert(back.df.schema("k").dataType.typeName == "integer")
    assert(back.df.schema("v").dataType.typeName == "double")
    val got = back.sortValues(Seq("k")).df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", -3.0)))
  }

  test("csv sep and names kwargs: tab-separated round-trip with positional rename") {
    val dir = Files.createTempDirectory("graft-tsv").toString + "/out"
    PsIO.toCsv(sample, dir, sep = "\t")
    // explicit header=true: skip the written header row, then rename
    val back = PsIO.readCsv(spark, dir, header = Some(true), sep = "\t",
      names = Seq("id", "label", "x"))
    assert(back.columns.toSeq == Seq("id", "label", "x"))
    val got = back.sortValues(Seq("id")).df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", -3.0)))
  }

  test("csv names with default header: pandas headerless semantics keep the first line") {
    val dir = Files.createTempDirectory("graft-nohdr").toString + "/out"
    PsIO.toCsv(sample, dir, header = false) // headerless file: 3 data rows
    val back = PsIO.readCsv(spark, dir, names = Seq("k", "name", "v"))
    assert(back.columns.toSeq == Seq("k", "name", "v"))
    // pandas: names + default header => header=None, first line is DATA
    assert(back.df.count() == 3)
    assert(back.df.agg(sum("k")).head().getLong(0) == 6L)
  }

  test("readEventsNs: all three ts physical types normalize to the same ns longs") {
    val s = spark
    import s.implicits._
    val micros = Seq(86400000000L, 86400123456L) // µs since epoch
    def readBack(dir: String): Seq[Long] =
      PsIO.readEventsNs(s, dir).select("ts").collect().map(_.getLong(0)).sorted.toSeq
    val expected = micros.map(_ * 1000L).sorted

    val asLong = Files.createTempDirectory("graft-ev-long").toString + "/out"
    micros.map(_ * 1000L).toDF("ts").write.parquet(asLong)
    assert(readBack(asLong) == expected) // ns-as-long rides through untouched

    val asTs = Files.createTempDirectory("graft-ev-ts").toString + "/out"
    micros.toDF("us").select(timestamp_micros(col("us")).as("ts")).write.parquet(asTs)
    assert(readBack(asTs) == expected)

    val asNtz = Files.createTempDirectory("graft-ev-ntz").toString + "/out"
    micros.toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.parquet(asNtz)
    assert(readBack(asNtz) == expected) // identity epoch mapping under pinned UTC
  }

  test("readEventsNs: genuine TIMESTAMP(NANOS) parquet loads via the scoped legacy flip") {
    // pyarrow-written fixture with a real TIMESTAMP(NANOS) annotation —
    // the one physical type Spark refuses without the legacy flag. The
    // loader must probe-fail, flip the flag, and land the same ns longs;
    // common µs/long reads (above) never touch the conf at all.
    val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(NanosKey)
    val fixture = getClass.getResource("/events_nanos.parquet").getPath
    val got = PsIO.readEventsNs(spark, fixture)
      .select("ts").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(86400000000000L, 86400123456000L))
    // the flip deliberately outlives the call (execution re-consults it)
    assert(spark.conf.get(NanosKey) == "true")
  }

  test("json round-trip recovers values") {
    val dir = Files.createTempDirectory("graft-json").toString + "/out"
    PsIO.toJson(sample, dir)
    val back = PsIO.readJson(spark, dir)
    assert(back.df.count() == 3)
    assert(back.df.agg(sum("k")).head().getLong(0) == 6L)
  }

  test("parquet round-trip preserves schema exactly") {
    val dir = Files.createTempDirectory("graft-parquet").toString + "/out"
    PsIO.toParquet(sample, dir)
    val back = PsIO.readParquet(spark, dir)
    // parquet round-trip relaxes nullability; names and types must survive
    assert(back.df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      sample.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.df.count() == 3)
  }

  test("orc round-trip preserves names, types, and values") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/out"
    PsIO.toOrc(sample, dir)
    val back = PsIO.readOrc(spark, dir)
    // file sources read primitives back as nullable — compare name+type
    assert(back.df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      sample.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.df.orderBy("k").collect().map(_.toSeq).toSeq ==
      sample.orderBy("k").collect().map(_.toSeq).toSeq)
  }

  test("codec option: zstd parquet/orc write + read back values intact") {
    val dir = Files.createTempDirectory("graft-zstd").toString
    PsIO.toParquet(sample, dir + "/p", codec = Some("zstd"))
    // parquet stamps the codec into the file name — proves the option
    // reached the writer, not just that defaults round-tripped
    assert(new java.io.File(dir + "/p").listFiles
      .exists(_.getName.endsWith(".zstd.parquet")))
    assert(PsIO.readParquet(spark, dir + "/p").df.orderBy("k")
      .collect().map(_.toSeq).toSeq ==
      sample.orderBy("k").collect().map(_.toSeq).toSeq)
    PsIO.toOrc(sample, dir + "/o", codec = Some("zstd"))
    assert(PsIO.readOrc(spark, dir + "/o").df.orderBy("k")
      .collect().map(_.toSeq).toSeq ==
      sample.orderBy("k").collect().map(_.toSeq).toSeq)
  }

  test("readJsonQuarantine: good rows parse, bad lines keep raw evidence") {
    val dir = Files.createTempDirectory("graft-dirtyjson").toString
    val f = new java.io.File(dir, "part.json")
    java.nio.file.Files.write(f.toPath,
      """{"k": 1, "v": "a"}
        |{"k": 2, "v": "b"}
        |{"k": 3, "v":
        |garbage line
        |{"k": 4}
        |""".stripMargin.getBytes("UTF-8"))
    val df = PsIO.readJsonQuarantine(spark, dir).df
    val good = PsIO.jsonGood(df).orderBy("k").collect()
    assert(good.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    assert(good.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("a"), Some("b"), None))
    val bad = PsIO.jsonQuarantined(df).select("_corrupt")
      .collect().map(_.getString(0)).sorted
    assert(bad.toSeq == Seq("garbage line", """{"k": 3, "v":"""))
    // explicit schema: no inference pass, quarantine contract holds even
    // on a clean file (where inference would never surface _corrupt)
    val clean = Files.createTempDirectory("graft-cleanjson").toString
    java.nio.file.Files.write(new java.io.File(clean, "p.json").toPath,
      """{"k": 9, "v": "z"}""".getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val cdf = PsIO.readJsonQuarantine(spark, clean, Some(schema)).df
    assert(PsIO.jsonGood(cdf).count() == 1 && PsIO.jsonQuarantined(cdf).count() == 0)
  }

  test("readCsvQuarantine: corrupt/truncated/over-long lines keep raw evidence") {
    val dir = Files.createTempDirectory("graft-dirtycsv").toString
    java.nio.file.Files.write(new java.io.File(dir, "part.csv").toPath,
      """k,v,n
        |1,a,10
        |notanint,b,20
        |2,c,xx
        |3,d
        |4,e,40,extra
        |5,f,50
        |""".stripMargin.getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType)))
    val df = PsIO.readCsvQuarantine(spark, dir, Some(schema)).df
    val good = PsIO.csvGood(df).orderBy("k").collect()
    // type-corrupt AND token-count-mismatched lines all quarantine
    // (from_csv is strict, unlike the null-padding csv file source)
    assert(good.map(_.getLong(0)).toSeq == Seq(1L, 5L))
    val bad = PsIO.csvQuarantined(df).select("_corrupt")
      .collect().map(_.getString(0)).sorted
    assert(bad.toSeq == Seq("2,c,xx", "3,d", "4,e,40,extra", "notanint,b,20"))
    // the header line is shed, not quarantined
    assert(df.count() == 6)
  }

  test("writeSorted produces disjoint sorted key ranges per file") {
    val dir = Files.createTempDirectory("graft-sorted").toString + "/out"
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    PsIO.writeSorted(orders, dir, Seq("o_orderkey"), partitions = 4)
    // content survives
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    // the layout property that makes row-group pruning work: each output
    // file covers a key range disjoint from every other file's
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.length == 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("o_orderkey")), max(col("o_orderkey"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file ranges overlap: $ranges")
      case _ => ()
    }
    // within a file the rows are sorted (what row-group min/max feeds on)
    val firstRows = spark.read.parquet(files.head)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(firstRows == firstRows.sorted)
  }

  test("contentFingerprint: layout-invariant, content-sensitive") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cols = Seq("doc_id", "text", "lang")
    def fp(df: org.apache.spark.sql.DataFrame) =
      PsIO.contentFingerprint(df, cols).head().toSeq
    val base = fp(docs)
    // row order, partitioning, and file layout must not matter
    assert(fp(docs.orderBy(col("text"))) == base)
    assert(fp(docs.repartition(17)) == base)
    val dir = Files.createTempDirectory("graft-fp").toString + "/copy"
    PsIO.writeShuffled(docs, dir, "doc_id", seed = 9L, shards = 5)
    assert(fp(spark.read.parquet(dir).select(docs.columns.map(col): _*)) == base)
    // one changed character must change the checksum
    val tampered = docs.withColumn("text",
      when(col("doc_id") === 7, concat(col("text"), lit("x"))).otherwise(col("text")))
    assert(fp(tampered) != base)
    // null-position sensitivity: (a, null) must not alias (null, a) —
    // concat_ws alone would skip the null and hash both to "a"
    val s0 = spark
    import s0.implicits._
    val ab = Seq((Option("a"), Option.empty[String])).toDF("x", "y")
    val ba = Seq((Option.empty[String], Option("a"))).toDF("x", "y")
    assert(PsIO.contentFingerprint(ab, Seq("x", "y")).head().toSeq !=
      PsIO.contentFingerprint(ba, Seq("x", "y")).head().toSeq)
  }

  test("fileManifest sums to the corpus fingerprint and localizes a diverged shard") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cols = Seq("doc_id", "text", "lang")
    val dir = Files.createTempDirectory("graft-manifest").toString
    docs.repartitionByRange(4, col("doc_id")).write.parquet(dir + "/a")
    val m = PsIO.fileManifest(spark.read.parquet(dir + "/a"), cols).collect()
    assert(m.length == 4)
    // Σ per-file (rows, checksum) == the corpus-level fingerprint
    val corpus = PsIO.contentFingerprint(docs, cols).head()
    assert(m.map(_.getLong(1)).sum == corpus.getLong(0))
    // checksum travels as a decimal-digit string (engine-portable form)
    assert(m.map(r => BigInt(r.getString(2))).sum == BigInt(corpus.getString(1)))
    // a copy with ONE altered row: manifests anti-join to exactly the
    // files whose content differs (names differ between writes, so the
    // localization signal is the (rows, checksum) multiset)
    docs.withColumn("text",
        when(col("doc_id") === 3, lit("tampered")).otherwise(col("text")))
      .repartitionByRange(4, col("doc_id")).write.parquet(dir + "/b")
    val mb = PsIO.fileManifest(spark.read.parquet(dir + "/b"), cols).collect()
    val setA = m.map(r => (r.getLong(1), r.getString(2))).toSet
    val setB = mb.map(r => (r.getLong(1), r.getString(2))).toSet
    assert((setA diff setB).nonEmpty && (setA intersect setB).size == 3,
      "exactly one shard should diverge")
  }

  test("writeShuffled: disjoint sorted shards, order reproducible per seed") {
    val dir = Files.createTempDirectory("graft-shuf").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "n_chars")
    PsIO.writeShuffled(docs, dir + "/a", "doc_id", seed = 42L, shards = 4)
    val files = new java.io.File(dir + "/a").listFiles
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 4)
    // each shard internally sorted; shard key ranges disjoint
    val ranges = files.map { f =>
      val ks = spark.read.parquet(f.getPath)
        .select("shuffle_key").collect().map(_.getString(0))
      assert(ks.sameElements(ks.sorted), s"${f.getName} not sorted")
      (ks.min, ks.max)
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax.compareTo(bMin) < 0, "overlapping shards")
      case _ =>
    }
    // same seed -> same global order; different seed -> different order
    PsIO.writeShuffled(docs, dir + "/b", "doc_id", seed = 42L, shards = 2)
    def order(p: String) = spark.read.parquet(p)
      .orderBy("shuffle_key").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order(dir + "/a") == order(dir + "/b"),
      "seed fixes the permutation independent of shard count")
    PsIO.writeShuffled(docs, dir + "/c", "doc_id", seed = 7L, shards = 2)
    assert(order(dir + "/c") != order(dir + "/a"), "new seed, new permutation")
  }

  test("writeZOrdered localizes every file in BOTH dimensions") {
    val dir = Files.createTempDirectory("graft-zorder").toString + "/out"
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    PsIO.writeZOrdered(orders, dir,
      Seq("o_custkey", "o_totalprice"), partitions = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    assert(back.columns.toSet == orders.columns.toSet) // __z dropped

    def spans(files: Seq[String], c: String): Seq[Double] = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c).cast("double")), max(col(c).cast("double"))).head()
      r.getDouble(1) - r.getDouble(0)
    }
    val g = orders
      .agg(min(col("o_custkey").cast("double")),
           max(col("o_custkey").cast("double")),
           min(col("o_totalprice").cast("double")),
           max(col("o_totalprice").cast("double"))).head()
    val (gCust, gPrice) = (g.getDouble(1) - g.getDouble(0),
                           g.getDouble(3) - g.getDouble(2))
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.length == 8)
    // a lexicographic sort on o_custkey would leave each file spanning
    // ~the FULL o_totalprice range; the z-layout must keep the mean
    // per-file bounding box a real fraction of the global range in BOTH
    // dimensions — that locality is exactly what footer min/max stats
    // prune on
    val custFrac = spans(files, "o_custkey").map(_ / gCust)
    val priceFrac = spans(files, "o_totalprice").map(_ / gPrice)
    assert(custFrac.sum / files.size < 0.75,
      s"o_custkey not localized: $custFrac")
    assert(priceFrac.sum / files.size < 0.75,
      s"o_totalprice not localized: $priceFrac")
    // and the box AREA shrinks superlinearly vs either 1-D layout
    val areas = custFrac.zip(priceFrac).map { case (a, b) => a * b }
    assert(areas.sum / files.size < 0.4, s"boxes too large: $areas")
  }

  test("compact merges small files to the byte target without a shuffle") {
    val base = Files.createTempDirectory("graft-compact").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.repartition(64).write.parquet(s"$base/small")
    def parquetFiles(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$base/small").length == 64)
    val totalBytes = parquetFiles(s"$base/small").map(_.length).sum
    // target half the corpus per file -> exactly 2 output files
    val planned = PsIO.compact(spark, s"$base/small", s"$base/big",
      targetBytes = totalBytes / 2 + 1)
    assert(planned == 2)
    assert(parquetFiles(s"$base/big").length == 2)
    // content survives exactly
    val a = orders.select("o_orderkey").collect().map(_.getLong(0)).sorted
    val b = spark.read.parquet(s"$base/big")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq)
    // and the default path must NOT shuffle: coalesce plans no exchange
    val plan = spark.read.parquet(s"$base/small").coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }

  test("compact fails loudly on a missing input directory") {
    val e = intercept[IllegalArgumentException] {
      PsIO.compact(spark, "/tmp/graft-no-such-dir", "/tmp/graft-compact-out")
    }
    assert(e.getMessage.contains("not an existing directory"))
  }

  test("writeZOrdered rejects empty input and all-null z columns by name") {
    val base = Files.createTempDirectory("graft-znull").toString
    val s = spark
    import s.implicits._
    val allNull = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("k", "v")
    val e1 = intercept[IllegalArgumentException] {
      PsIO.writeZOrdered(allNull, s"$base/o1", Seq("k", "v"), partitions = 2)
    }
    assert(e1.getMessage.contains("'v'"))
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val e2 = intercept[IllegalArgumentException] {
      PsIO.writeZOrdered(empty, s"$base/o2", Seq("k", "v"), partitions = 2)
    }
    assert(e2.getMessage.contains("no min/max"))
  }

  test("toJsonlShards bounds shard size and round-trips content") {
    val base = Files.createTempDirectory("graft-jsonl").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val n = orders.count()
    PsIO.toJsonlShards(orders.repartition(2), s"$base/out",
      maxRecordsPerShard = 400)
    val shards = new java.io.File(s"$base/out").listFiles()
      .filter(f => !f.getName.startsWith(".") && f.getName.contains(".json"))
      .toSeq
    assert(shards.nonEmpty)
    assert(shards.forall(_.getName.endsWith(".gz")), "gzip by default")
    // every shard respects the record cap
    val back = spark.read.json(s"$base/out")
    assert(back.count() == n)
    val perFile = back.select(col("_metadata.file_path")).groupBy("file_path")
      .count().collect().map(_.getLong(1))
    assert(perFile.forall(_ <= 400), s"shard over cap: ${perFile.toSeq}")
    assert(perFile.length >= (n / 400).toInt)
  }

  test("withProvenance stamps source file and stable in-file position") {
    val base = Files.createTempDirectory("graft-prov").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.repartition(3).write.parquet(s"$base/in")
    val prov = PsIO.withProvenance(spark.read.parquet(s"$base/in"))
    val stats = prov.groupBy("source_file").agg(
      count(lit(1)).as("n"), min(col("source_pos")).as("mn"),
      max(col("source_pos")).as("mx"),
      countDistinct(col("source_pos")).as("d")).collect()
    assert(stats.length == 3)
    stats.foreach { r =>
      val (n, mn, mx, d) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mn == 0L, "positions start at 0")
      assert(mx == n - 1, "positions contiguous")
      assert(d == n, "positions unique per file")
    }
    // provenance survives downstream relational ops
    val filtered = prov.filter(col("o_totalprice") > 100000)
      .select("source_file", "source_pos", "o_orderkey")
    assert(filtered.count() > 0)
  }

  test("materialize caches the plan (reference offload analogue)") {
    val df = sample
    val cached = PsIO.materialize(df)
    assert(cached.count() == 3)
    assert(cached.storageLevel.useMemory)
    cached.unpersist()
  }

  test("queries over a materialized frame plan an InMemoryTableScan") {
    // the reference's cached-CTE elision (core.py:1643-1651): once a node
    // is materialized, downstream queries must read the cache, not
    // re-execute the producing plan
    val cached = PsIO.materialize(sample.groupBy("k").count())
    try {
      cached.count() // populate
      val downstream = cached.filter(col("count") > 0).select("k")
      val physical = downstream.queryExecution.executedPlan.toString
      val scanAt = physical.indexOf("InMemoryTableScan")
      assert(scanAt >= 0, s"expected cache scan in plan:\n$physical")
      // everything ABOVE the cache scan must be scan-local (the stored
      // producer plan below it prints the aggregate, but never re-runs)
      assert(!physical.take(scanAt).contains("HashAggregate"))
    } finally cached.unpersist()
  }

  test("unifyTypes: lossless lattice, conflicts refused") {
    import org.apache.spark.sql.types._
    assert(PsIO.unifyTypes(Seq(IntegerType, IntegerType)).contains(IntegerType))
    assert(PsIO.unifyTypes(Seq(ShortType, LongType)).contains(LongType))
    assert(PsIO.unifyTypes(Seq(IntegerType, DoubleType)).contains(DoubleType))
    assert(PsIO.unifyTypes(Seq(LongType, FloatType)).contains(DoubleType))
    assert(PsIO.unifyTypes(Seq(StringType)).contains(StringType))
    assert(PsIO.unifyTypes(Seq(StringType, IntegerType)).isEmpty)
    assert(PsIO.unifyTypes(Seq(DateType, TimestampType)).isEmpty)
    // nullability-only difference is not drift
    assert(PsIO.unifyTypes(Seq(StringType, StringType)).contains(StringType))
  }

  test("readParquetEvolved: null-fill, widen, and both conflict policies") {
    val base = Files.createTempDirectory("graft-drift").toString
    val s = spark
    import s.implicits._
    Seq((1, 10, "m1"), (2, 20, "m2")).toDF("k", "q", "meta")
      .write.parquet(s"$base/g1")
    Seq((3, 4.5, 7, "en"), (4, 6.0, 8, "de")).toDF("k", "q", "meta", "lang")
      .write.parquet(s"$base/g2")
    val paths = Seq(s"$base/g1", s"$base/g2")

    // DropConflicts (default): meta is shed, q widens, lang null-fills
    val dropped = PsIO.readParquetEvolved(spark, paths).df
    assert(dropped.columns.toSeq == Seq("k", "q", "lang"), "first-seen order, conflict shed")
    assert(dropped.schema("q").dataType.typeName == "double")
    val gotD = dropped.orderBy("k").collect()
      .map(r => (r.getInt(0), r.getDouble(1), if (r.isNullAt(2)) null else r.getString(2)))
    assert(gotD.toSeq == Seq((1, 10.0, null), (2, 20.0, null), (3, 4.5, "en"), (4, 6.0, "de")))

    // StringifyConflicts: meta carried as string (universal supertype)
    val kept = PsIO.readParquetEvolved(spark, paths, PsIO.StringifyConflicts).df
    assert(kept.schema("meta").dataType.typeName == "string")
    assert(kept.orderBy("k").select("meta").collect().map(_.getString(0)).toSeq
      == Seq("m1", "m2", "7", "8"))

    // drift ledger rows
    val rep = PsIO.parquetSchemaDrift(spark, paths).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rep == Set(
      ("k", "stable", "int", "int,int"),
      ("q", "widen", "double", "int,double"),
      ("meta", "quarantine", "-", "string,int"),
      ("lang", "null_fill", "string", "-,string")))

    // scale shape: a filter on the evolved read pushes into EACH
    // generation's scan (no union barrier above the filters)
    val filtered = PsIO.readParquetEvolved(spark, paths).df.filter(col("k") > 2)
    val plan = filtered.queryExecution.executedPlan.toString
    val pushes = "PushedFilters: \\[[^\\]]*GreaterThan\\(k,2\\)".r
      .findAllIn(plan).size
    assert(pushes == 2, s"expected the k>2 filter pushed to both generation scans:\n$plan")
  }
}
