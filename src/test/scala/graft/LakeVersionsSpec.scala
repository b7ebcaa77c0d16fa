package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LakeVersions

/** Versioned lake commits (table format lite): manifest-pinned reads,
  * append/overwrite commit semantics, lock serialization, time-travel
  * diff, and retention. */
class LakeVersionsSpec extends AnyFunSuite with SparkFixture {

  private def lake(): String =
    Files.createTempDirectory("graft-lakev").toString + "/table"

  test("commit/read: append composes, overwrite replaces, readers pin versions") {
    val s = spark
    import s.implicits._
    val dir = lake()
    assert(LakeVersions.latestVersion(s, dir) == 0L)
    intercept[IllegalArgumentException](LakeVersions.read(s, dir))

    val v1 = LakeVersions.commit(s, dir, Seq((1, "a"), (2, "b")).toDF("k", "t"))
    val v2 = LakeVersions.commit(s, dir, Seq((3, "c")).toDF("k", "t"))
    val v3 = LakeVersions.commit(s, dir, Seq((9, "z")).toDF("k", "t"),
      overwrite = true)
    assert((v1, v2, v3) == (1L, 2L, 3L))
    assert(LakeVersions.latestVersion(s, dir) == 3L)

    def keys(v: Long) = LakeVersions.read(s, dir, Some(v))
      .select("k").collect().map(_.getInt(0)).sorted.toSeq
    assert(keys(1) == Seq(1, 2))
    assert(keys(2) == Seq(1, 2, 3), "append must reference v1's files too")
    assert(keys(3) == Seq(9), "overwrite must reference only its own files")
    // latest == v3; pinned reads survive later commits untouched
    assert(LakeVersions.read(s, dir).select("k")
      .collect().map(_.getInt(0)).toSeq == Seq(9))

    val ledger = LakeVersions.versions(s, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sortBy(_._1)
    assert(ledger.map(_._1) == Seq(1L, 2L, 3L))
    assert(ledger(1)._2 > ledger(0)._2, "v2 references more files than v1")
  }

  test("time-travel diff rides snapshotDiff; schema evolution merges across versions") {
    val s = spark
    import s.implicits._
    val dir = lake()
    LakeVersions.commit(s, dir, Seq((1, "a"), (2, "b")).toDF("k", "t"))
    LakeVersions.commit(s, dir,
      Seq((2, "B"), (3, "c")).toDF("k", "t"), overwrite = true)
    val d = LakeVersions.diff(s, dir, 1L, 2L, Seq("k"))
      .select("k", "status").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(d == Seq((1, "removed"), (2, "changed"), (3, "added")), d.toString)
    // a commit with an extra column merges losslessly on read
    LakeVersions.commit(s, dir, Seq((4, "d", 7.5)).toDF("k", "t", "score"))
    val merged = LakeVersions.read(s, dir)
    assert(merged.schema.fieldNames.sorted.toSeq == Seq("k", "score", "t"))
    assert(merged.filter("k = 2").select("score").collect().head.isNullAt(0))
  }

  test("a dead writer's stale LOCK is broken; vacuum sweeps old state") {
    val s = spark
    import s.implicits._
    val dir = lake()
    LakeVersions.commit(s, dir, Seq((1, "a")).toDF("k", "t"))
    // a writer that died holding the lock: the next commit breaks it
    // once it is older than lockStaleMs instead of waiting forever
    val claims = new java.io.File(dir, "_graft_versions")
    val dead = new java.io.File(claims, "LOCK")
    assert(dead.createNewFile())
    assert(dead.setLastModified(System.currentTimeMillis() - 120000))
    val v = LakeVersions.commit(s, dir, Seq((2, "b")).toDF("k", "t"))
    assert(v == 2L)
    assert(!dead.exists(), "the breaking commit must release the lock")
    assert(LakeVersions.read(s, dir).count() == 2L)

    LakeVersions.commit(s, dir, Seq((3, "c")).toDF("k", "t"), overwrite = true)
    // age everything so retention applies, then vacuum keeping 1
    (new java.io.File(dir).listFiles() ++ claims.listFiles()).foreach { f =>
      if (f.isFile) assert(f.setLastModified(System.currentTimeMillis() - 48L * 3600 * 1000))
    }
    val removed = LakeVersions.vacuum(s, dir, keepVersions = 1)
    assert(removed > 0)
    // latest still reads; vacuumed versions fail loudly
    assert(LakeVersions.read(s, dir).count() == 1L)
    val e = intercept[IllegalArgumentException](LakeVersions.read(s, dir, Some(1L)))
    assert(e.getMessage.contains("vacuumed"))
    // every surviving data file is referenced by the kept manifest
    val dataFiles = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("data-")).map(_.getName).toSet
    val kept = LakeVersions.versions(s, dir).collect().map(_.getLong(0)).toSeq
    assert(kept.size == 1)
    assert(dataFiles.nonEmpty)
    assert(LakeVersions.read(s, dir).inputFiles.map(
      p => p.substring(p.lastIndexOf('/') + 1)).toSet == dataFiles)
  }

  test("an empty committed version (full purge) keeps the table schema") {
    val s = spark
    import s.implicits._
    val dir = lake()
    LakeVersions.commit(s, dir, Seq((1, "a")).toDF("k", "t"))
    val df = Seq.empty[(Int, String)].toDF("k", "t")
    val v = LakeVersions.commit(s, dir, df, overwrite = true)
    val purged = LakeVersions.read(s, dir, Some(v))
    assert(purged.schema.fieldNames.toSeq == Seq("k", "t"),
      "a purge must read with the table's shape, not a zero-column frame")
    assert(purged.count() == 0L)
    // diffs across the purge still resolve their key columns
    val d = LakeVersions.diff(s, dir, 1L, v, Seq("k")).collect()
    assert(d.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "removed")))
  }

  test("concurrent appends compose: parallel committers never clobber") {
    val s = spark
    import s.implicits._
    val dir = lake()
    LakeVersions.commit(s, dir, Seq((0, "seed")).toDF("k", "t"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      import scala.jdk.CollectionConverters._
      val tasks = (1 to 4).map { i =>
        new java.util.concurrent.Callable[Long] {
          def call(): Long =
            LakeVersions.commit(s, dir, Seq((i, s"w$i")).toDF("k", "t"))
        }
      }
      val vs = pool.invokeAll(tasks.asJava).asScala.map(_.get()).sorted.toSeq
      // four distinct versions, and the final state holds EVERY row —
      // lost-race retries recompute against the winner
      assert(vs.distinct.size == 4)
      assert(LakeVersions.read(s, dir).select("k")
        .collect().map(_.getInt(0)).sorted.toSeq == (0 to 4))
    } finally pool.shutdown()
  }
}
