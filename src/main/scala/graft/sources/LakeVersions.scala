package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned commits over a parquet lake — a table format "lite": the
  * last missing piece between "a directory of parquet files" and a
  * corpus store with concurrent-writer isolation and time travel.
  * (Reference scope note: the reference has no table format at all —
  * io.py reads loose files; this is §2.11 extension surface, the shape
  * Iceberg/Delta pioneered, reduced to what a curation lake needs.)
  *
  * Layout:
  * {{{
  * lake/
  *   _graft_versions/
  *     v00000001.manifest     # one "relpath\tlen" line per data file
  *     v00000002.manifest
  *     LOCK                   # present only while a commit is writing
  *   data-<uuid>-p00000.parquet ...
  * }}}
  *
  * The invariants that make it safe:
  *
  *  - DATA FILES ARE IMMUTABLE AND UNIQUELY NAMED. A commit first
  *    lands its files under fresh uuid names — invisible to every
  *    reader, because readers list NO directory: they read exactly the
  *    files their manifest names. Half-landed commits are therefore
  *    unobservable, and failed commits leave only unreferenced files
  *    for [[vacuum]].
  *  - A VERSION IS ONE FILE. The manifest is written tmp-then-rename
  *    after its data files are all in place, so a reader that can see
  *    `vN.manifest` can read every file it names.
  *  - COMMITS SERIALIZE UNDER ONE TABLE LOCK, so an append always
  *    builds on the true latest manifest — concurrent append/append
  *    COMPOSE instead of silently dropping the loser's rows (a
  *    per-version claim would serialize version NUMBERS but not
  *    CONTENT; that is the lost-update race table formats exist to
  *    close). Same-driver committers serialize on a JVM monitor;
  *    cross-driver committers on a `LOCK` file taken with
  *    create-exclusive — atomic on HDFS/object stores, a documented
  *    microsecond check-then-create window on the raw local fs — and
  *    a lock whose holder died is BROKEN after `lockStaleMs` (commits
  *    are driver-side metadata writes, orders of magnitude faster
  *    than any sane staleness margin; the data files were landed
  *    before the lock was taken).
  *  - TIME TRAVEL IS FREE. Old manifests stay until [[vacuum]] drops
  *    them; [[read]] pins any surviving version, and
  *    [[graft.operators.Snapshot.snapshotDiff]] over two pinned reads
  *    is the audit diff (the delta algebra already exists).
  *
  * Scale shape: a commit's driver-side work is one manifest write plus
  * one lock create — O(files) text lines, no listing of the lake; a
  * read costs one manifest read; only [[vacuum]] ever lists the data
  * directory. Paths are RELATIVE, so a lake can be relocated or
  * mirrored wholesale. */
object LakeVersions {

  private val VersionsDir = "_graft_versions"
  private val Manifest = "v(\\d{8})\\.manifest".r
  /** Same-driver commit serialization (the common concurrent case:
    * parallel jobs in one application); the fs LOCK file covers
    * cross-driver writers. */
  private val localCommitLock = new Object

  private def versionsPath(lake: HPath) = new HPath(lake, VersionsDir)
  private def manifestPath(lake: HPath, v: Long) =
    new HPath(versionsPath(lake), f"v$v%08d.manifest")

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, HPath) = {
    val p = new HPath(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Latest committed manifest version, 0 = none. */
  private def state(fs: FileSystem, lake: HPath): Long = {
    val vp = versionsPath(lake)
    if (!fs.exists(vp)) 0L
    else fs.listStatus(vp).foldLeft(0L) { (acc, s) =>
      s.getPath.getName match {
        case Manifest(v) => math.max(acc, v.toLong)
        case _           => acc
      }
    }
  }

  private val ManifestMagic = "graft-lake-manifest-v1"

  /** (table schema, data files). The schema rides in the manifest
    * header so an EMPTY committed version (a legal full purge) still
    * reads with the table's shape instead of a zero-column frame. */
  private def readManifest(fs: FileSystem, lake: HPath, v: Long)
      : (org.apache.spark.sql.types.StructType, Seq[(String, Long)]) = {
    val lines = AvroIo.readSmallFile(fs, manifestPath(lake, v))
      .split("\n").iterator.filter(_.nonEmpty)
    val header = lines.next().split("\t", 2)
    require(header(0) == ManifestMagic,
      s"LakeVersions: unrecognized manifest header for v$v under $lake")
    val schema = org.apache.spark.sql.types.DataType.fromJson(header(1))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    (schema, lines.map { l =>
      val t = l.split("\t"); (t(0), t(1).toLong)
    }.toSeq)
  }

  /** Latest committed version, 0 = no table yet. */
  def latestVersion(spark: SparkSession, dir: String): Long = {
    val (fs, lake) = fsFor(spark, dir)
    state(fs, lake)
  }

  /** Commit `df` as the next version. `overwrite=false` (append): the
    * new version references the previous version's files PLUS the new
    * ones; `overwrite=true`: only the new ones. Returns the committed
    * version number. The data files land BEFORE the lock is taken (the
    * slow, distributed part runs unlocked and unobservable); only the
    * manifest write serializes. A LOCK older than `lockStaleMs` is
    * broken (its holder died mid-commit; the next vacuum sweeps its
    * unreferenced files). */
  def commit(spark: SparkSession, dir: String, df: DataFrame,
             overwrite: Boolean = false,
             lockWaitMs: Long = 60000, lockStaleMs: Long = 60000): Long = {
    val (fs, lake) = fsFor(spark, dir)
    fs.mkdirs(versionsPath(lake))
    // land the data files first, under a commit-unique prefix —
    // invisible until a manifest names them
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    val staging = new HPath(lake, s"_graft_staging/$uuid")
    df.write.mode("overwrite").parquet(staging.toString)
    val landed = Seq.newBuilder[(String, Long)]
    fs.listStatus(staging).foreach { s =>
      val n = s.getPath.getName
      if (s.isFile && !n.startsWith(".") && !n.startsWith("_")) {
        val dest = s"data-$uuid-$n"
        require(fs.rename(s.getPath, new HPath(lake, dest)),
          s"LakeVersions.commit: landing rename failed for ${s.getPath}")
        landed += ((dest, s.getLen))
      }
    }
    fs.delete(staging, true): Unit
    val newFiles = landed.result()
    localCommitLock.synchronized {
      val lock = new HPath(versionsPath(lake), "LOCK")
      val deadline = System.currentTimeMillis() + lockWaitMs
      var held = false
      while (!held) {
        held =
          try {
            // the holder's identity goes INTO the lock, so release can
            // never delete a lock some other writer took after a break
            val out = fs.create(lock, false)
            try out.write(uuid.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
            true
          }
          catch { case _: java.io.IOException => false }
        if (!held) {
          val st = try Some(fs.getFileStatus(lock))
                   catch { case _: java.io.FileNotFoundException => None }
          st match {
            case Some(x) if x.getModificationTime <
                System.currentTimeMillis() - lockStaleMs =>
              // break a dead holder's lock — but re-stat first and only
              // delete the EXACT file observed stale, so two breakers
              // racing cannot take out each other's fresh lock
              val again = try Some(fs.getFileStatus(lock))
                          catch { case _: java.io.FileNotFoundException => None }
              if (again.exists(a => a.getModificationTime == x.getModificationTime
                  && a.getLen == x.getLen))
                fs.delete(lock, false): Unit
            case _ =>
              if (System.currentTimeMillis() > deadline)
                throw new IllegalStateException(
                  s"LakeVersions.commit: could not take $lock within ${lockWaitMs} ms")
              Thread.sleep(50)
          }
        }
      }
      try {
        val latest = state(fs, lake)
        val next = latest + 1
        val files =
          (if (overwrite || latest == 0) newFiles
           else readManifest(fs, lake, latest)._2 ++ newFiles)
        val header = s"$ManifestMagic\t${df.schema.json}"
        val tmp = new HPath(versionsPath(lake), s".v$next.$uuid.tmp")
        val out = fs.create(tmp, true)
        try out.write((header +: files.map { case (f, l) => s"$f\t$l" })
          .mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        // ownership check right before the publish: a racing breaker
        // that misjudged OUR fresh lock as the stale one (its re-stat
        // ran before we replaced it) would have deleted it and taken
        // its own — in that case the critical section is torn, so
        // throw rather than overwrite the usurper's manifest. Data
        // files are landed and unreferenced; the caller can retry
        // commit() cheaply and vacuum reclaims them otherwise.
        val mine = try AvroIo.readSmallFile(fs, lock) == uuid
                   catch { case _: java.io.IOException => false }
        if (!mine) throw new IllegalStateException(
          s"LakeVersions.commit: lock ownership lost under $dir " +
            "(a stale-lock breaker raced this commit) — retry commit()")
        require(fs.rename(tmp, manifestPath(lake, next)),
          s"LakeVersions.commit: manifest rename failed for v$next")
        next
      } finally {
        // release only OUR lock: a breaker may have replaced it
        val mine = try AvroIo.readSmallFile(fs, lock) == uuid
                   catch { case _: java.io.IOException => false }
        if (mine) fs.delete(lock, false): Unit
      }
    }
  }

  /** Read a pinned `version` (default: latest). The frame reads
    * EXACTLY the manifest's files — concurrent commits and dead
    * writers' unreferenced litter are invisible. Schemas across
    * versions merge losslessly (mergeSchema). */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame = {
    val (fs, lake) = fsFor(spark, dir)
    val v = version.getOrElse(state(fs, lake))
    require(v > 0, s"LakeVersions.read: no committed version under $dir")
    require(fs.exists(manifestPath(lake, v)),
      s"LakeVersions.read: version $v does not exist (vacuumed?) under $dir")
    val (schema, files) = readManifest(fs, lake, v)
    if (files.isEmpty)
      // an empty committed version is legal (overwrite with zero
      // rows); it still reads with the TABLE's schema, not a
      // zero-column frame — selects and diffs keep resolving
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.option("mergeSchema", "true")
        .parquet(files.map { case (f, _) => new HPath(lake, f).toString }: _*)
  }

  /** The version ledger: one row per surviving manifest. */
  def versions(spark: SparkSession, dir: String): DataFrame = {
    val (fs, lake) = fsFor(spark, dir)
    val latest = state(fs, lake)
    val rows = (1L to latest).flatMap { v =>
      if (!fs.exists(manifestPath(lake, v))) None
      else {
        val files = readManifest(fs, lake, v)._2
        Some((v, files.size, files.map(_._2).sum))
      }
    }
    spark.createDataFrame(rows).toDF("version", "n_files", "bytes")
  }

  /** Audit diff between two pinned versions by key — the
    * snapshotDiff delta algebra over time travel. */
  def diff(spark: SparkSession, dir: String, fromV: Long, toV: Long,
           keyCols: Seq[String]): DataFrame = {
    val from = read(spark, dir, Some(fromV))
    val to = read(spark, dir, Some(toV))
    val compareCols = to.columns.filterNot(keyCols.contains).toSeq
    graft.operators.Snapshot.snapshotDiff(from, to, keyCols, compareCols)
  }

  /** Retention: keep the newest `keepVersions` manifests, drop older
    * ones, delete data files no surviving manifest references, and
    * sweep stale locks/staging older than `olderThanMs` (the margin
    * against a LIVE writer mid-commit — its files are landed but its
    * manifest not yet renamed). Returns the number of files deleted. */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int = 2,
             olderThanMs: Long = 24L * 3600 * 1000): Int = {
    require(keepVersions >= 1, "LakeVersions.vacuum: keepVersions must be >= 1")
    val (fs, lake) = fsFor(spark, dir)
    val latest = state(fs, lake)
    if (latest == 0) return 0
    val cutoff = System.currentTimeMillis() - olderThanMs
    var removed = 0
    val keep = ((latest - keepVersions + 1) max 1L) to latest
    val referenced = keep.flatMap { v =>
      if (fs.exists(manifestPath(lake, v))) readManifest(fs, lake, v)._2.map(_._1)
      else Nil
    }.toSet
    (1L until keep.start).foreach { v =>
      val m = manifestPath(lake, v)
      if (fs.exists(m)) { fs.delete(m, false): Unit; removed += 1 }
    }
    // a LOCK whose holder died: the commit path breaks these itself,
    // but a lake nobody writes anymore should not keep one forever
    fs.listStatus(versionsPath(lake)).foreach { s =>
      if (s.getPath.getName == "LOCK" && s.getModificationTime < cutoff) {
        fs.delete(s.getPath, false): Unit; removed += 1
      }
    }
    // unreferenced data files older than the margin (a live commit's
    // landed-but-unmanifested files are younger than it)
    fs.listStatus(lake).foreach { s =>
      val n = s.getPath.getName
      if (s.isFile && n.startsWith("data-") && !referenced(n) &&
          s.getModificationTime < cutoff) {
        fs.delete(s.getPath, false): Unit; removed += 1
      }
    }
    // abandoned staging dirs
    val stagingRoot = new HPath(lake, "_graft_staging")
    if (fs.exists(stagingRoot)) {
      fs.listStatus(stagingRoot).foreach { s =>
        if (s.getModificationTime < cutoff) {
          fs.delete(s.getPath, true): Unit; removed += 1
        }
      }
    }
    removed
  }
}
