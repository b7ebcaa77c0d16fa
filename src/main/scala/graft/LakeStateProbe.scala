package graft

/** Latest-version discovery at streaming-epoch cadence: the versioned
  * promotion commits one manifest per micro-batch, so an unvacuumed
  * month at minutes-cadence leaves ~40k manifests — and every commit,
  * read, and tagOf needs "what is latest?". This probe fabricates that
  * history (empty manifest files — discovery never parses them) and
  * times discovery via the HEAD high-water pointer (one small read +
  * one exists probe) against the listing fallback (listStatus of the
  * whole `_graft_versions/` dir), plus real one-row commits at the
  * start and end of a growing history to show commit driver latency is
  * flat in surviving versions.
  *
  * {{{ SPARK_GRAFT_LAKE_VERSIONS=40000 sbt "runMain graft.LakeStateProbe" }}}
  */
object LakeStateProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_LAKE_VERSIONS", "40000").toInt
    val spark = Session.local(cores = 4, appName = "graft-lake-state-probe")
    try {
      import spark.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory("graft-lake-state").toString + "/table"
      // two REAL commits seed a valid table (schema'd manifests + HEAD)
      graft.sources.LakeVersions.commit(spark, dir,
        Seq((1, "a")).toDF("k", "t")): Unit
      val t0 = minOf3 {
        graft.sources.LakeVersions.commit(spark, dir,
          Seq((2, "b")).toDF("k", "t")): Unit
      }
      // fabricate the epoch history: empty files match the manifest
      // name pattern, which is all discovery touches (exists/listing)
      val vdir = java.nio.file.Paths.get(dir, "_graft_versions")
      val latestReal = graft.sources.LakeVersions.latestVersion(spark, dir)
      ((latestReal + 1) to n.toLong).foreach { v =>
        java.nio.file.Files.createFile(
          vdir.resolve(f"v$v%08d.manifest")): Unit
      }
      // fabricating HEAD outside the fs API leaves the real commits'
      // checksum sidecar stale — drop it or reads fail over to listing
      def setHead(v: Long): Unit = {
        java.nio.file.Files.write(vdir.resolve("HEAD"),
          v.toString.getBytes): Unit
        java.nio.file.Files.deleteIfExists(vdir.resolve(".HEAD.crc")): Unit
      }
      setHead(n.toLong)
      def timeDiscovery(label: String): Double = {
        val ms = minOf3 {
          require(graft.sources.LakeVersions
            .latestVersion(spark, dir) == n.toLong)
        }
        println(f"[lake-state] $label%-28s $ms%8.3f ms  ($n versions)")
        ms
      }
      val withHead = timeDiscovery("discovery via HEAD pointer")
      java.nio.file.Files.delete(vdir.resolve("HEAD"))
      val viaListing = timeDiscovery("discovery via listing")
      setHead(n.toLong)
      // commit latency on the DEEP history vs the 2-version table —
      // same one-row frame; flat means discovery is out of the loop.
      // (The commit itself re-lists nothing; it reads HEAD, probes one
      // exists, reads ONE header, writes one manifest.)
      // NOTE: fabricated manifests are empty, so the header read of
      // "latest" must hit a REAL manifest — land one more real commit
      // first to sit at the top of the fabricated range.
      val fixTop = vdir.resolve(f"v$n%08d.manifest")
      java.nio.file.Files.delete(fixTop)
      java.nio.file.Files.copy(
        vdir.resolve(f"v$latestReal%08d.manifest"), fixTop): Unit
      setHead(n.toLong)
      val tN = minOf3 {
        graft.sources.LakeVersions.commit(spark, dir,
          Seq((3, "c")).toDF("k", "t")): Unit
      }
      println(f"[lake-state] commit wall at 2 versions   $t0%8.1f ms")
      println(f"[lake-state] commit wall at ~$n versions $tN%8.1f ms")
      println(f"[lake-state] pointer speedup over listing: " +
        f"${viaListing / math.max(withHead, 0.001)}%.1fx")
    } finally spark.stop()
  }

  private def minOf3(body: => Unit): Double =
    (1 to 3).map { _ =>
      val a = System.nanoTime(); body; (System.nanoTime() - a) / 1e6
    }.min
}
