package graft

/** Child half of the TWO-PROCESS LakeVersions commit differential
  * (LakeVersionsSpec forks this in a fresh JVM while committing from
  * its own): proves the cross-driver story — appends from two
  * independent drivers serialize on the fs LOCK file and COMPOSE, no
  * lost updates, dense version numbers. This exercises the
  * create-exclusive path on the raw local filesystem, where
  * check-then-create has a documented microsecond window (atomic on
  * HDFS/object stores); the differential passing repeatedly is the
  * empirical witness that the window does not bite at commit
  * granularity.
  *
  * {{{ runMain graft.LakeCommitProbe <lakeDir> <readyFile> <goFile> <label> <count> }}}
  *
  * Protocol: boot Spark, touch `readyFile`, spin until `goFile`
  * appears (the parent creates it once both sides are ready, so the
  * commit loops genuinely overlap), then append `count` one-row
  * commits labeled `<label>-<i>`.
  */
object LakeCommitProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 5,
      "usage: LakeCommitProbe <lakeDir> <readyFile> <goFile> <label> <count>")
    val Array(lakeDir, readyFile, goFile, label, countS) = args
    val count = countS.toInt
    val spark = Session.local(cores = 2, appName = "graft-lake-commit-child")
    try {
      import spark.implicits._
      java.nio.file.Files.createFile(java.nio.file.Paths.get(readyFile)): Unit
      val deadline = System.currentTimeMillis() + 120000
      while (!java.nio.file.Files.exists(java.nio.file.Paths.get(goFile))) {
        require(System.currentTimeMillis() < deadline,
          "LakeCommitProbe: parent never signaled go")
        Thread.sleep(20)
      }
      (0 until count).foreach { i =>
        graft.sources.LakeVersions.commit(spark, lakeDir,
          Seq((s"$label-$i", label)).toDF("k", "owner")): Unit
      }
      println(s"[lake-commit-child] committed $count appends")
    } finally spark.stop()
  }
}
