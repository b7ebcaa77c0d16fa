package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Staleness guard for the committed sf1 bench record: the honest sf1
  * measurement (tools/refbaseline/bench_sf1.json, aggregate ratio
  * 0.044) is a one-shot artifact, and its validity depends on exactly
  * two sources — RefBench.scala (the measured b_* query shapes) and
  * BenchForce.scala (what "fully evaluated" means). If either drifts
  * from the hashes recorded at measurement time, this spec fails with
  * re-run instructions, so the committed number can never silently
  * diverge from the tree the way a stale README claim would. */
class Sf1BaselineGuardSpec extends AnyFunSuite {

  private def md5(path: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(Files.readAllBytes(Paths.get(path)))
    d.map("%02x".format(_)).mkString
  }

  private def metaField(meta: String, key: String): String =
    ("\"" + key + "\"\\s*:\\s*\"([0-9a-f]{32})\"").r
      .findFirstMatchIn(meta).map(_.group(1))
      .getOrElse(fail(s"bench_sf1.meta.json: missing/malformed $key"))

  test("bench_sf1.json still describes the sources in the tree") {
    val meta = Files.readString(Paths.get("tools/refbaseline/bench_sf1.meta.json"))
    def check(key: String, src: String): Unit = {
      val want = metaField(meta, key)
      val got = md5(src)
      assert(got == want,
        s"$src changed since the sf1 record was measured ($got != $want): " +
          "re-run the sf1 b_* sweep and refresh tools/refbaseline/" +
          "bench_sf1.{json,meta.json} (see meta note for the command)")
    }
    check("refbench_scala_md5", "src/main/scala/graft/RefBench.scala")
    check("benchforce_scala_md5", "src/main/scala/graft/BenchForce.scala")
  }
}
