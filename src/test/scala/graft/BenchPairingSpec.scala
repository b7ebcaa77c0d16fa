package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench/baseline pairing rule (advisor round-7 finding): a baseline
  * CSV must only ratio against a run at ITS scale factor, matched by
  * exact sf-directory-name equality — never substring — and an explicit
  * override wins over the filename convention. */
class BenchPairingSpec extends AnyFunSuite {

  test("filename token pairs with the matching sf dir only") {
    val p = "tools/refbaseline/baseline_sf0.1.csv"
    assert(Bench.baselineMatchesRun(p, None, "/root/testdata/sf0.1"))
    assert(!Bench.baselineMatchesRun(p, None, "/root/testdata/sf0.15"),
      "sf0.1 must not substring-match sf0.15")
    assert(!Bench.baselineMatchesRun(p, None, "/root/testdata/sf1"))
    assert(!Bench.baselineMatchesRun(p, None, "/data/sf0.01"))
  }

  test("explicit sf override beats the filename convention") {
    val odd = "/tmp/my_numbers.csv" // no baseline_<sf>.csv token
    assert(!Bench.baselineMatchesRun(odd, None, "/root/testdata/sf1"))
    assert(Bench.baselineMatchesRun(odd, Some("sf1"), "/root/testdata/sf1"))
    assert(!Bench.baselineMatchesRun(odd, Some("sf1"), "/root/testdata/sf0.1"))
    // override also re-scopes a conventionally named file
    assert(Bench.baselineMatchesRun(
      "baseline_sf0.1.csv", Some("sf1"), "/data/sf1"))
  }
}
