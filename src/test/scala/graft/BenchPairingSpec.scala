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

  test("retime fork adjudication: suspect direction, min-keep, diverged flag") {
    // normal case: fresh JVM faster than the inflated sweep — trusted as-is
    assert(!Bench.forkSuspect(insweep = 16.5, forkMedian = 5.8))
    // equality and mild slowdowns are fine (fork startup jitter)
    assert(!Bench.forkSuspect(2.9, 2.9))
    assert(!Bench.forkSuspect(2.9, 4.0))
    // the r15 hole: 41.2 s fork for a 2.9 s in-sweep query is noise
    assert(Bench.forkSuspect(2.9, 41.2))
    // the r19 hole: a 2.16x fork (q_pipeline_audit, 6.18 s vs 2.86 s
    // in-sweep) slid under the old 3x gate; 1.5x catches it
    assert(Bench.forkSuspect(2.86, 6.18))
    // retry agreed with the sweep -> keep the sane fork, unmarked
    assert(Bench.adjudicateRetime(2.9, Seq(41.2, 3.4)) == ((3.4, false)))
    // retry ALSO diverged -> keep the best number but flag it
    val (kept, diverged) = Bench.adjudicateRetime(2.9, Seq(41.2, 38.0))
    assert(kept == 38.0 && diverged)
    // single trusted fork passes through
    assert(Bench.adjudicateRetime(16.5, Seq(5.8)) == ((5.8, false)))
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
