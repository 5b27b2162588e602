package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench load-warning norm must be the MIN of recent HONEST runs,
  * not the previous artifact's wall clock: round 14's driver run was
  * contaminated (3403 s vs a ~1500 s norm) and under previous-run
  * comparison its artifact would have raised the bar to 6800 s —
  * silently blessing a moderately-loaded successor. */
class BenchNormSpec extends AnyFunSuite {

  test("a contaminated artifact does not raise the norm for the next run") {
    // honest history 1500 s; a 3403 s run warns and does NOT join it
    val honest = Seq(1500.0)
    assert(Bench.loadWarn(honest, 3403.0))
    val after = Bench.nextHonestRuns(honest, 3403.0, loaded = true)
    assert(after == Seq(1500.0))
    // ...so a moderately-loaded 3200 s successor STILL warns (the
    // previous-artifact comparison would have blessed it: 3200 < 2*3403)
    assert(Bench.loadWarn(after, 3200.0))
  }

  test("honest runs join the window; window keeps the last 5") {
    val h1 = Bench.nextHonestRuns(Seq.empty, 1500.0, loaded = false)
    assert(h1 == Seq(1500.0))
    val h6 = (1 to 6).foldLeft(Seq(1500.0)) { (h, i) =>
      Bench.nextHonestRuns(h, 1500.0 + i, loaded = false)
    }
    assert(h6.size == 5 && !h6.contains(1500.0) && h6.last == 1506.0)
  }

  test("parses honest_runs from the artifact; falls back to run_secs of " +
      "a clean legacy artifact; a warned legacy artifact yields none") {
    val withList =
      """{"run_secs":900.0,"load_warning":false,"honest_runs":[800.0,850.0]}"""
    assert(Bench.honestRuns(Some(withList)) == Seq(800.0, 850.0))
    val legacyClean = """{"run_secs":900.0,"load_warning":false}"""
    assert(Bench.honestRuns(Some(legacyClean)) == Seq(900.0))
    val legacyWarned = """{"run_secs":3403.2,"load_warning":true}"""
    assert(Bench.honestRuns(Some(legacyWarned)).isEmpty)
    assert(Bench.honestRuns(None).isEmpty)
    // no history -> never warns (first run on a box is its own norm)
    assert(!Bench.loadWarn(Seq.empty, 9999.0))
  }
}
