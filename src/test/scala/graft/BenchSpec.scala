package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the contamination gate VERDICT r9 #1 asked for: the bench must
  * flag a host whose 15-minute loadavg is still hot even when the
  * 1-minute figure has already drained (the false-clean that inflated
  * three identical r9 suites 1.5×).
  */
class BenchSpec extends AnyFunSuite {

  test("parseLoadavg reads all three horizons from a /proc/loadavg line") {
    assert(Bench.parseLoadavg("0.62 3.10 16.04 2/1549 12345\n") == (0.62, 3.10, 16.04))
    assert(Bench.parseLoadavg("1.00 1.00 1.00 1/100 1") == (1.0, 1.0, 1.0))
  }

  test("isHot raises on a hot 15-min average even when 1-min is calm") {
    // The exact r9 false-clean shape: 1-min ≈1 while draining a 100× probe.
    assert(Bench.isHot((1.0, 8.0, 16.0)))
    assert(Bench.isHot((1.27, 2.9, 6.0)))
  }

  test("isHot raises on a 1-min burst and stays quiet on a clean host") {
    assert(Bench.isHot((4.9, 1.0, 0.5)))
    assert(!Bench.isHot((0.62, 0.8, 1.2)))
    assert(!Bench.isHot((2.5, 1.0, 2.0))) // thresholds are strict
  }

  // VERDICT r14 #2: at 151 queries the full per-query map (~4 KB)
  // outgrew the driver's ~2000-char stdout tail and the canonical
  // line's head — "value" included — was clipped (rc:0/parsed:null).
  // The line is now bounded by construction; pin it with a suite the
  // size of the real one.
  test("canonicalLine stays under budget for a 151-query suite and elides visibly") {
    val best = (1 to 151)
      .map(i => f"q_query_with_a_realistic_name_$i%03d" -> (0.05 * i))
      .toMap
    val total = best.values.sum
    val line = Bench.canonicalLine(best, total, "/root/testdata/sf0.1",
      extraJson = ""","contaminated":true""")
    assert(line.length <= 1400, s"line is ${line.length} chars")
    // Valid JSON with the fields the driver needs, by simple probes.
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith("}"))
    assert(line.contains(""""sf":"/root/testdata/sf0.1""""))
    assert(line.contains(""""queries_elided":"""))
    // Slowest queries survive; the elision count covers the rest.
    assert(line.contains("q_query_with_a_realistic_name_151"))
    val kept = """"q_query_with_a_realistic_name_""".r.findAllIn(line).size
    val elided = """"queries_elided":(\d+)""".r
      .findFirstMatchIn(line).get.group(1).toInt
    assert(kept + elided == 151)
    assert(elided > 0) // the budget genuinely binds at this suite size
  }

  test("canonicalLine keeps every query when the suite fits the budget") {
    val best = Map("q_a" -> 1.0, "q_b" -> 2.5)
    val line = Bench.canonicalLine(best, 3.5, "/tmp/sf")
    assert(line.contains(""""q_a":1.0""") && line.contains(""""q_b":2.5"""))
    assert(line.contains(""""queries_elided":0"""))
    assert(line.contains(""""value":3.5"""))
    // Slowest-first ordering inside the map.
    assert(line.indexOf("q_b") < line.indexOf("q_a"))
  }
}
