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

  // VERDICT r14 #2 and the r15 regression of the fix: at 151 queries
  // the full per-query map (~4 KB) outgrew the driver's ~2000-char
  // stdout tail (r14, rc:0/parsed:null), and the r15 bounded line —
  // complete and valid inside the tail — STILL recorded parsed:null
  // because it reordered "sf" before "queries" and carried extra keys
  // ("contaminated", "queries_elided"). The last line that parsed
  // (r10) was exactly the documented template. Pin that the canonical
  // line is byte-compatible with it: key order metric,value,unit,
  // queries,sf — no extra keys — and bounded for a 170-query suite.
  test("canonicalLine matches the documented template exactly and stays under budget") {
    val best = (1 to 170)
      .map(i => f"q_query_with_a_realistic_name_$i%03d" -> (0.05 * i))
      .toMap
    val total = best.values.sum
    val (line, elided) =
      Bench.canonicalParts(best, total, "/root/testdata/sf0.1")
    assert(line.length <= 1400, s"line is ${line.length} chars")
    // Byte-anchored template probes: documented key order, no extras.
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.contains(""","unit":"sec","queries":{"""))
    assert(line.endsWith("""},"sf":"/root/testdata/sf0.1"}"""))
    assert(!line.contains("queries_elided") && !line.contains("contaminated"))
    // The driver-documented key set, in order.
    val keyOrder = """"(metric|value|unit|queries|sf)":""".r
      .findAllMatchIn(line).map(_.group(1)).toSeq
    assert(keyOrder == Seq("metric", "value", "unit", "queries", "sf"))
    // Slowest queries survive; the elision count covers the rest.
    assert(line.contains("q_query_with_a_realistic_name_170"))
    val kept = """"q_query_with_a_realistic_name_""".r.findAllIn(line).size
    assert(kept + elided == 170)
    assert(elided > 0) // the budget genuinely binds at this suite size
  }

  test("canonicalLine keeps every query when the suite fits the budget") {
    val (line, elided) = Bench.canonicalParts(Map("q_a" -> 1.0, "q_b" -> 2.5), 3.5, "/tmp/sf")
    assert(line.contains(""""q_a":1.0""") && line.contains(""""q_b":2.5"""))
    assert(elided == 0)
    assert(line.contains(""""value":3.5"""))
    assert(line.endsWith("""},"sf":"/tmp/sf"}"""))
    // Slowest-first ordering inside the map.
    assert(line.indexOf("q_b") < line.indexOf("q_a"))
  }
}
