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

  // Parse-contract pin (three failed hypotheses deep — see the
  // canonicalLine scaladoc): the one line the driver has ever parsed
  // (r10) carried the FULL per-query map in RUN order with key order
  // metric,value,unit,queries,sf and no extra keys. r16 matched the
  // template but elided the map to a length budget and still recorded
  // parsed:null — so elision itself is the last suspect standing.
  // Pin: full map, run order, exact key order, no extras, no bound.
  test("canonicalLine carries every query in run order with the r10 key order") {
    val best = scala.collection.mutable.LinkedHashMap(
      (1 to 190).map(i => f"q_query_with_a_realistic_name_$i%03d" -> (0.05 * i)): _*)
    val total = best.values.sum
    val line = Bench.canonicalLine(best, total, "/root/testdata/sf0.1")
    // Byte-anchored template probes: documented key order, no extras.
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.contains(""","unit":"sec","queries":{"""))
    assert(line.endsWith("""},"sf":"/root/testdata/sf0.1"}"""))
    assert(!line.contains("queries_elided") && !line.contains("contaminated"))
    // The driver-documented key set, in order.
    val keyOrder = """"(metric|value|unit|queries|sf)":""".r
      .findAllMatchIn(line).map(_.group(1)).toSeq
    assert(keyOrder == Seq("metric", "value", "unit", "queries", "sf"))
    // EVERY query is present, in insertion (run) order — no elision.
    val kept = """"q_query_with_a_realistic_name_(\d+)":""".r
      .findAllMatchIn(line).map(_.group(1).toInt).toSeq
    assert(kept == (1 to 190))
    // One line: no interior newlines to split the driver's line scan.
    assert(!line.contains("\n"))
  }

  test("canonicalLine formats values compactly and keeps the sf path verbatim") {
    val best = scala.collection.mutable.LinkedHashMap("q_a" -> 1.0, "q_b" -> 2.5)
    val line = Bench.canonicalLine(best, 3.5, "/tmp/sf")
    assert(line.contains(""""q_a":1.0""") && line.contains(""""q_b":2.5"""))
    assert(line.contains(""""value":3.5"""))
    assert(line.endsWith("""},"sf":"/tmp/sf"}"""))
    // Run-order (insertion-order) inside the map, NOT slowest-first:
    // r10's parsed line was run-ordered.
    assert(line.indexOf("q_a") < line.indexOf("q_b"))
  }

  // VERDICT r18 #7: a contaminated driver run must self-document from
  // the sealed artifact's 2000-char tail — the digest (passes, min/max
  // pass totals, max loadavg, contaminated flag) prints right above
  // the trailer and must stay tiny.
  test("digest line is <=150 bytes and carries the contamination evidence") {
    val line = Bench.digestLine(Seq(173.422, 96.23, 101.5), 4.93, contaminated = true, failedCount = 0)
    assert(line ==
      """BENCH_DIGEST {"passes":3,"pass_min":96.23,"pass_max":173.422,"load_max":4.93,"contaminated":true,"failed":0}""")
    assert(line.length <= 150)
    assert(!line.contains("\n"))
    // Empty pass list (warmup-only crash path) must not throw.
    assert(Bench.digestLine(Nil, 0.27, contaminated = false, failedCount = 0).contains("\"passes\":0"))
  }

  // VERDICT r17 #1: the 191-query full line (~4 KB) overflowed the
  // driver's 2000-char artifact tail from the FRONT, so the sealed
  // artifact carried no recoverable total. The total-only trailer —
  // canonicalLine with an empty map, printed as the ABSOLUTE last
  // stdout line — must stay far inside any tail window.
  test("total-only trailer line is tiny, valid, and shape-identical") {
    val line = Bench.canonicalLine(
      collection.Map.empty[String, Double], 127.43, "/root/testdata/sf0.1")
    assert(line ==
      """{"metric":"total","value":127.43,"unit":"sec","queries":{},"sf":"/root/testdata/sf0.1"}""")
    assert(line.length <= 200)
  }

  // VERDICT r20 "what's wrong" #2: the driver's post-seal contaminated
  // re-run overwrote the committed uncontaminated per-query floor.
  // A contaminated run must divert to a side path when the existing
  // artifact is sealed clean; every other combination keeps the path.
  test("resolveQueryFile protects a sealed uncontaminated artifact") {
    val path = "/root/repo/BENCH_QUERIES.json"
    val sealedClean = Some("""{"value":119.064,"contaminated":false}""")
    val sealedHot = Some("""{"value":202.448,"contaminated":true}""")
    // the one diverting case
    assert(Bench.resolveQueryFile(path, contaminated = true, sealedClean) ==
      "/root/repo/BENCH_QUERIES.contaminated.json")
    // clean run always writes the requested path (including over a hot one)
    assert(Bench.resolveQueryFile(path, contaminated = false, sealedClean) == path)
    assert(Bench.resolveQueryFile(path, contaminated = false, sealedHot) == path)
    // contaminated over contaminated / over nothing: keep the path
    assert(Bench.resolveQueryFile(path, contaminated = true, sealedHot) == path)
    assert(Bench.resolveQueryFile(path, contaminated = true, None) == path)
    // non-.json paths get a readable suffix too
    assert(Bench.resolveQueryFile("/tmp/q", contaminated = true, sealedClean) ==
      "/tmp/q.contaminated.json")
    // ADVICE r21: the flag parses tolerantly — whitespace after the
    // colon (pretty-printers, external tools) must not disable the
    // protection...
    val sealedCleanSpaced = Some("""{"value": 119.064, "contaminated": false}""")
    assert(Bench.resolveQueryFile(path, contaminated = true, sealedCleanSpaced) ==
      "/root/repo/BENCH_QUERIES.contaminated.json")
    // ...and an existing file with NO recognizable flag fails toward
    // diverting (sealed-clean), never toward overwriting
    val unparseable = Some("""{"value":119.064}""")
    assert(Bench.resolveQueryFile(path, contaminated = true, unparseable) ==
      "/root/repo/BENCH_QUERIES.contaminated.json")
    assert(Bench.resolveQueryFile(path, contaminated = false, unparseable) == path)
  }
}
