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
}
