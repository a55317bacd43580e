package graft

import org.scalatest.funsuite.AnyFunSuite

class MainSpec extends AnyFunSuite {

  test("parseArgs turns --k v pairs into a map") {
    val got = Main.parseArgs(Array(
      "--pipeline", "enrich", "--entity_type", "checkin",
      "--dimension_inputs", "/a,/b", "--dimension_entity_types", "business,user"))
    assert(got == Map(
      "pipeline" -> "enrich", "entity_type" -> "checkin",
      "dimension_inputs" -> "/a,/b", "dimension_entity_types" -> "business,user"))
  }

  test("parseArgs accepts --key=value, the escape hatch for -- values") {
    assert(Main.parseArgs(Array("--rules=--weird LIKE '--%'", "--input", "a")) ==
      Map("rules" -> "--weird LIKE '--%'", "input" -> "a"))
    // inline form between pairs does not shift the pair positions,
    // and values containing '=' survive intact
    assert(Main.parseArgs(Array("--a", "1", "--b=x=y", "--c", "3")) ==
      Map("a" -> "1", "b" -> "x=y", "c" -> "3"))
  }

  test("parseArgs rejects malformed tokens instead of shifting pairings") {
    // lenient parsing used to turn `--verbose --input a` into
    // verbose='--input' and silently drop the input arg
    intercept[RuntimeException] { Main.parseArgs(Array("stray")) }
    intercept[RuntimeException] { Main.parseArgs(Array("--only_key")) }
    intercept[RuntimeException] {
      Main.parseArgs(Array("--verbose", "--input", "a.ndjson", "--out", "/tmp/x"))
    }
  }
}
