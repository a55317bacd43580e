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

  test("parseArgs ignores malformed tokens") {
    assert(Main.parseArgs(Array("stray")) == Map.empty)
    assert(Main.parseArgs(Array("--only_key")) == Map.empty)
  }
}
