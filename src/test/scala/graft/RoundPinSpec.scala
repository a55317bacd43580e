package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static scan enforcing the signed-zero rounding convention
  * (VERDICT r18 #3, the bug that was re-found five rounds running):
  * every Column-API rounding of an output value must go through
  * [[graft.functions.GraftFunctions.roundPinned]] (`round(c, n) +
  * lit(0.0)`) so a tiny-negative input can never surface as −0.0 and
  * hash-diverge from the oracle's +0.0. The scan walks src/main,
  * strips string literals (oracle SQL keeps plain DuckDB `round`) and
  * comments, and fails on any remaining bare `round(` outside the
  * helper's own definition. `math.round(`/`Math.round(` (JVM-side,
  * not a Column) are excluded by the dotted-call lookbehind.
  */
class RoundPinSpec extends AnyFunSuite {

  /** Blank out string literals and comments so the scan sees only
    * live Scala Column code; newlines survive for line numbers. A
    * state machine, not regexes: a triple-quoted string ends at the
    * LAST three quotes of a quote run (Scala lets `"…"""" ` close a
    * string whose content ends in `"`), and a lazy regex terminates
    * one character early there, desynchronizing everything after —
    * exactly what CurationQueries' `ORDER BY "column""""` would do.
    */
  def stripStringsAndComments(src: String): String = {
    val out = new StringBuilder(src.length)
    def blank(from: Int, until: Int): Unit =
      (from until until).foreach(k => out += (if (src(k) == '\n') '\n' else ' '))
    var i = 0
    val n = src.length
    while (i < n) {
      if (src.startsWith("\"\"\"", i)) {
        var j = i + 3
        var open = true
        while (j < n && open) {
          if (src(j) == '"') {
            var k = j
            while (k < n && src(k) == '"') k += 1
            if (k - j >= 3) { j = k; open = false } else j = k
          } else j += 1
        }
        blank(i, j); i = j
      } else if (src(i) == '"') {
        var j = i + 1
        while (j < n && src(j) != '"') {
          if (src(j) == '\\') j += 1
          j += 1
        }
        j = math.min(j + 1, n)
        blank(i, j); i = j
      } else if (src.startsWith("//", i)) {
        val e = src.indexOf('\n', i)
        val j = if (e == -1) n else e
        blank(i, j); i = j
      } else if (src.startsWith("/*", i)) {
        val e = src.indexOf("*/", i)
        val j = if (e == -1) n else e + 2
        blank(i, j); i = j
      } else {
        out += src(i); i += 1
      }
    }
    out.toString
  }

  /** (line, snippet) of every bare Column-API `round(` call: not
    * preceded by a letter/underscore (excludes roundPinned, bround)
    * or a dot (excludes math.round / Math.round).
    */
  def bareRounds(src: String): Seq[(Int, String)] = {
    val stripped = stripStringsAndComments(src)
    """(?<![A-Za-z_.])round\(""".r.findAllMatchIn(stripped).map { m =>
      val line = stripped.substring(0, m.start).count(_ == '\n') + 1
      (line, stripped.substring(m.start, math.min(m.start + 40, stripped.length)).trim)
    }.toSeq
  }

  test("no bare round( in Column code outside GraftFunctions.roundPinned") {
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get("src/main/scala"))
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    try {
      walk.filter(p => p.toString.endsWith(".scala")).forEach { p =>
        if (!p.toString.endsWith("functions/GraftFunctions.scala")) {
          val src = new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
          bareRounds(src).foreach { case (line, snip) =>
            offenders += s"$p:$line $snip"
          }
        }
      }
    } finally walk.close()
    assert(offenders.isEmpty,
      s"bare round( in Column code — use GraftFunctions.roundPinned " +
        s"(signed-zero pin):\n${offenders.mkString("\n")}")
  }

  test("the scan catches a deliberate canary and spares the allowed forms") {
    // Canary: a bare Column round in live code MUST be flagged.
    val canary =
      """val out = df.select(round(col("score"), 4).as("score_r"))"""
    assert(bareRounds(canary).nonEmpty, "scan must flag a bare Column round(")
    // Allowed: the pinned helper, JVM math.round, bround, SQL strings,
    // commented round.
    val allowed = Seq(
      """df.select(roundPinned(col("s"), 4).as("s_r"))""",
      """val ms = math.round(frames * 1000.0) / 1000.0""",
      """val b = bround(col("x"), 2)""",
      "val sql = \"SELECT round(sim, 4) AS sim_r FROM t\"",
      """// round(x, 4) used to live here""")
    allowed.foreach { s =>
      assert(bareRounds(s).isEmpty, s"scan must NOT flag: $s")
    }
    // Triple-quoted oracle SQL blocks are string territory too.
    val tq = "val q = \"\"\"SELECT round(jaccard, 4) AS j FROM pairs\"\"\""
    assert(bareRounds(tq).isEmpty, "scan must not flag SQL in triple quotes")
    // Quote-run terminator: content ending in '"' closes with a 4-quote
    // run; a lazy-regex strip desyncs here and corrupts the whole rest
    // of the file — this pins the state-machine rule.
    val quadQuote =
      "val a = \"\"\"ORDER BY \"column\"\"\"\".stripMargin\n" +
        "val b = df.select(round(col(\"x\"), 4))"
    assert(bareRounds(quadQuote).nonEmpty,
      "scan must stay synchronized after a quote-run string terminator")
    val quadQuoteSqlOnly =
      "val a = \"\"\"SELECT round(x, 2) FROM t ORDER BY \"column\"\"\"\".stripMargin\n" +
        "val b = df.select(roundPinned(col(\"x\"), 4))"
    assert(bareRounds(quadQuoteSqlOnly).isEmpty,
      "SQL round inside a quote-run-terminated string must not flag")
  }
}
