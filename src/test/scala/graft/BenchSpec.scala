package graft

import org.scalatest.funsuite.AnyFunSuite

/** The judged bench line is a harness contract: one JSON object, last line
  * of output, small enough to survive a ~2000-char tail capture. These
  * tests pin the line shape without starting Spark. */
class BenchSpec extends AnyFunSuite {

  // 14-char names: the real suite's 90 names average 13.6 chars
  private val names90 = (1 to 90).map(i => f"dd_query_nm_$i%02d")

  test("judged line fits the capture window for 90 long-named queries") {
    // Worst case: every value needs maximum digits at level 0
    val results = names90.map(_ -> 13.77)
    val line = Bench.judgedLine(results, Set.empty, "sf0.1")
    assert(line.length <= 1900, s"line is ${line.length} chars")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith(""","sf":"sf0.1"}"""))
  }

  test("judged line is valid single-line JSON with every query present") {
    val results = Seq("q1_agg" -> 1.234, "dd_exact" -> 0.567, "a1" -> 0.05)
    val line = Bench.judgedLine(results, Set.empty, "sf0.01")
    assert(!line.contains("\n"))
    assert(line.contains("\"q1_agg\":1.2"))
    assert(line.contains("\"dd_exact\":0.57"))
    assert(line.contains("\"a1\":0.05"))
    assert(line.contains("\"unit\":\"sec\""))
  }

  test("failed queries are listed under errors, not as fake timings") {
    val line = Bench.judgedLine(Seq("ok_q" -> 0.4, "bad_q" -> 0.001),
      Set("bad_q"), "sf0.1")
    assert(line.contains(""""errors":["bad_q"]"""))
  }

  test("trailing zeros are trimmed and locale is ROOT (dot decimal)") {
    val line = Bench.judgedLine(Seq("q" -> 1.5, "r" -> 2.0), Set.empty, "sf0.1")
    assert(line.contains("\"q\":1.5"))
    assert(line.contains("\"r\":2,") || line.contains("\"r\":2}"))
    // a comma-decimal locale would emit e.g. "1,5" — invalid JSON
    assert(!line.matches(""".*\d,\d.*"""))
  }
}
