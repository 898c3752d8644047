package graft

import org.scalatest.funsuite.AnyFunSuite

/** The judged bench line is a harness contract: one JSON object, last line
  * of output, small enough to survive a ~2000-char tail capture. These
  * tests pin the line shape without starting Spark. */
class BenchSpec extends AnyFunSuite {

  // 14-char names: the real suite's names average 13.6 chars
  private val names90 = (1 to 90).map(i => f"dd_query_nm_$i%02d")

  test("judged line fits the capture window for 90 long-named queries") {
    // Worst case: every value needs maximum digits at level 0
    val results = names90.map(_ -> 13.77)
    val line = Bench.judgedLine(results, Set.empty, "sf0.1")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith(""","sf":"sf0.1"}"""))
  }

  test("judged line NEVER exceeds the budget — fastest entries fold into omitted") {
    // Round 3 failed exactly here: ~99 real-length names overflowed even at
    // max precision degradation and the oversized line was emitted anyway,
    // so the tail capture cut its head. 300 long-named queries is far past
    // any precision fix — the drop-fastest path must engage.
    val results = (1 to 300).map(i => f"ev_stream_attribution_$i%03d" -> (i / 10.0))
    val line = Bench.judgedLine(results, Set.empty, "sf0.1")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith(""","sf":"sf0.1"}"""))
    assert(line.contains(""""omitted":{"n":"""))
    // the SLOWEST query must survive verbatim; the fastest is folded away
    assert(line.contains("\"ev_stream_attribution_300\":"))
    assert(!line.contains("\"ev_stream_attribution_001\":"))
    // kept + omitted must cover every query
    val kept = "\"ev_stream_attribution_\\d+\":".r.findAllIn(line).size
    val om = """"omitted":\{"n":(\d+)""".r.findFirstMatchIn(line).get.group(1).toInt
    assert(kept + om == 300)
  }

  test("the real suite's names stay under budget; slow queries survive verbatim") {
    // realistic value mix (mostly sub-second, a few heavy): the line must
    // fit, every query must be either present or counted in omitted, and
    // the heavy hitters — the ones that drive the 2x gate — must be present
    // the fleet line also carries one stage:<name> row per staged
    // intermediate — include them so the budget check matches reality
    val names = (SparkEntry.queries.keys.toSeq ++
      graft.queries.Stages.all.map(_._1)).sorted
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 17 == 0) 8.5 else 0.3 + (i % 7) / 10.0) }
    val line = Bench.judgedLine(results, Set.empty, "sf0.1")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    val kept = names.count(n => line.contains("\"" + n + "\":"))
    val om = """"omitted":\{"n":(\d+)""".r.findFirstMatchIn(line)
      .map(_.group(1).toInt).getOrElse(0)
    assert(kept + om == names.size, s"kept=$kept omitted=$om of ${names.size}")
    for ((n, t) <- results if t > 5.0)
      assert(line.contains("\"" + n + "\":"), s"heavy query $n missing")
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
