package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator from SURVEY.md §2
  * (grouped into packs under graft.queries); `oracleSql` carries the DuckDB
  * twin of each. Keys must match; column names must match (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  private val packs: Seq[Q.QueryPack] = Seq(
    Q.Core,
    Q.Scalars,
    Q.Events,
    Q.TextOps,
    Q.Vectors,
    Q.Etl,
    Q.Analytics
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's only analytic query is the 4-way star join
    * (test.py:14-33) — transposed onto the harness schema. */
  def entry(spark: SparkSession): DataFrame =
    Q.Core.queries("q2_star_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** Java regex (Spark) counts vertical tab U+000B as \s; RE2 (DuckDB) does
    * not. Every oracle's `\s` is rewritten to the explicit Java-equivalent
    * class centrally, so tokenization parity holds on any corpus — not just
    * one that happens to contain no control characters.
    *
    * The rewrite is CLASS-AWARE: a `\s` already inside `[...]` (e.g.
    * `[^A-Za-z0-9\s]`) splices the bare characters — wrapping a bracketed
    * class there would make RE2 read the inner `[` as a literal and
    * silently change what the class matches. Outside a class it emits the
    * bracketed form as before. Bracket state is tracked textually; the only
    * other `[` in oracle SQL is DuckDB list slicing (`toks[i:j]`), which
    * never contains `\s`. */
  private[graft] def javaWhitespace(sql: String): String = {
    val bare = " \\t\\n\\x0b\\f\\r"
    // The textual class tracker cannot see an ESCAPED bracket — `\[` would
    // flip inClass and silently splice `\s` in the wrong form. Enforce the
    // convention instead of silently miscompiling a future oracle.
    require(!sql.contains("\\[") && !sql.contains("\\]"),
      "oracle SQL must not contain escaped brackets (\\[ or \\]) — " +
        "javaWhitespace tracks character-class state textually")
    val out = new StringBuilder(sql.length + 64)
    var inClass = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\\' && i + 1 < sql.length) {
        // consume the whole escape: only \s is rewritten; any other escaped
        // char (incl. \\) passes through without touching class state
        if (sql.charAt(i + 1) == 's') out ++= (if (inClass) bare else s"[$bare]")
        else { out += c; out += sql.charAt(i + 1) }
        i += 2
      } else {
        if (c == '[') inClass = true
        else if (c == ']') inClass = false
        out += c
        i += 1
      }
    }
    out.toString
  }

  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap.view.mapValues(javaWhitespace).toMap
}
