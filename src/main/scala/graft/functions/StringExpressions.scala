package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native string-similarity expressions for fuzzy matching / entity
  * resolution. Same design contract as VectorExpressions: a tight
  * primitive kernel shared by the interpreted and generated paths, with
  * semantics pinned to the DuckDB twin so the harness hash-check holds.
  */
object StringExpressions {

  /** Jaro–Winkler similarity (Winkler 1990), the classic formulation
    * DuckDB's `jaro_winkler_similarity` implements — verified empirically
    * against DuckDB on the edge cases that distinguish the variants:
    *   - either side empty → 0.0 (NOT 1.0 for both-empty);
    *   - match window = max(0, ⌊max(|a|,|b|)/2⌋ − 1) — clamped at zero,
    *     so 2-to-3-char strings only match same-position characters;
    *   - transpositions counted as mismatches between the two matched
    *     subsequences, halved by INTEGER division (an odd mismatch count
    *     rounds t down — 'abcxxxxx' vs 'bcaxxxxx' measures 0.958333 in
    *     DuckDB, the t=1 value, not the classic-half t=1.5 → 0.9375);
    *   - Winkler prefix bonus l·0.1·(1−jaro), prefix capped at 4, applied
    *     only when jaro > 0.7 (the boost threshold — 'abcdefgh' vs
    *     'abcdxxxx' has jaro 2/3 and keeps it, prefix 4 notwithstanding).
    * Operates on UTF-8 BYTES (DuckDB compares bytes too); callers that
    * need codepoint semantics should restrict inputs to ASCII first.
    */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && b(j) == a(i)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var halfT = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - halfT / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxPref = math.min(4, math.min(la, lb))
    while (l < maxPref && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Codegen'd Jaro–Winkler over two string columns. */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.StringExpressions.jaroWinkler($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaroWinkler =
      copy(left = newLeft, right = newRight)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    bridge.column(JaroWinkler(bridge.expression(a), bridge.expression(b)))
}
