package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

  /** Distinct word-n-gram Bloom probe folded WITHIN one row: slide the
    * n-token window over the token array, hash each gram through the
    * library's seeded md5 family (identical bytes to
    * seededHash(seed, concat_ws(" ", slice(toks, i, n))) — the
    * "seed:tok tok tok tok" rendering), de-duplicate, and test each
    * distinct hash's three Kirsch-Mitzenmacher bit positions against the
    * broadcast bitmap — one compiled loop per document instead of a
    * sequence → transform → array_distinct → filter higher-order chain
    * whose lambdas run interpreted per gram (the r14 index-ingest lesson:
    * whole-corpus in-row compute must not ride HOFs). Returns
    * (n_distinct_grams << 32) | n_hits packed in one long (documents are
    * < 2³² tokens by any contract in this library). Caller guarantees
    * toks.length >= n. */
  def bloomGramProbe(toks: ArrayData, bitmap: ArrayData, n: Int,
                     mBits: Int, seed: Int): Long = {
    val prefix = UTF8String.fromString(s"$seed:")
    val space = UTF8String.fromString(" ")
    val total = toks.numElements() - n + 1
    val m = mBits.toLong
    val seen = new java.util.HashSet[java.lang.Long]()
    var hits = 0L
    val parts = new Array[UTF8String](2 * n)
    parts(0) = prefix
    var i = 0
    while (i < total) {
      var k = 0
      var p = 1
      while (k < n) {
        if (k > 0) { parts(p) = space; p += 1 }
        parts(p) = toks.getUTF8String(i + k)
        p += 1
        k += 1
      }
      val gh = VectorExpressions.md5Long60(UTF8String.concat(parts: _*))
      if (seen.add(gh)) {
        def bit(pos: Long): Boolean =
          (bitmap.getLong((pos >>> 6).toInt) &
            (1L << (pos % 64).toInt)) != 0L
        if (bit(gh % m) && bit((gh >>> 16) % m) && bit((gh >>> 32) % m))
          hits += 1L
      }
      i += 1
    }
    (seen.size.toLong << 32) | hits
  }

  /** Codegen'd in-row Bloom gram probe (see [[bloomGramProbe]]). */
  case class BloomGramProbePacked(left: Expression, right: Expression,
                                  n: Int, mBits: Int, seed: Int)
      extends BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def prettyName: String = "bloom_gram_probe"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      bloomGramProbe(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        n, mBits, seed)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.StringExpressions.bloomGramProbe($a, $b, $n, $mBits, $seed)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BloomGramProbePacked =
      copy(left = newLeft, right = newRight)
  }

  def bloomGramProbePacked(toks: Column, bitmap: Column, n: Int, mBits: Int,
                           seed: Int): Column =
    bridge.column(BloomGramProbePacked(bridge.expression(toks),
      bridge.expression(bitmap), n, mBits, seed))

  /** Block-mean perceptual hash folded WITHIN one row: the EXACT
    * arithmetic of Multimodal.phashTable's explode + two groupBys —
    * char k of L maps to block (k·bits) DIV L, bit set iff the block's
    * code-point sum exceeds its share of the total by integer
    * cross-multiplication (s·L > total·n), bits packed into bits/16
    * little-endian 16-bit subindex words — as ONE compiled loop per
    * document (FunctionsSpec pins word-for-word equality on the real
    * corpus). This is what lets a STREAMING ingest gate hash arriving
    * media map-only: the batch build's per-character explode is a
    * shuffle-backed aggregation, which in a stream would be a stateful
    * operator; in-row it is zero-state per arrival. Empty text returns
    * all-zero words (the batch build drops empty docs before this ever
    * matters — callers filter length > 0 to match). */
  def phashWords(text: UTF8String, bits: Int): ArrayData = {
    val s = text.toString
    val nWords = bits / 16
    val out = new Array[Long](nWords)
    var n = 0
    var i = 0
    while (i < s.length) { n += 1; i += Character.charCount(s.codePointAt(i)) }
    if (n > 0) {
      val sums = new Array[Long](bits)
      val cnts = new Array[Long](bits)
      var total = 0L
      var p = 0L
      i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val k = (p * bits / n).toInt
        sums(k) += cp; cnts(k) += 1; total += cp
        p += 1; i += Character.charCount(cp)
      }
      var k = 0
      while (k < bits) {
        if (sums(k) * n > total * cnts(k)) out(k >> 4) |= 1L << (k & 15)
        k += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Codegen'd in-row perceptual hash (see [[phashWords]]). */
  case class PhashWords(child: Expression, bits: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false)
    override def prettyName: String = "phash_words"
    override protected def nullSafeEval(t: Any): Any =
      phashWords(t.asInstanceOf[UTF8String], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        t => s"graft.functions.StringExpressions.phashWords($t, $bits)")
    override protected def withNewChildInternal(
        newChild: Expression): PhashWords = copy(child = newChild)
  }

  def phashWords(text: Column, bits: Int): Column =
    bridge.column(PhashWords(bridge.expression(text), bits))
}
