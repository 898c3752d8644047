package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.etl.{functions => F}

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting. All
  * pure column expressions (codegen'd, no UDFs) — they scale linearly with
  * no shuffle at all; every operator is a map over the documents scan.
  *
  * The reference stubs its NLP column (`Sentimiento = ""`, main.py:392,
  * "pendiente de análisis NLP futuro" README.md:62) — this is that surface,
  * made real.
  */
object TextAnalysis {

  /** Whitespace tokens of the raw text. */
  def tokens(c: Column): Column = split(c, "\\s+")

  /** Token counting: whitespace tokenization + a BPE-ish regex segmentation
    * (letter runs / digit runs / single other chars). */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("len"),
      size(tokens(col("text"))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")
        .as("bpe_tokens"))
      .orderBy(col("doc_id"))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** TF-IDF: top-k terms per document by
    * (tc/n_terms) · (ln((N+1)/(df+1)) + 1), rounded to 6 dp BEFORE ranking
    * so the ordering is engine-stable. Two aggregations over the exploded
    * term list (both partial/map-side) + one broadcast of the one-row corpus
    * count; the per-doc ranking window partitions on doc_id with at most
    * |distinct terms per doc| rows — bounded by document length, safe at any
    * corpus size. */
  def tfIdf(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs.select(col("doc_id"),
      explode(split(F.normalizeText(lower(col("text"))), " ")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tc"))
    val tot = terms.groupBy(col("doc_id")).agg(count(lit(1)).as("n_terms"))
    val docFreq = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(tot, "doc_id").join(docFreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(
        (col("tc").cast("double") / col("n_terms")) *
          (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1.0), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Quality scoring: length, mean token length, stopword ratio, alpha
    * ratio, composite score. Ratios are single double divisions (exact
    * cross-engine). */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopHits = size(filter(toks, t => t.isin(stopwords: _*))).cast("double")
    val alpha = size(regexp_extract_all(col("text"), lit("[A-Za-z]"), lit(0)))
      .cast("double")
    docs.select(
        col("doc_id"),
        length(col("text")).cast("long").as("len"),
        size(toks).cast("long").as("n_tokens"),
        round(length(col("text")).cast("double") / nTok, 6).as("mean_tok_len"),
        round(stopHits / nTok, 6).as("stopword_ratio"),
        round(alpha / length(col("text")).cast("double"), 6).as("alpha_ratio"))
      // /100 (not a power of two): n/200 is a 3-digit decimal, so the
      // composite never lands on an exact .5 ulp at the 6th decimal where
      // Spark's and DuckDB's double-rounding could disagree.
      .withColumn("quality",
        round(least(col("stopword_ratio") * 4.0, lit(1.0)) * 0.5 +
              least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.5, 6))
      .orderBy(col("doc_id"))
  }

  /** Repetition signals over word n-grams — the Gopher/C4-style boilerplate
    * detectors a corpus-curation pass cuts on: `top_gram_share` (share of
    * the single most repeated n-gram) and `rep_ratio` (fraction of n-gram
    * slots occupied by repeats). Machine-generated/boilerplate text scores
    * high on both; clean prose stays low.
    *
    * Shape at scale: one explode + two partial-aggregated groupBys keyed by
    * doc_id (the second over the per-(doc, gram) counts) and a left join
    * back to the doc list for the <n-token degenerate rows — cost is linear
    * in corpus tokens, shuffles bounded by per-doc distinct-gram counts.
    * Ratios divide two exact integers and round once, so the values are
    * engine-exact. */
  def repetitionStats(docs: DataFrame, n: Int = 2): DataFrame = {
    val toks = split(F.normalizeText(lower(col("text"))), " ")
    val grams = docs.filter(size(toks) >= n)
      .select(col("doc_id"), toks.as("toks"),
        explode(sequence(lit(1), size(toks) - (n - 1))).as("i"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("toks"), col("i"), lit(n))).as("g"))
    val perGram = grams.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
    val stats = perGram.groupBy(col("doc_id")).agg(
      sum(col("c")).as("total_grams"),
      count(lit(1)).as("distinct_grams"),
      max(col("c")).as("top_gram_count"))
    docs.select(col("doc_id")).join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("total_grams"), lit(0L)).as("total_grams"),
        coalesce(col("distinct_grams"), lit(0L)).as("distinct_grams"),
        coalesce(col("top_gram_count"), lit(0L)).as("top_gram_count"),
        coalesce(round(col("top_gram_count").cast("double")
          / col("total_grams"), 6), lit(0.0)).as("top_gram_share"),
        coalesce(round(lit(1.0) - col("distinct_grams").cast("double")
          / col("total_grams"), 6), lit(0.0)).as("rep_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Language profiles for the n-gram/marker-word heuristic. Kept tiny and
    * deterministic; real pipelines would load larger profiles the same way. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "不", "了", "在"))

  /** Language ID: marker-word hit count per language, argmax with
    * alphabetical tie-break (deterministic). */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scored = langProfiles.foldLeft(docs.select(col("doc_id"), col("text"))) {
      case (df, (lang, markers)) =>
        df.withColumn(s"s_$lang",
          size(filter(toks, t => t.isin(markers: _*))).cast("long"))
    }
    val best = greatest(langProfiles.map { case (l, _) => col(s"s_$l") }: _*)
    val argmax = langProfiles.foldRight(lit("??")) { case ((lang, _), els) =>
      when(col(s"s_$lang") === best, lit(lang)).otherwise(els)
    }
    // zero hits in every profile -> unknown, not first-alphabetical
    val pred = when(best === 0, lit("??")).otherwise(argmax)
    // foldRight gives first-alphabetical-wins (on real ties) because
    // profiles are sorted.
    scored.select((col("doc_id") +:
        langProfiles.map { case (l, _) => col(s"s_$l") }) :+
        pred.as("pred_lang"): _*)
      .orderBy(col("doc_id"))
  }

  /** Unigram language-model score — the CCNet-style quality signal: the
    * average negative log-likelihood of each document's tokens under the
    * corpus's own unigram distribution. High avg_nll = the document is
    * "surprising" relative to the corpus (OCR noise, gibberish); very low
    * = degenerate/boilerplate. A production pipeline scores against a
    * trusted reference corpus (e.g. Wikipedia) and cuts both tails.
    *
    * Per-term −ln p terms are summed under the dsum decimal discipline
    * (order-independent, so partial aggregation can't change the value);
    * ln itself is IEEE double in both engines, with any 1-ulp divergence
    * quantized away by the 10-dp decimal cast (same contract as tx_tfidf).
    *
    * Shape at scale: explode + partial-agg term counts (shuffle bounded by
    * the distinct vocabulary, not corpus tokens), broadcast of the one-row
    * total, a term-keyed equi-join, one partial-agg rollup per doc. */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val terms = docs.select(col("doc_id"),
      explode(split(F.normalizeText(lower(col("text"))), " ")).as("term"))
    val freq = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val tot = freq.agg(sum(col("c")).as("n_total"))
    val nll = -log(col("c").cast("double") / col("n_total"))
    terms.join(freq, "term").crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(nll.cast(DecimalType(30, 10))).cast("double") /
          count(lit(1)), 6).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** Per-source curation profile — the dashboard cut a multi-source corpus
    * pipeline reviews before changing its sampling mix: document count,
    * token volume, quality aggregates (decimal-exact mean, so the value is
    * independent of partial-aggregation order), and each source's share of
    * the corpus.
    *
    * Shape at scale: the per-doc quality pass is map-only; the profile is
    * one partial-aggregated groupBy over |sources| keys plus a broadcast of
    * the one-row corpus count. The doc_id join between quality and source
    * disappears on a real deployment (quality is computed with source in
    * flight); it exists here only because qualityScore's projection is
    * pinned by its own oracle. */
  def sourceProfile(docs: DataFrame): DataFrame = {
    import graft.queries.davg
    val q = qualityScore(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val tot = docs.agg(count(lit(1)).as("n_total"))
    q.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        davg(col("quality"), 6).as("avg_quality"),
        min(col("quality")).as("min_quality"),
        max(col("quality")).as("max_quality"))
      .crossJoin(broadcast(tot))
      .withColumn("corpus_share",
        round(col("n_docs").cast("double") / col("n_total"), 6))
      .drop("n_total")
      .orderBy(col("source"))
  }

  /** PII patterns, deliberately conservative: pure-ASCII classes, bounded
    * quantifiers, no backreferences/lookaround — the subset where Java's
    * regex (Spark) and RE2 (DuckDB, Go tooling) agree match-for-match, so
    * the scrub is reproducible across engines. No `\b`/`\d` shorthands:
    * explicit classes leave nothing to dialect defaults. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+[0-9][0-9-]{6,}[0-9]"

  /** PII scrub — the redaction pass a training corpus needs before anything
    * ships: emails, IPv4 literals, and international-format phone numbers
    * are replaced with typed placeholder tokens, with per-document match
    * counts so curation can drop PII-dense documents outright.
    *
    * Counts are independent leftmost matches of each pattern against the
    * RAW text; the scrub then applies email → IP → phone sequentially (an
    * email is scrubbed before its digits can look like anything else).
    * Emitted as counts + md5 of the scrubbed text + the length delta —
    * everything needed to verify the scrub without materializing scrubbed
    * text in the result. Map-only (regex per row, no shuffle): linear scan
    * at any corpus size, stays inside whole-stage codegen. */
  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val raw = col(textCol)
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(raw, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>")
    docs.select(
        col("doc_id"),
        size(regexp_extract_all(raw, lit(EmailRe), lit(0))).cast("long")
          .as("n_emails"),
        size(regexp_extract_all(raw, lit(Ipv4Re), lit(0))).cast("long")
          .as("n_ips"),
        size(regexp_extract_all(raw, lit(PhoneRe), lit(0))).cast("long")
          .as("n_phones"),
        md5(scrubbed).as("scrub_fp"),
        (length(raw) - length(scrubbed)).cast("long").as("len_delta"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style rule gate — the multi-rule document filter (Rae et al.,
    * "Scaling Language Models: Methods, Analysis & Insights from Training
    * Gopher", appendix A1.1) re-expressed with INTEGER-exact thresholds so
    * no engine can disagree on a boundary document:
    *   r_tokens   — token count within [minTokens, maxTokens]
    *   r_word_len — mean token length in [3, 10] chars,
    *                tested as 3·n ≤ Σlen(tok) ≤ 10·n (no division)
    *   r_alpha    — ≥ 80% of tokens contain a letter: 5·n_alpha ≥ 4·n
    *   r_symbol   — symbol chars ≤ 10% of text: 10·n_sym ≤ len(text)
    *   r_stop     — ≥ 2 distinct stopwords present
    * `keep` is the conjunction; the per-rule booleans are emitted so
    * curation can see WHY a document was cut, not just that it was.
    * Map-only (pure column expressions): linear scan, zero shuffle. */
  def gopherRules(docs: DataFrame, minTokens: Int = 50,
                  maxTokens: Int = 100000): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val sumTokLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val nAlphaTok = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val nSym = size(regexp_extract_all(col("text"),
      lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long")
    val nStop = size(array_intersect(toks, typedlit(stopwords))).cast("long")
    docs.select(
        col("doc_id"), nTok.as("n_tokens"),
        (nTok >= minTokens && nTok <= maxTokens).as("r_tokens"),
        (sumTokLen >= nTok * 3 && sumTokLen <= nTok * 10).as("r_word_len"),
        (nAlphaTok * 5 >= nTok * 4).as("r_alpha"),
        (nSym * 10 <= length(col("text")).cast("long")).as("r_symbol"),
        (nStop >= 2).as("r_stop"))
      .withColumn("keep",
        col("r_tokens") && col("r_word_len") && col("r_alpha") &&
          col("r_symbol") && col("r_stop"))
      .orderBy(col("doc_id"))
  }

  /** Bigram language-model score — unigramLogProb's sharper sibling: the
    * average −ln P(wᵢ | wᵢ₋₁) with P = c(wᵢ₋₁wᵢ)/c(wᵢ₋₁·), both counts from
    * the corpus's own bigram table. Word-salad text that fools a unigram
    * model (common words, impossible order) scores high here. Documents
    * shorter than 2 tokens carry no bigram and are excluded.
    *
    * Same determinism contract as unigramLogProb: per-bigram −ln p cast to
    * DECIMAL(30,10) before the order-independent sum, so partial
    * aggregation cannot change the value and a 1-ulp ln divergence
    * quantizes away.
    *
    * Shape at scale: one explode into (doc, w₁, w₂); bigram counts and
    * their per-prefix rollup are partial-aggregated (shuffles bounded by
    * the bigram vocabulary, not corpus tokens). The per-prefix totals are
    * folded into the bigram table FIRST (a vocab-sized ⋈ vocab-sized join
    * — the w₁-keyed stream there is bounded by the vocabulary, so a hot
    * prefix like "the" skews a vocab row set, not the corpus), and the
    * pair stream then meets ONE score table keyed on the full bigram —
    * well-hashed keys, a single big-stream join instead of two, and no
    * corpus-sized stream ever shuffles on the skewed prefix alone. */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val toks = split(F.normalizeText(lower(col("text"))), " ")
    val pairs = docs.filter(size(toks) >= 2)
      .select(col("doc_id"), toks.as("toks"),
        explode(sequence(lit(1), size(toks) - 1)).as("i"))
      .select(col("doc_id"),
        element_at(col("toks"), col("i")).as("w1"),
        element_at(col("toks"), col("i") + 1).as("w2"))
    // Materialize the vocab-sized bigram table ONCE: ctx and the score
    // join both derive from it, and without the barrier each derivation
    // re-runs the corpus explode + count (Catalyst doesn't share
    // subtrees across join branches) — three corpus passes instead of
    // two. The checkpoint is vocabulary-sized, never corpus-sized.
    val bg = Dedup.materialize(
      pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb")))
    // context totals roll up from the bigram counts (far fewer rows than
    // re-counting the pair stream)
    val ctx = bg.groupBy(col("w1")).agg(sum(col("cb")).as("cp"))
    val scores = bg.join(ctx, Seq("w1"))
      .select(col("w1"), col("w2"),
        (-log(col("cb").cast("double") / col("cp"))).as("nll"))
    pairs.join(scores, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll").cast(DecimalType(30, 10))).cast("double") /
          count(lit(1)), 6).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprinting: md5 of the normalized text, plus a rolling
    * shingle fingerprint (min md5 over word 5-grams — stable under content
    * reordering of surrounding docs, position-independent).
    *
    * Shingles are generated by explode + min-aggregate rather than a
    * `transform(sequence(...))` lambda: the higher-order function evaluates
    * md5 per element in the interpreter, while the exploded form keeps
    * slice/concat/md5 inside whole-stage codegen with map-side partial
    * aggregation (the shuffle carries one (doc_id, min) row per partition). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val norm = F.normalizeText(lower(col("text")))
    val base = docs.select(col("doc_id"), md5(norm).as("fp_doc"),
      split(norm, " ").as("toks"))
    val shingleMin = base
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 4)).as("i"))
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(col("toks"), col("i"), lit(5)))).as("sh"))
      .groupBy(col("doc_id")).agg(min(col("sh")).as("fp_sh"))
    base.join(shingleMin, Seq("doc_id"), "left")
      .select(col("doc_id"), col("fp_doc"),
        coalesce(col("fp_sh"), col("fp_doc")).as("fp_shingle"))
      .orderBy(col("doc_id"))
  }

  /** Per-language top-N bigram frequency table — the phrase census a
    * tokenizer build or stopword audit starts from. One corpus explode
    * into (lang, bigram) collapses map-side into the vocab-sized count
    * table; the top-N cut runs in TWO phases so no task ever sorts a whole
    * language's vocabulary: phase 1 ranks within (lang, bigram-hash slice)
    * — 64 slices × |langs| partitions sort vocab/64 rows each — and keeps
    * each slice's local top-N, a provable superset of the global top-N
    * (dropping a row ranked > N inside its slice cannot evict a global
    * top-N row under the same (n desc, bigram) order); phase 2 ranks the
    * ≤ 64·N survivors per language. Without the pre-cut the final window
    * partitions by lang ALONE — ~10 single-threaded sorts of the full
    * vocabulary, measured 8× on 10× data at sf1 as the vocabulary grew
    * linearly. Tie-break on the bigram string (binary UTF-8 order in both
    * engines) keeps both phases total-order deterministic. */
  def ngramFreq(docs: DataFrame, topN: Int = 10, slices: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(F.normalizeText(lower(col("text"))), " ")
    val pairs = docs.filter(size(toks) >= 2)
      .select(col("lang"), toks.as("toks"),
        explode(sequence(lit(1), size(toks) - 1)).as("i"))
      .select(col("lang"),
        concat(element_at(col("toks"), col("i")), lit(" "),
          element_at(col("toks"), col("i") + 1)).as("bigram"))
    val counts = pairs.groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
    val slice = pmod(xxhash64(col("bigram")), lit(slices.toLong))
    val wLocal = Window.partitionBy(col("lang"), slice)
      .orderBy(col("n").desc, col("bigram"))
    val pre = counts
      .withColumn("lr", row_number().over(wLocal))
      .filter(col("lr") <= topN)
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("bigram"))
    pre.select(col("lang"), col("bigram"), col("n"),
        row_number().over(w).cast("long").as("rank"))
      .filter(col("rank") <= topN)
      .orderBy(col("lang"), col("rank"))
  }
}
