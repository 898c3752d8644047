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
    val pred = langProfiles.foldRight(lit("??")) { case ((lang, _), els) =>
      when(col(s"s_$lang") === best, lit(lang)).otherwise(els)
    }
    // foldRight gives first-alphabetical-wins because profiles are sorted.
    scored.select((col("doc_id") +:
        langProfiles.map { case (l, _) => col(s"s_$l") }) :+
        pred.as("pred_lang"): _*)
      .orderBy(col("doc_id"))
  }

  /** Document fingerprinting: md5 of the normalized text, plus a rolling
    * shingle fingerprint (min md5 over word 5-grams — stable under content
    * reordering of surrounding docs, position-independent). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val norm = F.normalizeText(lower(col("text")))
    val toks = split(norm, " ")
    val nSh = size(toks) - 4
    val shingles = transform(sequence(lit(1), greatest(nSh, lit(1))),
      i => md5(concat_ws(" ", slice(toks, i, lit(5)))))
    docs.select(
        col("doc_id"),
        md5(norm).as("fp_doc"),
        when(size(toks) >= 5, array_min(shingles))
          .otherwise(md5(norm)).as("fp_shingle"))
      .orderBy(col("doc_id"))
  }
}
