package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.etl.{functions => F}
import graft.functions.StringExpressions

/** Fuzzy string matching / entity resolution over a corpus vocabulary.
  *
  * The training-data use case: typo/variant detection in the token
  * vocabulary (OCR noise, spelling variants) — the step before vocabulary
  * normalization or spell-canonicalization. The same blocked-join shape is
  * the standard entity-resolution posture for record linkage.
  *
  * Scale shape: the operator works on the DISTINCT vocabulary, never the
  * corpus token stream — Heaps' law makes |vocab| sublinear in corpus
  * size, and the word census that produces it is a map-side-combined
  * aggregate bounded by vocabulary × partitions. Pair generation is a
  * blocked self-join on (first byte, length) with the cross-length probe
  * folded into the equi-key (each unordered pair generated exactly once),
  * and the similarity threshold rides IN the join condition — only
  * qualifying pairs ever become rows (the sim_cosine_dedup discipline).
  */
object Fuzzy {

  /** Candidate typo/variant pairs in the corpus word vocabulary:
    * ASCII-letter words, blocked by (first char, length), length diff ≤ 1,
    * Jaro–Winkler ≥ `minSim` (computed by the codegen'd native expression,
    * DuckDB-exact — see StringExpressions.JaroWinkler).
    *
    * Emits each unordered pair once: equal-length pairs ordered w1 < w2
    * inside their block; length-(l, l+1) pairs via the right side's
    * probe key at l. Returns (w1, w2, sim, c1, c2) — the corpus counts
    * ride along so a downstream canonicalizer can pick the majority
    * spelling as the survivor. */
  def vocabJaroWinkler(docs: DataFrame, minSim: Double = 0.9): DataFrame = {
    val words = docs
      .select(explode(split(F.normalizeText(lower(col("text"))), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    // Vocabulary is read twice (both join sides); materialize so the
    // corpus-wide census runs once, not twice.
    val vocab = Dedup.materialize(
      words.select(col("w"), col("c"),
        substring(col("w"), 1, 1).as("blk"), length(col("w")).as("len")))
    val left = vocab.select(col("w").as("w1"), col("c").as("c1"),
      col("blk").as("blk1"), col("len").as("len1"))
    val right = vocab.select(col("w").as("w2"), col("c").as("c2"),
      col("blk").as("blk2"), col("len").as("len2"),
      explode(array(col("len"), col("len") - 1)).as("lenkey"))
    val sim = round(StringExpressions.jaroWinkler(col("w1"), col("w2")), 4)
    left.join(right,
        col("blk1") === col("blk2") && col("len1") === col("lenkey") &&
          (col("len1") =!= col("len2") || col("w1") < col("w2")) &&
          sim >= minSim)
      .select(col("w1"), col("w2"), sim.as("sim"), col("c1"), col("c2"))
      .orderBy(col("w1"), col("w2"))
  }
}
