package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`). Built-in higher-order functions only
  * (zip_with + aggregate fold for the dot product) — codegen'd, no UDFs.
  *
  * Two paths (SURVEY.md §2.9):
  *  - brute-force top-k: exact; crossjoin of a *bounded query set* against
  *    the corpus. The query side broadcasts; the corpus never shuffles.
  *    Correctness baseline + the right tool when |queries| is small.
  *  - sign-LSH bucketed top-k: random-hyperplane LSH where the hyperplanes
  *    are the first `signBits` coordinate axes (deterministic, data-
  *    independent). Candidates come only from the query's bucket:
  *    2^signBits buckets shrink each lookup by ~2^signBits at the cost of
  *    recall. The scale path for query sets that are themselves large —
  *    both sides shuffle once on the bucket id, then join per-bucket.
  */
object Similarity {

  /** Sequential-fold cosine similarity between two float-array columns,
    * computed in double. Fold order is left-to-right — bit-reproducible and
    * matching DuckDB's list reduction for oracle checks. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Exact top-k cosine neighbors for each query vector. Similarity is
    * rounded to 6 decimals *before* ranking, with vec_id tie-break, so
    * ranking is deterministic. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb")))
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .join(q, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Axis-sign LSH bucket id: bit i set iff embedding[i] > 0. */
  def signBucket(emb: Column, signBits: Int = 8): Column =
    (0 until signBits).map { i =>
      when(element_at(emb, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** Approximate top-k: candidates restricted to the query's sign bucket.
    * Deterministic (axis hyperplanes), so recall is testable and the same
    * computation is SQL-expressible for the oracle. */
  def signLshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                  signBits: Int = 8): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), signBits).as("bucket"))
    val q = broadcast(queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"),
      signBucket(col("embedding"), signBits).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Embedding-cosine near-dup pairs, blocked by `label` (bounded blocks ->
    * per-block self-join, cost sum(block²) not n²). */
  def cosineDedup(embeddings: DataFrame, threshold: Double): DataFrame = {
    val p = embeddings.select(col("vec_id"), col("embedding"), col("label"))
    val a = p.as("a"); val b = p.as("b")
    a.join(b, col("a.label") === col("b.label") &&
              col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine(col("a.embedding"), col("b.embedding")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
