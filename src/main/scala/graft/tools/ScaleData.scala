package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale the driver's testdata by an integer factor for LOCAL scale probes
  * (`BENCH_SF1.json`): replicate each table `factor` times with per-replica
  * key offsets so referential integrity holds (replica i's orders reference
  * replica i's customers), and per-replica CONTENT perturbation so the
  * statistical shape the operators key on stays at its natural per-SF rate
  * instead of becoming a degenerate 10x-duplicate corpus:
  *
  *  - documents.text: per-replica letter rotation (a Caesar shift over
  *    [a-z] and [A-Z]). Length-, whitespace-, and punctuation-preserving,
  *    so token counts and quality stats keep their distribution, but
  *    shingle/minhash/simhash spaces are disjoint across replicas — the
  *    dedup rate per replica equals the source rate, it does not grow 10x.
  *  - embeddings.embedding: per-replica circular rotation of the dimension
  *    axis. Norm- and pairwise-distance-preserving WITHIN a replica, while
  *    cross-replica cosines decorrelate — ANN cell sizes grow ~linearly.
  *  - events: user/event ids offset per replica, timestamps kept — 10x the
  *    traffic density over the same window, the realistic growth mode.
  *  - region/nation: dimension tables stay fixed (as in TPC-H, whose
  *    nation table does not grow with SF); offset fact FKs reference them
  *    unchanged.
  *
  * Replica 0 is the source data verbatim. The output directory matches the
  * driver layout (`<out>/<table>.parquet`), with events.ts written as
  * TIMESTAMP(MICROS) timestamp_ntz — the driver's own layout, readable by
  * both `queries.table` and the DuckDB oracle.
  *
  * Usage: runMain graft.tools.ScaleData <srcSfDir> <outDir> [factor=10]
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def rot(s: String, i: Int) = s.drop(i % 26) + s.take(i % 26)

    def keyOffset(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // Per-replica transforms. Key offsets derive from each table's own max
    // so replicas never collide; FK columns shift by the REFERENCED
    // table's offset so joins land inside the same replica.
    def replicate(name: String, df: DataFrame,
                  perReplica: (DataFrame, Int) => DataFrame): Unit = {
      val copies = (0 until factor).map(i => perReplica(df, i))
      val scaled = copies.reduce(_ unionByName _)
      val path = s"$out/$name.parquet"
      scaled.write.mode("overwrite").parquet(path)
      println(s"[scale] $name x$factor -> $path")
    }

    def t(n: String) = graft.queries.table(spark, src, n)

    val custOff = keyOffset(t("customer"), "c_custkey")
    val suppOff = keyOffset(t("supplier"), "s_suppkey")
    val partOff = keyOffset(t("part"), "p_partkey")
    val ordOff = keyOffset(t("orders"), "o_orderkey")
    val evOff = keyOffset(t("events"), "event_id")
    val userOff = keyOffset(t("events"), "user_id")
    val docOff = keyOffset(t("documents"), "doc_id")
    val vecOff = keyOffset(t("embeddings"), "vec_id")

    for (dim <- Seq("region", "nation")) {
      t(dim).write.mode("overwrite").parquet(s"$out/$dim.parquet")
      println(s"[scale] $dim x1 (fixed dimension) -> $out/$dim.parquet")
    }

    replicate("customer", t("customer"), (d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * custOff)))
    replicate("supplier", t("supplier"), (d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * suppOff)))
    replicate("part", t("part"), (d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * partOff)))
    replicate("orders", t("orders"), (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * ordOff))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custOff)))
    replicate("lineitem", t("lineitem"), (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * ordOff))
        .withColumn("l_partkey", col("l_partkey") + lit(i * partOff))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppOff)))
    replicate("events", t("events"), (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * evOff))
        .withColumn("user_id", col("user_id") + lit(i * userOff))
        // TIMESTAMP(MICROS), no tz — matches the driver's own layout, so
        // queries.table's timestamp branch AND the DuckDB oracle both read
        // it directly (the int64-ns layout locked events out of the sf1
        // oracle artifact)
        .withColumn("ts", col("ts").cast("timestamp_ntz")))
    replicate("documents", t("documents"), (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * docOff))
        .withColumn("text",
          translate(col("text"), lower + upper, rot(lower, i) + rot(upper, i))))
    replicate("embeddings", t("embeddings"), (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * vecOff))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else expr(s"transform(sequence(0, size(embedding) - 1), " +
            s"j -> element_at(embedding, ((j + $i) % size(embedding)) + 1))")
            .cast("array<float>")))

    spark.stop()
  }
}
