package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

package object queries {

  /** Driver contract signature: (session, sfDir) => result. */
  type QFn = (SparkSession, String) => DataFrame

  /** Read one of the driver's parquet tables (TESTDATA.md). The events
    * table's `ts` physical type has varied across driver generations:
    * TIMESTAMP(NANOS) (which Spark's µs TimestampType rejects — read nanos
    * as long and floor-convert with integer DIV, matching DuckDB's ns->µs
    * truncation) vs plain TIMESTAMP(MICROS). Dispatch on the landed type so
    * either generation normalizes to timestamp_ntz. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw =
      if (name == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = spark.read.parquet(s"$dir/$name.parquet")
        val tsNorm = df.schema("ts").dataType match {
          case LongType => expr("cast(timestamp_micros(ts DIV 1000) as timestamp_ntz)")
          case _        => col("ts").cast(TimestampNTZType)
        }
        df.withColumn("ts", tsNorm)
      } else spark.read.parquet(s"$dir/$name.parquet")
    // The driver writes each table as ONE file with ONE row group, and a
    // row group is parquet's split unit — so every scan arrives as a
    // single partition. For documents/embeddings that means the per-row CPU
    // kernels (regex normalize, md5 shingle hashing, distance merges, dot
    // products) serialize on one core; rebalance them explicitly — exactly
    // what you'd do on a cluster handed a monolithic unsplittable file.
    // Deliberately NOT applied to the row-oriented fact tables: their
    // queries are scan+aggregate shaped, and a blanket round-robin
    // repartition (which shuffles every column — pruning does not push
    // through Repartition) costs more than the lost parallelism. Guarded:
    // a well-laid-out multi-partition input passes through untouched.
    val cpuHeavy = name == "documents" || name == "embeddings"
    val par = spark.sparkContext.defaultParallelism
    if (cpuHeavy && raw.rdd.getNumPartitions < par / 2) raw.repartition(par)
    else raw
  }

  /** Temp staging path keyed by the scale-factor directory, so concurrent
    * SFs never collide — the single convention for every query that stages
    * intermediate files. */
  def tmpStage(dir: String, name: String): String = {
    val sf = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_stage$sf/$name"
  }

  /** Delete every graft staging dir (all SFs). Called at the START of the
    * judged entry points (Verify.main, Bench.main): staged intermediates
    * (cluster tables, minhash signatures, stream micro-batches) survive
    * across processes in java.io.tmpdir, so without this a judged run could
    * silently consume results computed by an OLDER version of the code and
    * report success for code that never executed. Within one process the
    * stage is still computed once and shared — only cross-process reuse is
    * forbidden. */
  def wipeStages(): Unit = {
    import scala.util.Using
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    if (!java.nio.file.Files.isDirectory(tmp)) return
    val roots = Using.resource(java.nio.file.Files.list(tmp)) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("graft_stage")).toList
    }
    roots.foreach { root =>
      Using.resource(java.nio.file.Files.walk(root)) { w =>
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  /** Oracle-deterministic SUM over a double column: cast to decimal so the
    * aggregation is exact (order-independent — partial aggregates across
    * partitions must equal DuckDB's sequential sum bit-for-bit), then round
    * and return double. DuckDB twin:
    * `round(CAST(sum(CAST(x AS DECIMAL(30,10))) AS DOUBLE), s)`.
    * Double->decimal(…,10) rounding cannot tie (10^-11 is not binary-
    * representable), so both engines produce identical decimals per row. */
  def dsum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(DecimalType(30, 10))).cast(DoubleType), scale)

  /** Oracle-deterministic AVG: exact decimal sum, double divide, round.
    * DuckDB twin: `round(CAST(sum(CAST(x AS DECIMAL(30,10))) AS DOUBLE)
    * / count(*), s)`. */
  def davg(c: Column, scale: Int = 6): Column =
    round(sum(c.cast(DecimalType(30, 10))).cast(DoubleType) / count(lit(1)), scale)
}
