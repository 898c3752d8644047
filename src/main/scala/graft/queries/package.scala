package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

package object queries {

  /** Driver contract signature: (session, sfDir) => result. */
  type QFn = (SparkSession, String) => DataFrame

  /** Read one of the driver's parquet tables (TESTDATA.md). The events table
    * carries TIMESTAMP(NANOS) which Spark's µs TimestampType rejects; read
    * nanos as long and floor-convert (integer DIV — ns epoch values overflow
    * double's 2^53, so no float division), matching DuckDB's ns->µs
    * truncation. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("cast(timestamp_micros(ts DIV 1000) as timestamp_ntz)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

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
