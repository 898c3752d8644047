package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.etl.{functions => F}

/** Star-schema builders (SURVEY.md §2.4–2.6 composition): dimension
  * construction with deterministic surrogate keys, the calendar dimension,
  * and broadcast FK lookups with sentinel defaults.
  *
  * Scale notes: dimensions are bounded (they fit an executor) so surrogate
  * keying via a global `row_number()` window (one-partition shuffle of the
  * *dimension only*) is acceptable; the fact side never single-partitions.
  * FK resolution broadcasts the dimension — the fact table never shuffles.
  */
object StarSchema {

  /** Build a dimension: project, distinct, deterministic surrogate key by
    * ordered row_number (reference relies on SQL Server IDENTITY insert
    * order, sync_dimensions_dw.py:32-49; SURVEY §7.3.1). */
  def buildDim(src: DataFrame, cols: Seq[String], orderCol: String,
               keyName: String): DataFrame = {
    val d = src.select(cols.map(col): _*).distinct()
    // Tie-break on every projected column: distinct rows always differ
    // somewhere, so the ordering — and therefore the surrogate key — is
    // total and reproducible even when orderCol alone has duplicates.
    val order = (orderCol +: cols.filterNot(_ == orderCol)).map(col)
    d.withColumn(keyName, row_number().over(Window.orderBy(order: _*)))
      .select((keyName +: cols).map(col): _*)
  }

  /** The 100 TB twin of `buildDim` (SURVEY §7.3.1's documented caveat,
    * made executable): the SAME dense 1..n surrogate keys in the SAME
    * total order, with no global window and no single-partition exchange
    * at any stage — the dimension stays distributed throughout.
    *
    * How: range-repartition the distinct rows by the key order (globally
    * ordered partitions), sort within partitions, then decompose
    * `monotonically_increasing_id` — (partitionId << 33) | ordinal — into
    * its parts. The global rank is the ordinal plus the count of rows in
    * earlier partitions; those counts are one row per partition (a
    * driver probe bounded by the partition count, the A4 class SURVEY
    * §7.3.7 licenses) and ride back as a broadcast map literal.
    *
    * The ranged+sorted layout is MATERIALIZED first: the counts job and
    * the remap job must see identical partition boundaries, and the range
    * partitioner's sampling pass would otherwise be free to re-draw them
    * between jobs. */
  def buildDimDense(src: DataFrame, cols: Seq[String], orderCol: String,
                    keyName: String, partitions: Int = 0): DataFrame = {
    val d = src.select(cols.map(col): _*).distinct()
    val order = (orderCol +: cols.filterNot(_ == orderCol)).map(col)
    val p =
      if (partitions > 0) partitions
      else d.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = graft.ops.Dedup.materialize(
      d.repartitionByRange(p, order: _*).sortWithinPartitions(order: _*)
        .select(col("*"), spark_partition_id().as("__pid"),
          monotonically_increasing_id().as("__mid")))
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init).toMap
    val ordinal = col("__mid") - col("__pid").cast("long") * lit(1L << 33)
    ranged
      .withColumn(keyName,
        (element_at(typedlit(offsets), col("__pid")) + ordinal + 1L).cast("int"))
      .select((keyName +: cols).map(col): _*)
  }

  /** dim_fecha (build_dim_fecha, transform/clean_data.py:17-29 +
    * main.py:160-190): union date columns from several sources, parse,
    * null-drop, distinct, derive key + calendar parts. */
  def buildDimFecha(dateCols: Seq[Column], sources: Seq[DataFrame]): DataFrame = {
    require(dateCols.length == sources.length)
    val frames = sources.zip(dateCols).map { case (df, c) =>
      df.select(c.cast("timestamp").as("fecha"))
    }
    // distinct on the DAY, not the raw timestamp: fecha_key is this dim's
    // key, and intraday inputs ('2025-01-01 09:00' vs '17:00') must not
    // produce two rows with the same key (midnight-aligned inputs are
    // unchanged by the truncation)
    val all = frames.reduce(_.unionByName(_))
      .na.drop(Seq("fecha"))
      .select(to_date(col("fecha")).cast("timestamp").as("fecha"))
      .distinct()
    val withParts = F.dateParts(col("fecha")).foldLeft(
      all.withColumn("fecha_key", F.fechaKey(col("fecha")))
    ) { case (df, (name, c)) => df.withColumn(name, c) }
    withParts.orderBy(col("fecha"))
  }

  /** J2 — generic parameterized key lookup (lookup_key, main.py:310-319):
    * left-join `dim(dimJoin -> dimKey)` onto `fact(leftOn)`, attach `outCol`,
    * default on miss. Dimension broadcast; fact unshuffled.
    *
    * Contract (pandas-merge semantics, like the reference): if the dim's
    * dimJoin -> dimKey mapping is not unique, matching fact rows FAN OUT —
    * the trailing distinct() dedups exact pairs only. Callers own dim-key
    * uniqueness (buildDim's distinct-then-number guarantees it). */
  def lookupKey(fact: DataFrame, dim: DataFrame, dimJoin: String,
                dimKey: String, leftOn: String, outCol: String,
                default: Any): DataFrame = {
    val d = broadcast(
      dim.select(col(dimJoin).as("__gjoin"), col(dimKey).as(outCol)).distinct())
    fact.join(d, fact(leftOn) === d("__gjoin"), "left")
      .drop("__gjoin")
      .withColumn(outCol, coalesce(col(outCol), lit(default)))
  }
}
