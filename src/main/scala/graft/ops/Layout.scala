package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file layout — the write-side half of scan pruning.
  *
  * At 100 TB the fastest scan is the file you never open: engines keep
  * per-file min/max footers (parquet row groups, Delta/Iceberg file
  * stats) and prune files whose [min, max] misses the predicate. A
  * layout sorted on ONE column prunes only that column's predicates;
  * interleaving the bits of two columns (Morton/Z-order — the
  * `OPTIMIZE ZORDER BY` layout) makes every file a RECTANGLE in
  * (x, y) space, so min/max pruning works for predicates on EITHER
  * dimension. The reference engine materializes staging tables with
  * index DDL for exactly this reason (sync_dimensions_dw.py's CREATE
  * INDEX after bulk load); Z-order is that idea generalized to the
  * immutable-file world where an index IS the layout.
  *
  * Everything here is integer column arithmetic (shifts/masks folded at
  * codegen), no UDF, no global sort: assigning a file by dropping low
  * z-bits (`z >> cellShift`) IS the z-range clustering — each file is one
  * cell of a 2^(cellShift/2) × 2^(cellShift/2) grid, and the assignment
  * is a pure map, so the only exchange in a layout audit is the per-file
  * rollup. A writer would `repartitionByRange(z)` with the same key. */
object Layout {

  /** Morton/Z-value: interleave the low `bits` bits of x (even positions)
    * and y (odd positions) into one long. 2·bits must stay < 63. */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && 2 * bits < 63, s"z-value width $bits out of range")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** Per-file min/max footer stats over two dimensions: the exact table a
    * format's file-statistics index holds, derived from any file-id
    * assignment column. One shuffle, grouped on the file id. */
  def fileRangeStats(df: DataFrame, fileId: Column,
                     x: Column, y: Column): DataFrame =
    df.groupBy(fileId.as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(x).as("min_x"), max(x).as("max_x"),
        min(y).as("min_y"), max(y).as("max_y"))

  /** Would a scan with `dim BETWEEN lo AND hi` open this file? Classic
    * footer intersection: scan iff [min, max] ∩ [lo, hi] ≠ ∅. */
  def scanned(minCol: Column, maxCol: Column, lo: Long, hi: Long): Column =
    maxCol >= lo && minCol <= hi
}
