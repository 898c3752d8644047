package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — match points to the time ranges containing them.
  *
  * A naive `p.ts BETWEEN r.start AND r.end` theta-join gives Catalyst no
  * equi-key: per key it plans a nested-loop over |points|·|ranges|, which
  * inverts at scale. The bucketized formulation restores an equi-join:
  * every range explodes into the fixed-width time buckets it covers, every
  * point maps to its single bucket, and the join runs on
  * (key, bucket) with the exact BETWEEN as a residual filter. Replication
  * factor is ceil(range_span / bucketWidth) + 1 — pick the width near the
  * median range span so most ranges land in O(1) buckets. Each
  * (point, range) pair can only meet in the point's one bucket, so no
  * dedup pass is needed.
  */
object RangeJoin {

  /** Inner-join points to every containing range (bounds inclusive).
    *
    * @param points      (key..., pointTime, payload...) — pointTime must not
    *                    collide with range column names
    * @param ranges      (key..., startCol, endCol, payload...); end >= start
    * @param key         equality key columns present on both sides
    * @param bucketWidthSec bucket width; replication per range is
    *                    span/width + 1
    */
  def pointsInRanges(points: DataFrame, ranges: DataFrame, key: Seq[String],
                     pointTime: String, startCol: String, endCol: String,
                     bucketWidthSec: Long): DataFrame = {
    val w = bucketWidthSec * 1000000L
    def us(c: String) = unix_micros(col(c).cast("timestamp"))
    val p = points.withColumn("__pb", floor(us(pointTime) / w).cast("long"))
    val r = ranges.withColumn("__pb",
      explode(sequence(floor(us(startCol) / w).cast("long"),
        floor(us(endCol) / w).cast("long"))))
    p.join(r, key :+ "__pb")
      .filter(us(pointTime).between(us(startCol), us(endCol)))
      .drop("__pb")
  }

  /** Interval-overlap self-join: all pairs of intervals under the same key
    * whose [start, end] ranges intersect (bounds inclusive) — the third
    * temporal-join shape after as-of (nearest row) and points-in-ranges
    * (containment): "which shipments of this part were in transit at the
    * same time", "which sessions ran concurrently".
    *
    * Same bucketization as pointsInRanges — every interval explodes into
    * the width-`bucketWidth` buckets it covers, candidates meet on
    * (key, bucket) — but a pair of intervals can now share SEVERAL
    * buckets, so instead of a distinct pass (a full extra shuffle over
    * the pair stream) each pair is counted exactly once by keeping it
    * only in the bucket holding max(startA, startB): that bucket is
    * covered by both intervals whenever they overlap, and it is unique.
    * Replication per row is span/width + 1, so pick the width near the
    * median span; the per-bucket pair work is |bucket|² within a key, the
    * flood-vs-skew knob the caller owns (same contract as the banded
    * dedup joins).
    *
    * Columns are plain LONGs in caller units (epoch days, micros, …) —
    * the primitive is unit-agnostic; `overlap` = min(ends) − max(starts)
    * in those units (≥ 0 on any true overlap, since bounds are
    * inclusive). `pairWithin` excludes pairs equal on that column
    * (e.g. same supplier) without a second join pass.
    */
  def intervalOverlapPairs(intervals: DataFrame, key: Seq[String],
                           idCol: String, startCol: String, endCol: String,
                           bucketWidth: Long,
                           excludeEqual: Option[String] = None): DataFrame = {
    val b = bucketWidth
    val withB = intervals.withColumn("__b",
      explode(sequence(floor(col(startCol) / b).cast("long"),
        floor(col(endCol) / b).cast("long"))))
    val a = withB.as("a")
    val r = withB.as("r")
    val joined = a.join(r,
      key.map(k => col(s"a.$k") === col(s"r.$k")).reduce(_ && _) &&
        col("a.__b") === col("r.__b") &&
        col(s"a.$idCol") < col(s"r.$idCol") &&
        col(s"a.$startCol") <= col(s"r.$endCol") &&
        col(s"r.$startCol") <= col(s"a.$endCol") &&
        // count the pair only in max(startA, startB)'s bucket
        floor(greatest(col(s"a.$startCol"), col(s"r.$startCol")) / b)
          .cast("long") === col("a.__b"))
    val excl = excludeEqual.map(c =>
      col(s"a.$c") =!= col(s"r.$c")).getOrElse(lit(true))
    joined.filter(excl)
      .select(key.map(k => col(s"a.$k")) ++ Seq(
        col(s"a.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        (least(col(s"a.$endCol"), col(s"r.$endCol")) -
          greatest(col(s"a.$startCol"), col(s"r.$startCol")))
          .cast("long").as("overlap")): _*)
  }
}
