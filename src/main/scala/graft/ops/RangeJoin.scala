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
}
