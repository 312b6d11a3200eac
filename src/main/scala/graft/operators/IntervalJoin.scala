package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: every (point, interval) pair with
  * `start <= point.ts < end` within the same key — the "which window
  * was this event inside" shape (attribution windows, maintenance
  * windows, session membership). Complements [[AsOfJoin]] (latest-
  * preceding, 1:1) with the full 1:N containment semantics.
  *
  * Scale design: Spark plans a raw `p.ts >= i.start AND p.ts < i.end`
  * join as BroadcastNestedLoopJoin (or a cartesian when keyed but
  * skewed) — the O(|P|·|I|) shape that dies at 100 TB. This operator
  * makes it an EQUI-join: time is chopped into fixed-width buckets,
  * each interval is exploded onto every bucket it overlaps
  * (fan-out = ceil(len/width)+1 rows), each point maps to exactly ONE
  * bucket, and the join key becomes (keys…, bucket) with the exact
  * containment predicate as a residual filter. Because a point owns a
  * single bucket, a (point, interval) pair can meet in at most one
  * bucket — no post-join de-duplication is needed and the output
  * multiplicity is exactly the containment multiplicity.
  *
  * Cost = one shuffle of P + one shuffle of I·fanOut on a
  * high-cardinality composite key; width is the dial: ~the typical
  * interval length keeps fan-out at ~2 while keeping each bucket's
  * population joinable. Degenerate intervals (end <= start) match
  * nothing and are dropped before the explode (Spark's `sequence`
  * would otherwise DESCEND for end < start and manufacture buckets).
  */
object IntervalJoin {

  /** @param points      rows with a point timestamp `pointTs`
    * @param intervals   rows with `[startCol, endCol)` bounds; column
    *                    names other than `keys` must not collide with
    *                    `points` (rename before calling)
    * @param keys        equi-key columns present on BOTH sides
    * @param widthMicros bucket width in microseconds (> 0); tune to
    *                    the typical interval length
    * @return inner join: one row per contained (point, interval) pair
    */
  def pointInInterval(points: DataFrame, pointTs: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      keys: Seq[String], widthMicros: Long): DataFrame = {
    require(widthMicros > 0, s"widthMicros must be positive: $widthMicros")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns collide across sides: ${overlap.mkString(", ")}")

    val w = lit(widthMicros)
    val p = points.withColumn("__bucket",
      floor(unix_micros(col(pointTs)) / w))
    // [start, end) overlaps buckets floor(start/w) .. floor((end-1)/w)
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        floor(unix_micros(col(startCol)) / w),
        floor((unix_micros(col(endCol)) - 1) / w))))
    p.join(i, keys :+ "__bucket")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bucket")
  }
}
