package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based batch sessionization: a key's time-ordered rows split into
  * a new session wherever the gap to the previous row EXCEEDS `gap` —
  * the batch twin of Structured Streaming's `session_window` (which the
  * streaming surface already covers), and the standard user-activity /
  * device-uptime shape.
  *
  * Scale design: ONE shuffle on the key, then two window passes inside
  * each partition (lag to mark boundaries, running sum to number them)
  * — cost independent of the gap value and of session count. A hot key
  * serializes its own rows through one task, the same documented
  * trade-off as shard packing; sessions of different keys never
  * interact, so the operator scales with the key count, not the row
  * count per key. WindowExec's per-partition buffer SPILLS to disk, so
  * a degenerate hot key degrades to disk throughput rather than OOM —
  * the envelope that separates this family from in-memory
  * `collect_list` folds (see [[EventAnalytics.funnel]]'s
  * `maxEventsPerEntity` guard for those).
  *
  * Determinism: rows are ordered by (ts, tieBreak…); pass a unique
  * tie-breaker (e.g. the event id) so equal timestamps order — and
  * therefore number sessions — identically on every engine and re-run.
  */
object Sessionize {

  /** Adds `session_seq`: the 1-based session index within the key.
    * A gap of EXACTLY `gapMicros` stays in the same session (strictly-
    * greater starts a new one); the first row of a key always opens
    * session 1.
    */
  def assign(df: DataFrame, keys: Seq[String], tsCol: String,
             tieBreak: Seq[String], gapMicros: Long): DataFrame = {
    require(gapMicros >= 0, s"gapMicros must be non-negative: $gapMicros")
    val order = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val opens = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapMicros, 1L)
      .otherwise(0L)
    df.withColumn("__opens", opens)
      .withColumn("session_seq", sum(col("__opens"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__opens")
  }
}
