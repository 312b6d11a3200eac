package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interpolation / gap-fill for missing time buckets — the one genuinely
  * nontrivial algorithm in the reference's query contract
  * (ref dashboard/src/Models/interpolationType.ts:16: None | Linear |
  * Null | Previous; wired via groupByTimeSettings.ts:17-23).
  *
  * Scale design: the time spine is generated PER KEY ON THE EXECUTORS
  * from each key's own [min,max] bucket range (`sequence` + `explode`) —
  * never a driver-side loop, never one global spine crossed with all
  * keys. The join back to the aggregated buckets is keyed on
  * (key, bucket), the same partitioning the aggregation just produced,
  * and the fill itself is a per-key sort within partitions (window
  * functions over `partitionBy(key)`), so the whole thing is one shuffle.
  */
object GapFill {

  sealed trait Interpolation
  case object FillNull     extends Interpolation
  case object FillPrevious extends Interpolation
  case object FillLinear   extends Interpolation

  /** Densify `df` (one row per (key, bucket) with `valueCol`, possibly
    * sparse) to every `step` bucket between each key's min and max
    * bucket, leaving missing values null.
    *
    * @param step Spark interval literal, e.g. "INTERVAL 1 DAY" — must
    *             match the bucket granularity of `bucketCol`.
    */
  def densify(df: DataFrame, keyCol: String, bucketCol: String,
              step: String): DataFrame = {
    val bounds = df.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("__mn"), max(col(bucketCol)).as("__mx"))
    val spine = bounds.select(
      col(keyCol),
      explode(sequence(col("__mn"), col("__mx"), expr(step))).as(bucketCol))
    spine.join(df, Seq(keyCol, bucketCol), "left")
  }

  /** "Previous" fill: carry the last non-null value forward within each
    * key, ordered by bucket (ref interpolationType.ts:16 Previous).
    */
  def fillPrevious(df: DataFrame, keyCol: String, bucketCol: String,
                   valueCol: String, as: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Linear interpolation between the last non-null value before and the
    * first non-null value after each gap; endpoints beyond the data are
    * extended flat (Previous on the right edge, Next on the left edge).
    * The interpolation weight is computed on epoch-microsecond longs with
    * the exact expression `prev + (next - prev) * (dt / span)` so an
    * oracle can reproduce it bit-for-bit.
    */
  def fillLinear(df: DataFrame, keyCol: String, bucketCol: String,
                 valueCol: String, as: String): DataFrame = {
    val v  = col(valueCol)
    val tu = unix_micros(col(bucketCol))
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(1, Window.unboundedFollowing)
    val prevV = last(v, ignoreNulls = true).over(wPrev)
    val prevT = last(when(v.isNotNull, tu), ignoreNulls = true).over(wPrev)
    val nextV = first(v, ignoreNulls = true).over(wNext)
    val nextT = first(when(v.isNotNull, tu), ignoreNulls = true).over(wNext)
    val frac = (tu - prevT).cast("double") / (nextT - prevT).cast("double")
    df.withColumn(as,
      when(v.isNotNull, v)
        .when(prevV.isNull, nextV)
        .when(nextV.isNull, prevV)
        .otherwise(prevV + (nextV - prevV) * frac))
  }
}
