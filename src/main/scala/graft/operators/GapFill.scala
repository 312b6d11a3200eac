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

  /** Densify `df` (one row per (keys, bucket) with value columns,
    * possibly sparse) to every `step` bucket between each key's min and
    * max bucket, leaving missing values null. With no key columns the
    * spine is the single global [min, max] range (a one-row bounds
    * aggregate — the request's own time span bounds its size).
    *
    * @param step Spark interval literal, e.g. "INTERVAL 1 DAY" — must
    *             match the bucket granularity of `bucketCol`.
    */
  def densify(df: DataFrame, keyCols: Seq[String], bucketCol: String,
              step: String): DataFrame = {
    val bounds =
      if (keyCols.isEmpty)
        df.agg(min(col(bucketCol)).as("__mn"), max(col(bucketCol)).as("__mx"))
      else df.groupBy(keyCols.map(col): _*)
        .agg(min(col(bucketCol)).as("__mn"), max(col(bucketCol)).as("__mx"))
    val spine = bounds.select(
      keyCols.map(col) :+
        explode(sequence(col("__mn"), col("__mx"), expr(step))).as(bucketCol): _*)
    // NULL-SAFE join on the keys: a group whose key is null (e.g. a
    // group-by tag absent from some points) is a real group — a plain
    // equi-join would never match null = null and silently null out
    // every aggregate of that group after densification
    val sp = spine.alias("__sp"); val d = df.alias("__d")
    val joinKeys = keyCols :+ bucketCol
    val cond = joinKeys.map(c => col(s"__sp.$c") <=> col(s"__d.$c"))
      .reduce(_ && _)
    val others = df.columns.filterNot(joinKeys.contains)
    sp.join(d, cond, "left").select(
      joinKeys.map(c => col(s"__sp.$c").as(c)) ++
        others.map(c => col(s"__d.$c").as(c)): _*)
  }

  def densify(df: DataFrame, keyCol: String, bucketCol: String,
              step: String): DataFrame =
    densify(df, Seq(keyCol), bucketCol, step)

  /** "Previous" fill: carry the last non-null value forward within each
    * key, ordered by bucket (ref interpolationType.ts:16 Previous).
    */
  def fillPrevious(df: DataFrame, keyCols: Seq[String], bucketCol: String,
                   valueCol: String, as: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(col(valueCol), ignoreNulls = true).over(w))
  }

  def fillPrevious(df: DataFrame, keyCol: String, bucketCol: String,
                   valueCol: String, as: String): DataFrame =
    fillPrevious(df, Seq(keyCol), bucketCol, valueCol, as)

  /** Linear interpolation between the last non-null value before and the
    * first non-null value after each gap; endpoints beyond the data are
    * extended flat (Previous on the right edge, Next on the left edge).
    * The interpolation weight is computed on epoch-microsecond longs with
    * the exact expression `prev + (next - prev) * (dt / span)` so an
    * oracle can reproduce it bit-for-bit.
    */
  def fillLinear(df: DataFrame, keyCols: Seq[String], bucketCol: String,
                 valueCol: String, as: String): DataFrame = {
    val v  = col(valueCol)
    val tu = unix_micros(col(bucketCol))
    val wPrev = Window.partitionBy(keyCols.map(col): _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(keyCols.map(col): _*).orderBy(col(bucketCol))
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

  def fillLinear(df: DataFrame, keyCol: String, bucketCol: String,
                 valueCol: String, as: String): DataFrame =
    fillLinear(df, Seq(keyCol), bucketCol, valueCol, as)

  /** The whole interpolation stage as one call — the shape
    * `groupByTimeSettings` wires into a query (ref
    * groupByTimeSettings.ts:17-23, interpolationType.ts:16): densify
    * to the bucket grid, then fill every listed value column IN PLACE
    * (column set and order unchanged, so interpolation composes
    * transparently inside a planner). `FillNull` is densify alone
    * (generated rows carry nulls); non-listed columns stay null on
    * generated rows.
    *
    * Type caveat, stated rather than hidden: `FillLinear` widens
    * integer value columns to double — a linear interpolant between
    * integer observations is fractional (interpolating a count of 2
    * and 5 yields 3.5), and truncating it back would silently corrupt
    * the interpolated values. `FillNull`/`FillPrevious` preserve the
    * original types exactly.
    */
  def interpolate(df: DataFrame, keyCols: Seq[String], bucketCol: String,
                  step: String, valueCols: Seq[String],
                  mode: Interpolation): DataFrame = {
    val dense = densify(df, keyCols, bucketCol, step)
    val filled = mode match {
      case FillNull => dense
      case FillPrevious => valueCols.foldLeft(dense)((d, c) =>
        fillPrevious(d, keyCols, bucketCol, c, s"__f_$c"))
      case FillLinear => valueCols.foldLeft(dense)((d, c) =>
        fillLinear(d, keyCols, bucketCol, c, s"__f_$c"))
    }
    // restore the caller's column ORDER too (densify moves the join
    // keys first) — in-place means schema-identical
    if (mode == FillNull) dense.select(df.columns.map(col): _*)
    else filled.select(df.columns.map(c =>
      if (valueCols.contains(c)) col(s"__f_$c").as(c) else col(c)): _*)
  }
}
