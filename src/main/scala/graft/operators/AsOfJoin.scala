package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the latest right row
  * with `right.ts <= left.ts` within the same key — the trade↔quote
  * enrichment shape (SURVEY.md §2.8; the reference receives this
  * pre-joined from its vendor, ref darkpool_trades/main.py:97-99).
  *
  * Scale design: NOT a range join (which explodes) and NOT a broadcast
  * of one side. Both sides are unioned, shuffled once on the key, and
  * sorted by (ts, side) within partitions; a running `last(ignoreNulls)`
  * window carries the most recent right payload onto each left row.
  * Cost = one shuffle + one sort, independent of time-range width.
  */
object AsOfJoin {

  /** @param left       rows to enrich; must contain `keyCol` and `tsCol`
    * @param right      rows providing the as-of payload
    * @param payloadCols right columns to carry (renamed as given)
    * @return left rows + nullable payload columns (null when no right
    *         row precedes). A right row at exactly left.ts matches
    *         (<= semantics, like DuckDB's ASOF and pandas merge_asof).
    *         When MULTIPLE right rows share one (key, ts) the winner is
    *         engine-defined (same as DuckDB ASOF); de-duplicate the
    *         right side first if that matters.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           payloadCols: Seq[String]): DataFrame = {
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))
    val l = left
      .withColumn("__payload", lit(null).cast(payloadType))
      .withColumn("__side", lit(1))
    val r = right.select(
        col(keyCol), col(tsCol),
        struct(payloadCols.map(c => col(c).as(c)): _*).as("__payload"))
      .withColumn("__side", lit(0))
    // align schemas: right rows carry nulls for the other left columns
    val rAligned = left.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)

    // right rows sort before left rows at equal ts → <= semantics
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(rAligned)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
    val out = filled.filter(col("__side") === 1)
    payloadCols.foldLeft(out)((df, c) =>
        df.withColumn(s"asof_$c", col("__asof").getField(c)))
      .drop("__payload", "__asof", "__side")
  }
}
