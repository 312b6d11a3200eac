package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** The reference's core output: the 1-minute per-option-symbol
  * aggregation with the full 24-measure schema — {whale_ (premium >
  * 250k), retail} × {bought, sold, no_side} × {put, call} × {_vol sum
  * of qty, _prem sum of premium} plus `count` and the passthrough
  * dimensions (ref option_trade_aggs/main.py:85-188 reducer branches,
  * option_trade_aggs/README.md:1-69 prose schema; whale threshold
  * main.py:99).
  *
  * One `groupBy(window, osym)` with 24 codegen'd conditional sums —
  * the partial+final hash aggregate shape that scales (map-side
  * combine, one shuffle keyed by (window, osym), exactly the Kafka
  * key-partitioning the reference relies on).
  */
object OptionAgg {

  private val sideWord = Map("buy" -> "bought", "sell" -> "sold",
    "no_side" -> "no_side")

  /** Measure columns in the reference's naming:
    * [whale_]{bought|sold|no_side}_{put|call}_{vol|prem}.
    */
  def measures(whaleThreshold: Double = 250000.0): Seq[Column] = {
    val whale = col("premium") > whaleThreshold
    for {
      w <- Seq(true, false)
      side <- Seq("buy", "sell", "no_side")
      otype <- Seq("put", "call")
      m <- {
        val cond = (if (w) whale else !whale) &&
          col("side") === side && col("otype") === otype
        val prefix = (if (w) "whale_" else "") + sideWord(side) + s"_$otype"
        Seq(
          sumWhen(cond, col("qty").cast("double")).cast("long").as(s"${prefix}_vol"),
          sumWhen(cond, col("premium")).as(s"${prefix}_prem"))
      }
    } yield m
  }

  /** Full aggregation over canonical option-trade rows
    * ([[graft.sources.Schemas.optionTrade]] shape with a TimestampType
    * `ts`). Passthrough dims are constant per symbol; `min` keeps them
    * deterministic under any partitioning (the reference copies them
    * from the last record — main.py:155-187).
    */
  def aggregate(trades: DataFrame, windowSize: String = "1 minute",
                whaleThreshold: Double = 250000.0): DataFrame = {
    val aggs =
      count(lit(1)).as("count") +:
      (measures(whaleThreshold) ++ Seq(
        min(col("usym")).as("usym"),
        min(col("strike")).as("strike"),
        min(col("expiration")).as("expiry"),
        min(col("otype")).as("otype")))
    val agged = trades
      .groupBy(window(col("ts"), windowSize), col("osym"))
      .agg(aggs.head, aggs.tail: _*)
    agged.select(
      unix_millis(col("window.start")).as("start") +:
        unix_millis(col("window.end")).as("end") +:
        agged.columns.filterNot(_ == "window").map(col).toSeq: _*)
  }
}
