package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions._

/** Golden test of the defining computation: keyed 1-minute tumbling
  * window with conditional-sum buckets (ref option_trade_aggs/
  * main.py:85-140,221-225), replaying FIXTURES.md-style option-trade
  * rows against hand-computed windows.
  */
class WindowedAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** osym, ts, qty, premium, side — two symbols, three 1-min windows. */
  private lazy val trades: DataFrame = Seq(
    ("AAPL_C100", ts("2024-01-01 14:30:05"), 10L, 300000.0, "buy"),
    ("AAPL_C100", ts("2024-01-01 14:30:40"), 5L, 50000.0, "sell"),
    ("AAPL_C100", ts("2024-01-01 14:30:59"), 2L, 10000.0, "buy"),
    ("AAPL_C100", ts("2024-01-01 14:31:01"), 1L, 900000.0, "buy"),
    ("TSLA_P200", ts("2024-01-01 14:30:30"), 7L, 260000.0, "sell"),
    ("TSLA_P200", ts("2024-01-01 14:32:10"), 3L, 20000.0, "no_side")
  ).toDF("osym", "ts", "qty", "premium", "side")

  test("1-min keyed tumbling window with whale/retail x side conditional sums (A1+A2+A3)") {
    val whale = $"premium" > 250000.0
    val out = trades
      .groupBy(window($"ts", "1 minute"), $"osym")
      .agg(
        sumWhen(whale && $"side" === "buy", $"qty").as("whale_bought_vol"),
        sumWhen(whale && $"side" === "sell", $"qty").as("whale_sold_vol"),
        sumWhen(!whale && $"side" === "buy", $"qty").as("retail_bought_vol"),
        sumWhen(!whale && $"side" === "sell", $"qty").as("retail_sold_vol"),
        sumWhen($"side" === "no_side", $"premium").as("no_side_prem"),
        count(lit(1)).as("n_trades"))
      .select($"window.start".as("w"), $"osym",
        $"whale_bought_vol", $"whale_sold_vol",
        $"retail_bought_vol", $"retail_sold_vol", $"no_side_prem", $"n_trades")
      .orderBy($"w", $"osym")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6), r.getLong(7)))

    out.toSeq shouldBe Seq(
      // 14:30 window: AAPL trades 1-3 (whale buy 10; retail sell 5, retail buy 2)
      ("2024-01-01 14:30:00.0", "AAPL_C100", 10.0, 0.0, 2.0, 5.0, 0.0, 3L),
      // 14:30 window: TSLA whale sell 7
      ("2024-01-01 14:30:00.0", "TSLA_P200", 0.0, 7.0, 0.0, 0.0, 0.0, 1L),
      // 14:31 window: AAPL whale buy 1 (the 14:31:01 trade)
      ("2024-01-01 14:31:00.0", "AAPL_C100", 1.0, 0.0, 0.0, 0.0, 0.0, 1L),
      // 14:32 window: TSLA no_side premium 20k
      ("2024-01-01 14:32:00.0", "TSLA_P200", 0.0, 0.0, 0.0, 0.0, 20000.0, 1L))
  }

  test("window boundary: a trade at :59.999 lands in the earlier window, :00.000 in the next") {
    val edge = Seq(
      ("X", ts("2024-01-01 00:00:59.999"), 1.0),
      ("X", ts("2024-01-01 00:01:00.000"), 2.0)).toDF("k", "ts", "v")
    val out = edge.groupBy(window($"ts", "1 minute"), $"k")
      .agg(dsum($"v").as("s")).orderBy($"window.start")
      .collect().map(_.getDouble(2)).toSeq
    out shouldBe Seq(1.0, 2.0)
  }
}
