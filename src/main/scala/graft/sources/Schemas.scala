package graft.sources

import org.apache.spark.sql.types._

/** Declared `StructType` schemas for every topic the reference
  * produces/consumes (FIXTURES.md §1-6). These are the schema-on-read
  * contracts for `from_json` (SURVEY.md §1.4: the reference's implicit
  * JSON shapes made explicit) — the reference enforces shape only in
  * mapping code (ref option_trades/utils.py:111-145,
  * option_trade_aggs/main.py:203-214).
  */
object Schemas {

  /** Vendor option-trade record AFTER map_fields canonicalization
    * (ref option_trades/utils.py:111-145).
    */
  val optionTrade: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("ts", LongType),             // epoch ms
    StructField("osym", StringType),
    StructField("usym", StringType),
    StructField("spot", DoubleType),
    StructField("strike", DoubleType),
    StructField("expiration", StringType),   // ISO date
    StructField("dtx", IntegerType),
    StructField("otype", StringType),        // call | put
    StructField("qty", LongType),
    StructField("price", DoubleType),
    StructField("premium", DoubleType),
    StructField("side", StringType),
    StructField("xchg", StringType),
    StructField("cond", StringType),
    StructField("iv", DoubleType),
    StructField("oi", LongType),
    StructField("bid", DoubleType),
    StructField("ask", DoubleType),
    StructField("theo", DoubleType),
    StructField("delta", DoubleType),
    StructField("gamma", DoubleType),
    StructField("vega", DoubleType),
    StructField("theta", DoubleType),
    StructField("rho", DoubleType),
    StructField("long_vol", LongType),
    StructField("short_vol", LongType),
    StructField("other_vol", LongType),
    StructField("mid_vol", LongType),
    StructField("leg_vol", LongType),
    StructField("stock_vol", LongType),
    StructField("vol", LongType),
    StructField("tags", ArrayType(StringType))))

  /** RAW vendor field names BEFORE canonicalization — the left side of
    * the P1 `map_fields` projection (ref option_trades/utils.py:111-145:
    * option_symbol→osym, underlying_symbol→usym, executed_at→ts, ...).
    */
  val optionTradeVendor: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("executed_at", LongType),
    StructField("option_symbol", StringType),
    StructField("underlying_symbol", StringType),
    StructField("underlying_price", StringType), // vendor sends strings
    StructField("strike", StringType),
    StructField("expiry", StringType),
    StructField("option_type", StringType),
    StructField("size", StringType),
    StructField("price", StringType),
    StructField("premium", StringType),
    StructField("exchange", StringType),
    StructField("condition", StringType),
    StructField("implied_volatility", StringType),
    StructField("open_interest", StringType),
    StructField("nbbo_bid", StringType),
    StructField("nbbo_ask", StringType),
    StructField("theo_price", StringType),
    StructField("delta", StringType),
    StructField("gamma", StringType),
    StructField("vega", StringType),
    StructField("theta", StringType),
    StructField("rho", StringType),
    StructField("report_flags", ArrayType(StringType)),
    StructField("tags", ArrayType(StringType))))

  /** Polygon second-bar (ref equity_quotes/main.py:52-75). */
  val equityBar: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("event", StringType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("vwap", DoubleType),
    StructField("bar_volume", LongType),
    StructField("num_of_trades", LongType),
    StructField("session_volume", LongType),
    StructField("timestamp", LongType)))

  /** Darkpool trade with Decimal-as-string prices
    * (ref darkpool_trades/main.py:19-39,119-133).
    */
  val darkpoolTrade: StructType = StructType(Seq(
    StructField("ts", LongType),
    StructField("symbol", StringType),
    StructField("bid", StringType),
    StructField("ask", StringType),
    StructField("price", StringType),
    StructField("value", StringType),
    StructField("bid_sz", IntegerType),
    StructField("ask_sz", IntegerType),
    StructField("qty", IntegerType),
    StructField("side", StringType),
    StructField("bull_bear", FloatType),
    StructField("venue", StringType),
    StructField("tags", ArrayType(StringType))))

  /** Nested news article (ref news/main.py:56-79). */
  val newsArticle: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("published_utc", StringType),
    StructField("publisher", StructType(Seq(
      StructField("name", StringType),
      StructField("homepage_url", StringType)))),
    StructField("tickers", ArrayType(StringType)),
    StructField("title", StringType),
    StructField("article_url", StringType),
    StructField("description", StringType)))

  /** Telemetry long-format point (FIXTURES.md §6; SURVEY.md §1.1.4). */
  val parameterPoint: StructType = StructType(Seq(
    StructField("ts_ns", LongType),
    StructField("stream_id", StringType),
    StructField("parameter", StringType),
    StructField("num_value", DoubleType),
    StructField("str_value", StringType),
    StructField("bin_value", BinaryType),
    StructField("tags", MapType(StringType, StringType))))

  /** Stream catalog dimension (ref dashboard/src/Models/stream.ts:17-66:
    * id/name/topic, data bounds in ns, 8-state status enum
    * streamStatus.ts:16, metadata map, parents lineage, hierarchical
    * location).
    */
  val streamCatalog: StructType = StructType(Seq(
    StructField("stream_id", StringType),
    StructField("name", StringType),
    StructField("topic", StringType),
    StructField("data_start_ns", LongType),
    StructField("data_end_ns", LongType),
    StructField("status", StringType), // 8 states, streamStatus.ts:16
    StructField("metadata", MapType(StringType, StringType)),
    StructField("parents", ArrayType(StringType)),
    StructField("location", StringType))) // '/'-separated path tree

  /** Parameter catalog dimension (ref parameter.ts:17-58,
    * parameterType.ts:16: Unknown | Numeric | String | Binary).
    */
  val parameterCatalog: StructType = StructType(Seq(
    StructField("parameter_id", StringType),
    StructField("name", StringType),
    StructField("min_value", DoubleType),
    StructField("max_value", DoubleType),
    StructField("unit", StringType),
    StructField("format", StringType),
    StructField("param_type", StringType)))

  /** Event catalog dimension (ref event.ts:17-43, eventLevel.ts:16:
    * Trace..Critical).
    */
  val eventCatalog: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("name", StringType),
    StructField("level", StringType),
    StructField("custom_properties", StringType)))
}
