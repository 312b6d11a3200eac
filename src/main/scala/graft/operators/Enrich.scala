package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions._

/** The reference's per-record enrichment chain as pure `Column`
  * functions — the projection/tagging pipeline every ingested record
  * passes through (ref option_trades/utils.py:81-145,
  * darkpool_trades/main.py:71-120). All codegen'd expressions, no UDFs.
  */
object Enrich {

  /** P3 — days between an expiry date and the event date
    * (ref option_trades/utils.py:102-104).
    */
  def daysToExpiry(expiry: Column, ts: Column): Column =
    datediff(to_date(expiry), to_date(ts))

  /** P5 — premium bucket tags: >75k large_trade; 250k<p<1M whale;
    * >1M millionaire (ref option_trades/utils.py:94-101). Thresholds are
    * parameters so the same operator serves the testdata's value scale.
    */
  def premiumTags(premium: Column,
                  large: Double, whaleLo: Double, whaleHi: Double,
                  millionaire: Double): Column =
    array_compact(array(
      when(premium > large, lit("large_trade")),
      when(premium > whaleLo && premium < whaleHi, lit("whale")),
      when(premium > millionaire, lit("millionaire"))))

  /** P6 — expiry tags: dtx <= 0 expires_today, <= 7 expires_soon
    * (ref option_trades/utils.py:106-109).
    */
  def expiryTags(dtx: Column): Column =
    array_compact(array(
      when(dtx <= 0, lit("expires_today")),
      when(dtx > 0 && dtx <= 7, lit("expires_soon"))))

  /** P7 — side classification from a tag array
    * (ref option_trades/utils.py:124).
    */
  def sideFromTags(tags: Column): Column =
    when(array_contains(tags, "ask_side"), "buy")
      .when(array_contains(tags, "bid_side"), "sell")
      .otherwise("no_side")

  /** P4 — position-type label: side prefix concat option type
    * (ref option_trades/utils.py:85-92).
    */
  def positionType(tags: Column, otype: Column): Column =
    concat(
      when(array_contains(tags, "ask_side"), "long_")
        .when(array_contains(tags, "bid_side"), "short_")
        .when(array_contains(tags, "no_side"), "no_side_")
        .otherwise("neutral_"),
      otype)

  /** P8 — tag-list merge (ref option_trades/utils.py:81-83). */
  def mergeTags(tags: Column, more: Column): Column = concat(tags, more)

  /** P9 — darkpool nearest-quote side rule: closer to bid ⇒ Sell, closer
    * to ask ⇒ Buy, tie ⇒ Neutral (ref darkpool_trades/main.py:71-78).
    */
  def nearestQuoteSide(price: Column, bid: Column, ask: Column): Column =
    when(abs(price - bid) < abs(price - ask), "S")
      .when(abs(price - bid) > abs(price - ask), "B")
      .otherwise("N")

  /** P10 — side-confidence: sigmoid of (price-mid)/(ask-bid) mapped to
    * [-1,1] (ref darkpool_trades/main.py:80-86). NULL on a crossed or
    * zero-width quote (ask == bid): plain division would throw
    * DIVIDE_BY_ZERO under ANSI mode the moment one degenerate quote
    * appears — same failure class as [[pctGap]].
    */
  def sideConfidence(price: Column, bid: Column, ask: Column): Column = {
    val mid = (bid + ask) / lit(2.0)
    signedSigmoid(try_divide(price - mid, ask - bid))
  }

  /** P11 — SHA-256 surrogate key over identifying fields
    * (ref darkpool_trades/main.py:88-92).
    */
  def surrogateKey(cols: Column*): Column = sha2(concat_ws("|", cols: _*), 256)

  /** P12 — timezone conversion UTC → US/Eastern
    * (ref darkpool_trades/main.py:45,96).
    */
  def toEastern(ts: Column): Column = from_utc_timestamp(ts, "America/New_York")

  /** P13 — condition/sentiment tags (ref darkpool_trades/main.py:104-117). */
  def sentimentTag(score: Column): Column =
    concat(lit("sentiment:"),
      when(score > 0.25, "bullish").when(score < -0.25, "bearish")
        .otherwise("neutral"))

  /** P14 — epoch-milliseconds (ref darkpool_trades/main.py:120). */
  def epochMillis(ts: Column): Column = unix_millis(ts)

  /** W1 analog — percent gap vs a previous value
    * (ref darkpool_trades/metrics.py:105-115). NULL when the previous
    * value is 0: plain `/` throws DIVIDE_BY_ZERO under ANSI mode the
    * moment any key's history touches zero, so the division must be
    * `try_divide` to survive real data (DuckDB's double division yields
    * NULL on 0 natively, so oracle hashes agree).
    */
  def pctGap(cur: Column, prev: Column): Column =
    try_divide(cur - prev, prev) * lit(100.0)

  /** The full option-trade enrichment chain (SURVEY §7 Phase 1),
    * composing P3-P8 over a canonical option-trade DataFrame
    * ([[graft.sources.Schemas.optionTrade]] shape with epoch-ms `ts`):
    * days-to-expiry, premium-bucket + expiry tags merged into `tags`,
    * side classification, position-type label
    * (ref option_trades/utils.py:81-149 `map_fields` tail).
    */
  def enrichOptionTrade(trades: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dtx = daysToExpiry(col("expiration"), timestamp_millis(col("ts")))
    trades
      .withColumn("dtx", dtx)
      .withColumn("tags", mergeTags(col("tags"),
        mergeTags(
          premiumTags(col("premium"), 75000.0, 250000.0, 1000000.0, 1000000.0),
          expiryTags(col("dtx")))))
      .withColumn("side", sideFromTags(col("tags")))
      .withColumn("position_type", positionType(col("tags"), col("otype")))
  }
}
