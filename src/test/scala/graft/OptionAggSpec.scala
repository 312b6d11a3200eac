package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Enrich, OptionAgg}
import graft.sources.{Ingest, Schemas}

case class Trade(osym: String, ts: Timestamp, otype: String,
                 qty: Long, premium: Double, side: String)

/** FIXTURES.md §2's golden-check example driven through the literal
  * 24-measure aggregation, and the full enrichment chain over the §1
  * sample row — the reference's core record path end-to-end: JSON →
  * map_fields → enrich → 1-minute aggregate.
  */
class OptionAggSpec extends SparkSpec {
  import spark.implicits._

  test("FIXTURES §2 golden check: whale buy call + retail sell put in one window") {
    val trades = Seq(
      // osym, ts, usym, strike, expiration, otype, qty, price, premium, side
      ("AAPL240118C00100000", Timestamp.valueOf("2024-01-02 14:30:10"),
        "AAPL", 100.0, "2024-01-18", "call", 120L, 2.15, 258000.0, "buy"),
      ("AAPL240118C00100000", Timestamp.valueOf("2024-01-02 14:30:40"),
        "AAPL", 100.0, "2024-01-18", "put", 10L, 0.4, 4000.0, "sell")
    ).toDF("osym", "ts", "usym", "strike", "expiration", "otype", "qty", "price", "premium", "side")

    val out = OptionAgg.aggregate(trades).collect()
    out.length shouldBe 1
    val r = out(0)
    r.getAs[Long]("count") shouldBe 2L
    r.getAs[Long]("whale_bought_call_vol") shouldBe 120L
    r.getAs[Double]("whale_bought_call_prem") shouldBe 258000.0
    r.getAs[Long]("sold_put_vol") shouldBe 10L
    r.getAs[Double]("sold_put_prem") shouldBe 4000.0
    // every other measure is zero (FIXTURES.md §2 golden-check)
    val named = Set("whale_bought_call_vol", "whale_bought_call_prem",
      "sold_put_vol", "sold_put_prem")
    val zeroMeasures = r.schema.fieldNames.filter(f =>
      (f.endsWith("_vol") || f.endsWith("_prem")) && !named(f))
    zeroMeasures.length shouldBe 20
    zeroMeasures.foreach { f =>
      withClue(f) { r.getAs[Any](f).toString.toDouble shouldBe 0.0 }
    }
    // window bounds in epoch ms, 1 minute apart
    r.getAs[Long]("end") - r.getAs[Long]("start") shouldBe 60000L
    r.getAs[String]("usym") shouldBe "AAPL"
  }

  test("the 24-measure aggregation runs in STREAMING with final-only emission (the reference's production shape)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    implicit val enc: org.apache.spark.sql.Encoder[Trade] =
      org.apache.spark.sql.Encoders.product[Trade]
    val input = MemoryStream[Trade](spark)
    val agged = StreamingOps.windowedAgg(input.toDF(), "ts", "osym",
      "1 minute", "1 second",
      count(lit(1)).as("count") +: OptionAgg.measures())
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_oagg").toString
    val q = agged.writeStream.format("memory").queryName("oagg_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      input.addData(
        Trade("A", Timestamp.valueOf("2024-01-02 14:30:10"), "call", 120L, 258000.0, "buy"),
        Trade("A", Timestamp.valueOf("2024-01-02 14:30:40"), "put", 10L, 4000.0, "sell"),
        Trade("A", Timestamp.valueOf("2024-01-02 14:32:30"), "call", 1L, 1.0, "buy")) // sentinel
      q.processAllAvailable()
      val rows = spark.table("oagg_out").collect()
      rows.length shouldBe 1 // only the closed 14:30 window emitted
      rows(0).getAs[Long]("count") shouldBe 2L
      rows(0).getAs[Long]("whale_bought_call_vol") shouldBe 120L
      rows(0).getAs[Double]("sold_put_prem") shouldBe 4000.0
    } finally q.stop()
  }

  test("FIXTURES §1 sample row: JSON -> map_fields -> enrich chain end-to-end") {
    val vendorJson =
      """{"id":"t-001","executed_at":1704110460500,
        |"option_symbol":"AAPL240118C00100000","underlying_symbol":"AAPL",
        |"underlying_price":"101.2","strike":"100.0","expiry":"2024-01-18",
        |"option_type":"call","size":"120","price":"2.15","premium":"258000.0",
        |"exchange":"CBOE","condition":"S","implied_volatility":"0.31",
        |"open_interest":"5400","nbbo_bid":"2.10","nbbo_ask":"2.20",
        |"theo_price":"2.14","delta":"0.55","gamma":"0.04","vega":"0.11",
        |"theta":"-0.05","rho":"0.02","report_flags":[],
        |"tags":["ask_side"]}""".stripMargin.replace("\n", "")
    val canonical = Ingest.mapFields(
      Ingest.valid(Ingest.parseJson(Seq(vendorJson).toDF("raw"), "raw",
        Schemas.optionTradeVendor)))
    val out = Enrich.enrichOptionTrade(canonical).collect()(0)
    // executed_at 2024-01-01T12:41:00.500Z -> expiry 2024-01-18 = 17 days
    out.getAs[Int]("dtx") shouldBe 17
    out.getAs[Seq[String]]("tags") shouldBe
      Seq("ask_side", "large_trade", "whale") // 258k: >75k and 250k<p<1M, dtx 17 no expiry tag
    out.getAs[String]("side") shouldBe "buy"  // ask_side (ref utils.py:124)
    out.getAs[String]("position_type") shouldBe "long_call"
  }
}
