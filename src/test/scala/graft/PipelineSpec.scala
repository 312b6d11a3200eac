package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Enrich, OptionAgg}
import graft.sources.{Ingest, Schemas}
import graft.streaming.StreamingOps

/** Capstone integration test: the reference's full pipeline
  * (SURVEY §3.1 ingest+enrich → §3.2 stateful aggregation) composed
  * end-to-end on a STREAM — WebSocket-style JSON array frames with a
  * status sentinel → explodeFrames (F2) → map_fields (P1) →
  * enrichment chain (P3-P8) → keyed 1-minute window with the
  * 24-measure schema (A1-A3), final-only emission. A user of the
  * reference runs exactly this graph.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tradeJson(id: String, tsMs: Long, osym: String, otype: String,
                        qty: Int, premium: Double, tags: String): String =
    s"""{"id":"$id","executed_at":$tsMs,"option_symbol":"$osym",
       |"underlying_symbol":"AAPL","underlying_price":"101.2","strike":"100.0",
       |"expiry":"2024-01-18","option_type":"$otype","size":"$qty",
       |"price":"2.15","premium":"$premium","exchange":"CBOE","condition":"S",
       |"implied_volatility":"0.3","open_interest":"10","nbbo_bid":"2.10",
       |"nbbo_ask":"2.20","theo_price":"2.14","delta":"0.5","gamma":"0.1",
       |"vega":"0.1","theta":"-0.1","rho":"0.1","report_flags":[],
       |"tags":[$tags]}""".stripMargin.replace("\n", "")

  test("frames -> sentinel skip -> map_fields -> enrich -> 24-measure window, final-only") {
    // 14:30:00 UTC on 2024-01-02 = epoch ms 1704205800000
    val base = 1704205800000L
    val frame1 = "[" + Seq(
      """{"id":"status-msg"}""", // sentinel element data[0]
      tradeJson("t1", base + 10000, "AAPL240118C00100000", "call",
        120, 258000.0, "\"ask_side\""),
      tradeJson("t2", base + 40000, "AAPL240118C00100000", "put",
        10, 4000.0, "\"bid_side\"")).mkString(",") + "]"
    // later frame advances the watermark past the first window
    val frame2 = "[" + Seq(
      """{"id":"status-msg"}""",
      tradeJson("t3", base + 150000, "AAPL240118C00100000", "call",
        1, 1.0, "\"no_side\"")).mkString(",") + "]"

    val input = MemoryStream[String](spark)
    val enriched = Enrich.enrichOptionTrade(
        Ingest.mapFields(
          Ingest.explodeFrames(input.toDF().toDF("raw"), "raw",
            Schemas.optionTradeVendor)))
      .withColumn("ts_event", timestamp_millis(col("ts")))
    val agged = StreamingOps.windowedAgg(enriched, "ts_event", "osym",
      "1 minute", "1 second",
      count(lit(1)).as("count") +: OptionAgg.measures())

    val ckpt = Files.createTempDirectory("ckpt_pipeline").toString
    val q = agged.writeStream.format("memory").queryName("pipeline_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      input.addData(frame1)
      q.processAllAvailable()
      spark.table("pipeline_out").count() shouldBe 0 // window still open

      input.addData(frame2)
      q.processAllAvailable()
      val rows = spark.table("pipeline_out").collect()
      rows.length shouldBe 1 // exactly one final emission
      val r = rows(0)
      r.getAs[String]("osym") shouldBe "AAPL240118C00100000"
      r.getAs[Long]("count") shouldBe 2L
      // t1: premium 258k > 250k -> whale; ask_side -> buy; call
      r.getAs[Long]("whale_bought_call_vol") shouldBe 120L
      r.getAs[Double]("whale_bought_call_prem") shouldBe 258000.0
      // t2: retail; bid_side -> sell; put
      r.getAs[Long]("sold_put_vol") shouldBe 10L
      r.getAs[Double]("sold_put_prem") shouldBe 4000.0
    } finally q.stop()
  }
}
