package graft

import org.apache.spark.sql.functions._
import graft.sinks.ConfluentFraming

/** Confluent Schema-Registry wire format (K2): 0x00 | int32-BE schema
  * id | payload (ref darkpool_trades/basic.py:114-252).
  */
class FramingSpec extends SparkSpec {
  import spark.implicits._

  test("frame produces the 5-byte header and unframe inverts it") {
    val schemaId = 100123 // multi-byte to exercise BE encoding
    val df = Seq("""{"symbol":"AAPL","price":"12.3400"}""").toDF("payload")
      .select(ConfluentFraming.frame($"payload".cast("binary"), schemaId).as("framed"))
    val raw = df.collect()(0).getAs[Array[Byte]](0)
    raw(0) shouldBe 0x00.toByte
    // int32 BE of 100123 = 0x0001871B
    raw.slice(1, 5).toSeq shouldBe Seq(0x00, 0x01, 0x87.toByte, 0x1B)
    new String(raw.drop(5)) shouldBe """{"symbol":"AAPL","price":"12.3400"}"""

    val back = df.select(ConfluentFraming.unframe($"framed").as("u"))
      .select($"u.schema_id", $"u.payload".cast("string")).collect()(0)
    back.getInt(0) shouldBe schemaId
    back.getString(1) shouldBe """{"symbol":"AAPL","price":"12.3400"}"""
  }

  test("isFramed accepts framed values and rejects bare payloads") {
    val df = Seq("x").toDF("p")
      .select(ConfluentFraming.frame($"p".cast("binary"), 7).as("good"),
        $"p".cast("binary").as("bad"))
    df.filter(ConfluentFraming.isFramed($"good")).count() shouldBe 1
    df.filter(ConfluentFraming.isFramed($"bad")).count() shouldBe 0
  }
}
