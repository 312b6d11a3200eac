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

  import graft.sinks.AvroBinary
  import graft.sinks.AvroBinary.DarkpoolTrade

  test("Avro body encode matches hand-computed bytes (K2, darkpool record schema)") {
    // Every byte below is derived BY HAND from the Avro binary spec:
    //   long/int = ZigZag then LE base-128 varint; string = varint
    //   byte-length + UTF-8; enum = varint symbol index; float = 4-byte
    //   LE IEEE-754.
    // ts=150        -> zigzag 300 = 0b1_0010_1100    -> AC 02
    // "SPY"         -> len 3 -> zigzag 6             -> 06 'S' 'P' 'Y'
    // "1.25"        -> len 4 -> 08                   -> 08 31 2E 32 35
    // bid_sz=5      -> zigzag 10                     -> 0A
    // "1.35"                                         -> 08 31 2E 33 35
    // ask_sz=-3     -> zigzag 5                      -> 05
    // "1.30"                                         -> 08 31 2E 33 30
    // qty=100       -> zigzag 200 = 0b1100_1000      -> C8 01
    // "130.00"      -> len 6 -> 0C                   -> 0C 31 33 30 2E 30 30
    // side "S"      -> enum index 1 -> zigzag 2      -> 02
    // conf=0.5f     -> bits 0x3F000000, LE           -> 00 00 00 3F
    // venue ""      -> len 0                         -> 00
    val t = DarkpoolTrade(150L, "SPY", "1.25", 5, "1.35", -3,
      "1.30", 100, "130.00", "S", 0.5f, "")
    val expected = Array[Int](
      0xAC, 0x02,
      0x06, 'S', 'P', 'Y',
      0x08, '1', '.', '2', '5',
      0x0A,
      0x08, '1', '.', '3', '5',
      0x05,
      0x08, '1', '.', '3', '0',
      0xC8, 0x01,
      0x0C, '1', '3', '0', '.', '0', '0',
      0x02,
      0x00, 0x00, 0x00, 0x3F,
      0x00).map(_.toByte)
    AvroBinary.encode(t).toSeq shouldBe expected.toSeq
    AvroBinary.decode(expected) shouldBe t
  }

  test("Avro body round-trips hostile values: multi-byte varints, negative float, unicode, decimal strings") {
    val t = DarkpoolTrade(
      ts = 1700000000123L,            // 6-byte varint
      symbol = "BRK.B",
      bid = "628123.1250",            // Decimal-as-string survives byte-exact
      bid_sz = Int.MaxValue,
      ask = "628124.0000",
      ask_sz = Int.MinValue,          // zigzag edge
      price = "628123.5000",
      qty = 0,
      value = "62812350.0000",
      side = "N",
      confidence = -1.0f,
      venue = "dark£pool→")
    AvroBinary.decode(AvroBinary.encode(t)) shouldBe t
  }

  test("Avro decode is strict: trailing bytes and bad enum indexes are errors") {
    val good = AvroBinary.encode(DarkpoolTrade(1L, "A", "1", 1, "1", 1,
      "1", 1, "1", "B", 0f, ""))
    an[Exception] should be thrownBy AvroBinary.decode(good :+ 0x00.toByte)
    an[Exception] should be thrownBy AvroBinary.decode(good.dropRight(1))
  }

  test("Avro body encoding is byte-identical to the Apache Avro reference implementation") {
    // independent cross-check: avro-core (a Spark runtime dependency,
    // not a new library dep) encodes the same record under the same
    // schema — every byte must match the hand-rolled codec
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.EncoderFactory
    val schemaJson = """
      {"type":"record","name":"DarkpoolTrade","namespace":"io.graft.test","fields":[
        {"name":"ts","type":"long"},{"name":"symbol","type":"string"},
        {"name":"bid","type":"string"},{"name":"bid_sz","type":"int"},
        {"name":"ask","type":"string"},{"name":"ask_sz","type":"int"},
        {"name":"price","type":"string"},{"name":"qty","type":"int"},
        {"name":"value","type":"string"},
        {"name":"side","type":{"name":"TradeSide","type":"enum","symbols":["B","S","N"]}},
        {"name":"confidence","type":"float"},{"name":"venue","type":"string"}]}"""
    val schema = new Schema.Parser().parse(schemaJson)
    val trades = Seq(
      DarkpoolTrade(150L, "SPY", "1.25", 5, "1.35", -3, "1.30", 100,
        "130.00", "S", 0.5f, ""),
      DarkpoolTrade(1700000000123L, "BRK.B", "628123.1250", Int.MaxValue,
        "628124.0000", Int.MinValue, "628123.5000", 0, "62812350.0000",
        "N", -1.0f, "dark£pool→"))
    for (t <- trades) {
      val rec: GenericRecord = new GenericData.Record(schema)
      rec.put("ts", t.ts); rec.put("symbol", t.symbol)
      rec.put("bid", t.bid); rec.put("bid_sz", t.bid_sz)
      rec.put("ask", t.ask); rec.put("ask_sz", t.ask_sz)
      rec.put("price", t.price); rec.put("qty", t.qty); rec.put("value", t.value)
      rec.put("side", new GenericData.EnumSymbol(
        schema.getField("side").schema(), t.side))
      rec.put("confidence", t.confidence); rec.put("venue", t.venue)
      val bos = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
      enc.flush()
      withClue(s"record $t: ") {
        AvroBinary.encode(t).toSeq shouldBe bos.toByteArray.toSeq
      }
    }
  }

  test("framed Avro end-to-end through Spark: encodeFramed | unframe | decodeFramed") {
    val trades = Seq(
      DarkpoolTrade(1700000000001L, "AAPL", "189.4500", 300, "189.4700", 200,
        "189.4600", 1000, "189460.0000", "B", 0.8f, "XDARK"),
      DarkpoolTrade(1700000000002L, "MSFT", "411.0000", 100, "411.0500", 150,
        "411.0200", 50, "20551.0000", "S", -0.6f, "OTCX"))
    val schemaId = 42007
    val framed = AvroBinary.encodeFramed(trades.toDS(), schemaId)

    // column-level unframe sees the right schema id on every value
    val ids = framed.toDF("framed")
      .select(ConfluentFraming.unframe($"framed").getField("schema_id"))
      .collect().map(_.getInt(0)).toSeq
    ids shouldBe Seq(schemaId, schemaId)

    // full inverse recovers the records exactly (decimal strings intact)
    AvroBinary.decodeFramed(spark, framed).collect().toSeq shouldBe trades
  }

  test("property: Avro body round-trips 200 seeded random records, including varint and unicode extremes") {
    // seeded hand-rolled generation — the scalatest<->scalacheck bridge
    // artifact is not in the offline cache (FunctionsSpec convention)
    val rnd = new scala.util.Random(20260813)
    def randString(): String = {
      val len = rnd.nextInt(24)
      val chars = Seq.fill(len)(rnd.nextInt(5) match {
        case 0 => ('a' + rnd.nextInt(26)).toChar.toString
        case 1 => rnd.nextInt(10).toString
        case 2 => "é"            // two UTF-8 bytes
        case 3 => "中"            // three UTF-8 bytes
        case 4 => new String(Character.toChars(0x1F600 + rnd.nextInt(16))) // four
      })
      chars.mkString
    }
    def randLong(): Long = rnd.nextInt(4) match {
      case 0 => rnd.nextLong()
      case 1 => Long.MinValue + rnd.nextInt(1000)
      case 2 => Long.MaxValue - rnd.nextInt(1000)
      case _ => rnd.nextInt(128).toLong - 64   // 1-byte zone boundaries
    }
    def randInt(): Int = rnd.nextInt(4) match {
      case 0 => rnd.nextInt()
      case 1 => Int.MinValue + rnd.nextInt(1000)
      case 2 => Int.MaxValue - rnd.nextInt(1000)
      case _ => rnd.nextInt(256) - 128
    }
    for (i <- 1 to 200) {
      val t = AvroBinary.DarkpoolTrade(
        randLong(), randString(), randString(), randInt(),
        randString(), randInt(), randString(), randInt(), randString(),
        AvroBinary.SideSymbols(rnd.nextInt(3)),
        java.lang.Float.intBitsToFloat(rnd.nextInt()) match {
          // NaN payloads don't compare == ; normalize to a canonical NaN
          case f if f.isNaN => Float.NaN
          case f => f
        },
        randString())
      val back = AvroBinary.decode(AvroBinary.encode(t))
      withClue(s"record #$i: ") {
        if (t.confidence.isNaN) back.confidence.isNaN shouldBe true
        else back shouldBe t
        if (t.confidence.isNaN) back.copy(confidence = 0f) shouldBe t.copy(confidence = 0f)
      }
    }
  }
}
