package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Enrich

/** Unit tests for the enrichment chain (P3-P14) including the operators
  * no oracle query exercises: P9 nearestQuoteSide, P10 sideConfidence,
  * P12 toEastern.
  */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  test("P3 daysToExpiry: date difference in days (ref option_trades/utils.py:102-104)") {
    val got = Seq(("2024-01-18", "2024-01-01 14:30:00"))
      .toDF("expiry", "ts")
      .select(Enrich.daysToExpiry($"expiry", $"ts"))
      .collect()(0).getInt(0)
    got shouldBe 17
  }

  test("P5 premiumTags boundaries: >large, whaleLo<p<whaleHi, >millionaire (ref utils.py:94-101)") {
    def tags(p: Double): Seq[String] =
      Seq(p).toDF("p")
        .select(Enrich.premiumTags($"p", 75000, 250000, 1000000, 1000000))
        .collect()(0).getSeq[String](0)
    tags(75000.0) shouldBe Seq.empty            // boundary: strictly greater
    tags(75000.1) shouldBe Seq("large_trade")
    tags(250000.0) shouldBe Seq("large_trade")  // whale is strict both sides
    tags(300000.0) shouldBe Seq("large_trade", "whale")
    tags(1000000.0) shouldBe Seq("large_trade") // 1M: not whale (p<hi), not millionaire (p>1M)
    tags(1500000.0) shouldBe Seq("large_trade", "millionaire")
  }

  test("P6 expiryTags: dtx<=0 today, <=7 soon (ref utils.py:106-109)") {
    def tags(d: Int): Seq[String] =
      Seq(d).toDF("d").select(Enrich.expiryTags($"d")).collect()(0).getSeq[String](0)
    tags(-1) shouldBe Seq("expires_today")
    tags(0) shouldBe Seq("expires_today")
    tags(1) shouldBe Seq("expires_soon")
    tags(7) shouldBe Seq("expires_soon")
    tags(8) shouldBe Seq.empty
  }

  test("P7+P4 side and position type from tags (ref utils.py:85-92,124)") {
    val df = Seq(
      (Seq("ask_side"), "call"),
      (Seq("bid_side"), "put"),
      (Seq("no_side"), "call"),
      (Seq("other"), "put")).toDF("tags", "otype")
    val got = df.select(
      Enrich.sideFromTags($"tags"),
      Enrich.positionType($"tags", $"otype")).collect().map(r => (r.getString(0), r.getString(1)))
    got(0) shouldBe ("buy", "long_call")
    got(1) shouldBe ("sell", "short_put")
    got(2) shouldBe ("no_side", "no_side_call")
    got(3) shouldBe ("no_side", "neutral_put")
  }

  test("P9 nearestQuoteSide: closer to bid Sell, closer to ask Buy, tie Neutral (ref darkpool_trades/main.py:71-78)") {
    val df = Seq(
      (10.1, 10.0, 11.0),  // near bid -> S
      (10.9, 10.0, 11.0),  // near ask -> B
      (10.5, 10.0, 11.0)   // exact mid -> N
    ).toDF("price", "bid", "ask")
    df.select(Enrich.nearestQuoteSide($"price", $"bid", $"ask"))
      .collect().map(_.getString(0)).toSeq shouldBe Seq("S", "B", "N")
  }

  test("P10 sideConfidence: in [-1,1], sign follows price vs mid (ref main.py:80-86)") {
    val df = Seq(
      (10.9, 10.0, 11.0),  // above mid -> positive
      (10.1, 10.0, 11.0),  // below mid -> negative
      (10.5, 10.0, 11.0)   // at mid -> 0
    ).toDF("price", "bid", "ask")
    val got = df.select(Enrich.sideConfidence($"price", $"bid", $"ask"))
      .collect().map(_.getDouble(0)).toSeq
    all(got) should (be >= -1.0 and be <= 1.0)
    got(0) should be > 0.0
    got(1) should be < 0.0
    got(2) shouldBe 0.0 +- 1e-12
  }

  test("P12 toEastern: UTC -> US/Eastern honors DST (ref main.py:45,96)") {
    val df = Seq(
      Timestamp.valueOf("2024-01-15 17:00:00"),  // EST: UTC-5 -> 12:00
      Timestamp.valueOf("2024-07-15 17:00:00")   // EDT: UTC-4 -> 13:00
    ).toDF("ts")
    val got = df.select(date_format(Enrich.toEastern($"ts"), "HH:mm"))
      .collect().map(_.getString(0)).toSeq
    got shouldBe Seq("12:00", "13:00")
  }

  test("P11 surrogateKey: deterministic SHA-256, field-order sensitive (ref main.py:88-92)") {
    val df = Seq(("a", "b"), ("a", "b"), ("b", "a")).toDF("x", "y")
    val keys = df.select(Enrich.surrogateKey($"x", $"y")).collect().map(_.getString(0))
    keys(0) shouldBe keys(1)
    keys(0) should not be keys(2)
    keys(0) should fullyMatch regex "[0-9a-f]{64}"
  }

  test("P13 sentimentTag thresholds at +-0.25 (ref main.py:104-117)") {
    val got = Seq(0.3, -0.3, 0.0, 0.25, -0.25).toDF("s")
      .select(Enrich.sentimentTag($"s")).collect().map(_.getString(0)).toSeq
    got shouldBe Seq("sentiment:bullish", "sentiment:bearish",
      "sentiment:neutral", "sentiment:neutral", "sentiment:neutral")
  }

  test("W1 pctGap: NULL on zero or missing previous value, exact otherwise") {
    val df = Seq(
      (110.0, Some(100.0)),
      (110.0, Some(0.0)),   // zero prev: NULL, not DIVIDE_BY_ZERO (the sf0.1 crash)
      (110.0, None)         // no prev
    ).toDF("cur", "prev")
    val got = df.select(Enrich.pctGap($"cur", $"prev")).collect()
    got(0).getDouble(0) shouldBe 10.0 +- 1e-9
    got(1).isNullAt(0) shouldBe true
    got(2).isNullAt(0) shouldBe true
  }

  test("P14 epochMillis round-trips a known instant") {
    val got = Seq(Timestamp.valueOf("2024-01-01 00:00:00")).toDF("ts")
      .select(Enrich.epochMillis($"ts")).collect()(0).getLong(0)
    got shouldBe 1704067200000L
  }
}
