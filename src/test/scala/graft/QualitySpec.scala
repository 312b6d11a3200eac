package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.operators.Quality

/** Rolling data-quality stats (ref darkpool_trades/metrics.py:59-183)
  * and the observe()-based zero-cost metric set.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val series = Seq(
    ("k", 1L, 10.0), ("k", 2L, 20.0), ("k", 3L, 0.0),
    ("k", 4L, 40.0), ("j", 1L, 5.0)
  ).toDF("key", "ts_us", "value")

  test("rollingStats over trailing N rows: count/mean/min/max windows, pct_gap, staleness") {
    val out = Quality.rollingStats(series, "key", "ts_us", "value", n = 3)
      .filter($"key" === "k").orderBy($"ts_us").collect()
    out.map(_.getAs[Long]("rolling_count")).toSeq shouldBe Seq(1L, 2L, 3L, 3L)
    out.map(_.getAs[Double]("rolling_mean")).toSeq shouldBe Seq(10.0, 15.0, 10.0, 20.0)
    out.map(_.getAs[Double]("rolling_min")).toSeq shouldBe Seq(10.0, 10.0, 0.0, 0.0)
    out.map(_.getAs[Double]("rolling_max")).toSeq shouldBe Seq(10.0, 20.0, 20.0, 40.0)
    // pct_gap: null, +100%, -100%, NULL (prev value 0 -> try_divide)
    out(0).isNullAt(out(0).fieldIndex("pct_gap")) shouldBe true
    out(1).getAs[Double]("pct_gap") shouldBe 100.0 +- 1e-9
    out(2).getAs[Double]("pct_gap") shouldBe -100.0 +- 1e-9
    out(3).isNullAt(out(3).fieldIndex("pct_gap")) shouldBe true
    out.drop(1).map(_.getAs[Long]("staleness_us")).toSeq shouldBe Seq(1L, 1L, 1L)
  }

  test("rollingStats keys are independent") {
    val out = Quality.rollingStats(series, "key", "ts_us", "value", n = 3)
      .filter($"key" === "j").collect()
    out.length shouldBe 1
    out(0).getAs[Long]("rolling_count") shouldBe 1L
    out(0).isNullAt(out(0).fieldIndex("pct_gap")) shouldBe true
  }

  test("messageQuality emits the per-message DataQualityMetrics vector; metricsSummary rolls it up (ref metrics.py:90-183)") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // key k: 4 messages at 1s/1s/10s spacing; one zero price, one +100%
    // gap, one missing required field, one late (proc - ts > 3s)
    val msgs = Seq(
      ("k", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:01"), 10.0, "a"),
      ("k", ts("2024-01-01 10:00:01"), ts("2024-01-01 10:00:01"), 20.0, "b"),  // +100% gap
      ("k", ts("2024-01-01 10:00:02"), ts("2024-01-01 10:00:06"), 0.0, null), // zero + missing + late
      ("k", ts("2024-01-01 10:00:12"), ts("2024-01-01 10:00:12"), 1.0, "c"),  // stale (10s) + gap-from-0 is NOT a gap
      ("j", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), 5.0, "d")   // clean key
    ).toDF("key", "ts", "proc_ts", "price", "req")
    val q = Quality.messageQuality(msgs, "key",
      orderCols = Seq("ts"), tsCol = "ts", procTsCol = "proc_ts",
      priceCol = "price", requiredCols = Seq("req"),
      maxLatencyUs = 3000000L, maxGapPct = 50.0)
    val k = q.filter($"key" === "k").orderBy($"ts").collect()
    k.map(_.getAs[Long]("latency_us")).toSeq shouldBe
      Seq(1000000L, 0L, 4000000L, 0L)
    k.map(_.getAs[Int]("missing_fields_count")).toSeq shouldBe Seq(0, 0, 1, 0)
    k.map(_.getAs[Boolean]("zero_price")).toSeq shouldBe
      Seq(false, false, true, false)
    // gap: first msg no-prev=false; 10->20 = +100% gap; 20->0 = -100%
    // gap; 0->1 prev==0 is NOT a gap (reference's `if self.last_price`)
    k.map(_.getAs[Boolean]("price_gap")).toSeq shouldBe
      Seq(false, true, true, false)
    k.map(_.getAs[Boolean]("stale")).toSeq shouldBe
      Seq(false, false, false, true)
    k.map(_.getAs[Boolean]("alert")).toSeq shouldBe
      Seq(false, true, true, true)
    // no required fields to watch: the count column is constant 0, no crash
    Quality.messageQuality(msgs, "key", Seq("ts"), "ts", "proc_ts", "price",
        requiredCols = Nil, maxLatencyUs = 3000000L, maxGapPct = 50.0)
      .select(max($"missing_fields_count")).collect()(0).getInt(0) shouldBe 0
    // a null price is not a zero price and never yields a null alert;
    // a separate staleness knob decouples the two thresholds
    val nullPrice = Seq(
      ("n", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"),
        null.asInstanceOf[java.lang.Double], "x")
    ).toDF("key", "ts", "proc_ts", "price", "req")
    val nq = Quality.messageQuality(nullPrice, "key", Seq("ts"), "ts",
        "proc_ts", "price", requiredCols = Seq("price"),
        maxLatencyUs = 3000000L, maxGapPct = 50.0).collect()(0)
    nq.getAs[Boolean]("zero_price") shouldBe false
    nq.getAs[Int]("missing_fields_count") shouldBe 1 // surfaced as missing
    nq.getAs[Boolean]("alert") shouldBe true
    val loose = Quality.messageQuality(msgs, "key", Seq("ts"), "ts",
        "proc_ts", "price", requiredCols = Seq("req"),
        maxLatencyUs = 3000000L, maxGapPct = 50.0,
        maxStalenessUs = Some(60000000L)) // 60 s: the 10 s gap is fine
      .filter($"key" === "k").orderBy($"ts").collect()
    loose.map(_.getAs[Boolean]("stale")).toSeq shouldBe
      Seq(false, false, false, false)
    val sum = Quality.metricsSummary(q, "key").orderBy($"key").collect()
    sum.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq shouldBe Seq(
      ("j", 1L, 0L, 0L, 0L, 0L, 0L, 0L),
      ("k", 4L, 5000000L, 1L, 1L, 2L, 1L, 3L))
  }

  test("consecutiveBreaches alerts only after n consecutive failures (ref metrics.py:46-49)") {
    val checks = Seq(
      ("k", 1L, 5.0), ("k", 2L, 5.0), ("k", 3L, 5.0),   // 3 consecutive low
      ("k", 4L, 50.0),                                   // recovery resets
      ("k", 5L, 5.0), ("k", 6L, 5.0),                    // only 2 consecutive
      ("j", 1L, 5.0), ("j", 2L, 5.0)                     // short history never alerts
    ).toDF("key", "ts", "value")
    val out = Quality.consecutiveBreaches(checks, "key", "ts", $"value" < 10.0, n = 3)
      .orderBy($"key", $"ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    out.toSeq shouldBe Seq(
      ("j", 1L, false), ("j", 2L, false),
      ("k", 1L, false), ("k", 2L, false), ("k", 3L, true),
      ("k", 4L, false), ("k", 5L, false), ("k", 6L, false))
  }

  test("observed() metric set is collectable via Observation without a second scan (ref metrics.py:67-161)") {
    val obs = new Observation("quality")
    val df = Seq(Some(1.0), Some(-2.0), None, Some(4.0)).toDF("v")
    Quality.observed(df, "v", obs).collect()
    val m = obs.get
    m("n_rows") shouldBe 4L
    m("n_null_value") shouldBe 1L
    m("n_nonpositive") shouldBe 1L
    m("max_value") shouldBe 4.0
  }
}
