package graft

import java.sql.Timestamp

import graft.operators.EventAnalytics

/** Funnel + cohort retention: greedy earliest-completion semantics and
  * the calendar-bounded retention matrix.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: greedy earliest completion, strict-after ties, missing steps") {
    val events = Seq(
      // u1 completes in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      // u2: click BEFORE the first view doesn't count; none after
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // u3: click at EXACTLY the view timestamp — strict > excludes it,
      // a later click advances
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:00:00"), "click"),
      (3L, ts("2024-01-01 10:05:00"), "click"),
      // u4: no view at all
      (4L, ts("2024-01-01 10:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val rows = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), Option(r.getTimestamp(2)), Option(r.getTimestamp(3)),
          Option(r.getTimestamp(4)))).toMap
    rows(1L) shouldBe ((3, Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 10:01:00")), Some(ts("2024-01-01 10:02:00"))))
    rows(2L) shouldBe ((1, Some(ts("2024-01-01 10:00:00")), None, None))
    rows(3L) shouldBe ((2, Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 10:05:00")), None))
    rows(4L) shouldBe ((0, None, None, None))
  }

  test("rollingActive: DAU and trailing-window distinct counts") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 11:00:00"), "view"),
      (1L, ts("2024-01-02 10:00:00"), "view"),
      (3L, ts("2024-01-04 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val cells = EventAnalytics.rollingActive(events, "user_id", "ts",
        windowDays = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // day -> (dau, trailing-3d distinct): jan4's window is {jan2..jan4}
    // = users {1, 3}; anchors without activity (jan3) are absent
    cells shouldBe Map(
      "2024-01-01" -> ((2L, 2L)),
      "2024-01-02" -> ((1L, 2L)),
      "2024-01-04" -> ((1L, 2L)))
  }

  test("transitionMatrix: per-user lead pairs, row-normalized, terminals dropped") {
    val events = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (11L, 1L, ts("2024-01-01 10:01:00"), "b"),
      (12L, 1L, ts("2024-01-01 10:02:00"), "a"),   // u1: a->b, b->a
      (13L, 2L, ts("2024-01-01 10:00:00"), "a"),
      (14L, 2L, ts("2024-01-01 10:01:00"), "c"))   // u2: a->c; c terminal
      .toDF("event_id", "user_id", "ts", "event_type")
    val rows = graft.operators.EventAnalytics.transitionMatrix(events,
        "user_id", "ts", "event_type", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    rows shouldBe Map(
      ("a", "b") -> ((1L, 0.5)),
      ("a", "c") -> ((1L, 0.5)),
      ("b", "a") -> ((1L, 1.0)))
  }

  test("conversionStats: rate and exact duration percentiles over converters") {
    val events = Seq(
      // u1 converts in 100s, u2 in 200s, u3 stalls at depth 1
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:50"), "click"),
      (1L, ts("2024-01-01 10:01:40"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:01:00"), "click"),
      (2L, ts("2024-01-01 10:03:20"), "purchase"),
      (3L, ts("2024-01-01 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val r = graft.operators.EventAnalytics.conversionStats(events,
      "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .collect()(0)
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 2L
    r.getDouble(2) shouldBe (2.0 / 3.0 +- 1e-9)
    r.getDouble(3) shouldBe 150.0 // interpolated median of {100, 200}
    r.getDouble(4) shouldBe 190.0 // p90 = 100 + 0.9*100
    r.getDouble(5) shouldBe 200.0
  }

  test("topPaths: ordered n-step sequences, incomplete tails dropped") {
    val events = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (101L, 1L, ts("2024-01-01 10:01:00"), "b"),
      (102L, 1L, ts("2024-01-01 10:02:00"), "c"),
      (103L, 1L, ts("2024-01-01 10:03:00"), "a"),   // paths: a>b>c, b>c>a
      (104L, 2L, ts("2024-01-01 10:00:00"), "a"),
      (105L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (106L, 2L, ts("2024-01-01 10:02:00"), "c"))   // path: a>b>c
      .toDF("event_id", "user_id", "ts", "event_type")
    val rows = graft.operators.EventAnalytics.topPaths(events,
        "user_id", "ts", "event_type", "event_id", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.toSeq shouldBe Seq(("a > b > c", 2L), ("b > c > a", 1L))
  }

  test("cohortRetention: first-activity cohorts by day offset") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 23:00:00"), "click"), // same day, one cell
      (1L, ts("2024-01-03 10:00:00"), "view"),
      (2L, ts("2024-01-02 10:00:00"), "view"),
      (2L, ts("2024-01-02 11:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val cells = EventAnalytics.cohortRetention(events, "user_id", "ts")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    cells shouldBe Map(
      ("2024-01-01", 0) -> 1L,
      ("2024-01-01", 2) -> 1L,
      ("2024-01-02", 0) -> 1L)
  }
}
