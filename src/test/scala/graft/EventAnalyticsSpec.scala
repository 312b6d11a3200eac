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

  test("rollingActiveHll: register-merged estimate tracks the exact window distinct") {
    // 120 users on jan1, users 60..179 on jan2 (union 180), user 500
    // alone on jan5 (its 3-day window reaches back to empty days)
    val events = (
      (0L until 120L).map(u => (u, ts("2024-01-01 10:00:00"))) ++
      (60L until 180L).map(u => (u, ts("2024-01-02 10:00:00"))) ++
      Seq((500L, ts("2024-01-05 10:00:00"))))
      .toDF("user_id", "ts")
      .withColumn("event_type", org.apache.spark.sql.functions.lit("view"))
    val exact = EventAnalytics.rollingActive(events, "user_id", "ts",
        windowDays = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val est = EventAnalytics.rollingActiveHll(events, "user_id", "ts",
        windowDays = 3, p = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // same observed-day anchors as the exact contract
    est.keySet shouldBe exact.keySet
    // p=12 at these cardinalities sits in the linear-counting regime:
    // every day within 2%
    est.foreach { case (day, e) =>
      math.abs(e - exact(day)) / exact(day).toDouble should be < 0.02
    }
    // registers are md5-derived: the estimate is deterministic
    val again = EventAnalytics.rollingActiveHll(events, "user_id", "ts",
        windowDays = 3, p = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    again shouldBe est
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

  test("twoStepTransitions: M-squared of the bigram counts through any middle type") {
    val events = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (11L, 1L, ts("2024-01-01 10:01:00"), "b"),
      (12L, 1L, ts("2024-01-01 10:02:00"), "c"),   // u1: a->b, b->c
      (13L, 2L, ts("2024-01-01 10:00:00"), "a"),
      (14L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (15L, 2L, ts("2024-01-01 10:02:00"), "d"))   // u2: a->b, b->d
      .toDF("event_id", "user_id", "ts", "event_type")
    // bigrams: (a,b)=2, (b,c)=1, (b,d)=1 → two-step: a→c = 2·1,
    // a→d = 2·1 (both through b); no other composable pair
    val rows = graft.operators.EventAnalytics.twoStepTransitions(events,
        "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    rows shouldBe Map(("a", "c") -> 2L, ("a", "d") -> 2L)
  }

  test("hourlyActivityProfile: exact cells, shares sum to 1 per type") {
    val events = Seq(
      (1L, ts("2024-01-01 10:05:00"), "a"),
      (2L, ts("2024-01-01 10:55:00"), "a"),
      (3L, ts("2024-01-01 11:05:00"), "a"),
      (4L, ts("2024-01-02 10:30:00"), "b"))
      .toDF("user_id", "ts", "event_type")
    val rows = graft.operators.EventAnalytics.hourlyActivityProfile(events,
        "ts", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    rows shouldBe Map(
      ("a", 10L) -> ((2L, 2.0 / 3.0)),
      ("a", 11L) -> ((1L, 1.0 / 3.0)),
      ("b", 10L) -> ((1L, 1.0)))
  }

  test("sessionCooccurrenceLift: exact session counts, unordered pairs, lift against independence") {
    val gap = 30L * 60L * 1000000L
    val events = Seq(
      // u1 session 1: {a, b}; u1 session 2 (2h later): {a};
      // u2 session 1: {b, c} — N=3, n_a=2, n_b=2, n_c=1
      (10L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (11L, 1L, ts("2024-01-01 10:05:00"), "b"),
      (12L, 1L, ts("2024-01-01 10:06:00"), "a"), // dup type, same session
      (13L, 1L, ts("2024-01-01 13:00:00"), "a"),
      (14L, 2L, ts("2024-01-01 10:00:00"), "b"),
      (15L, 2L, ts("2024-01-01 10:10:00"), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val rows = graft.operators.EventAnalytics.sessionCooccurrenceLift(
        events, "user_id", "ts", "event_type", "event_id", gap)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    rows shouldBe Map(
      ("a", "b") -> ((1L, 0.75)),  // 1·3/(2·2)
      ("b", "c") -> ((1L, 1.5)))   // 1·3/(2·1)
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

  private def mkEvents(spec: Seq[(Int, Int, String)]) = {
    var id = 0L
    spec.flatMap { case (day, c, et) =>
      (1 to c).map { _ =>
        id += 1
        (id, ts(f"2024-01-$day%02d 10:00:00"), et)
      }
    }.toDF("event_id", "ts", "event_type")
  }

  test("volumeAnomaly: zero-variance null z, spike flag, calendar RANGE window") {
    val events = mkEvents(
      // a: constant 10/day for 8 days -> every trailing window has var 0
      (1 to 8).map(d => (d, 10, "a")) ++
      // c: alternating 9/11 for 7 days, then a 50-event day 8
      ((1 to 7).map(d => (d, if (d % 2 == 1) 9 else 11, "c")) :+ (8, 50, "c")) ++
      // d: sparse days 1, 2, 10 — day 10's trailing CALENDAR window is
      // empty (a ROWS window would wrongly see two trailing rows)
      Seq((1, 5, "d"), (2, 5, "d"), (10, 5, "d")))
    val out = EventAnalytics.volumeAnomaly(events, "ts", "event_type")
    val m = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // a, day 4: trailing = days 1..3, all 10 -> var 0 -> null z, no spike
    val a4 = m(("a", "2024-01-04"))
    a4.getLong(3) shouldBe 3L
    a4.getDouble(4) shouldBe 10.0
    a4.isNullAt(5) shouldBe true
    a4.getBoolean(6) shouldBe false
    // c, day 8: trailing = days 1..7 = 9,11,9,11,9,11,9
    val c8 = m(("c", "2024-01-08"))
    c8.getLong(2) shouldBe 50L
    c8.getLong(3) shouldBe 7L
    val mean = 69.0 / 7.0
    c8.getDouble(4) shouldBe mean
    val varNum = 7L * (4 * 81L + 3 * 121L) - 69L * 69L
    val z = (50.0 - mean) / math.sqrt(varNum.toDouble / (7.0 * 6.0))
    c8.getDouble(5) shouldBe z
    c8.getBoolean(6) shouldBe true
    // d emits nothing: day 1 has 0 trailing days, day 2 has 1, day 10's
    // 7-day calendar window (days 3..9) is empty
    m.keys.count(_._1 == "d") shouldBe 0
  }

  test("interEventGaps: per (entity, type) gaps, cross-type isolation") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-01 10:00:05"), "b"), // interleaved other type
      (3L, ts("2024-01-01 10:00:10"), "a"),
      (4L, ts("2024-01-01 10:00:30"), "a"),
      (5L, ts("2024-01-01 11:00:00"), "a")) // user 2: single -> no gap
      .map { case (id, t, et) => (id, if (id == 5L) 2L else 1L, t, et) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = EventAnalytics.interEventGaps(events, "user_id", "ts",
        "event_type", "event_id")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    a.getLong(1) shouldBe 2L            // gaps 10s, 20s for user 1 only
    a.getDouble(2) shouldBe 15.0        // mean
    a.getDouble(3) shouldBe 15.0        // p50 interpolated
    a.getDouble(4) shouldBe 19.0        // p90 = 10 + 0.9*(20-10)
    a.getDouble(5) shouldBe 20.0        // max
    out.contains("b") shouldBe false    // single event -> no gap row
  }

  test("activityConcentration: uniform Gini 0, whale-dominated Gini, top-decile share") {
    val events =
      ((1 to 4).map(u => (u.toLong, "a", 1)) ++ // 4 users x 1 event
        (1 to 9).map(u => (u.toLong, "b", 1)) :+ (10L, "b", 91))
        .flatMap { case (u, et, c) => (1 to c).map(_ => (u, et)) }
        .toDF("user_id", "event_type")
    val out = EventAnalytics.activityConcentration(events, "user_id",
        "event_type")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    a.getLong(1) shouldBe 4L
    a.getLong(2) shouldBe 4L
    a.getDouble(3) shouldBe 0.0         // perfectly equal
    a.getDouble(4) shouldBe 0.25        // ceil(4/10)=1 top entity of 4
    val b = out("b")
    b.getLong(1) shouldBe 10L
    b.getLong(2) shouldBe 100L
    // sum i*x = 45*1 + 10*91 = 955; gini = (2*955 - 11*100) / (10*100)
    b.getDouble(3) shouldBe 0.81
    b.getDouble(4) shouldBe 0.91        // whale holds 91 of 100
  }

  test("funnelDropoff: per-step reach, conversions, zero-reach null propagation") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:01:00"), "click"),
      (4L, ts("2024-01-01 10:00:00"), "other")) // never enters the funnel
      .toDF("user_id", "ts", "event_type")
    val rows = EventAnalytics.funnelDropoff(events, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase", "refund", "cancel"))
      .collect()
    rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq shouldBe
      Seq((1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L),
        (4L, "refund", 0L), (5L, "cancel", 0L))
    rows(0).getDouble(3) shouldBe 3.0 / 4.0  // step 1 over ALL entities
    rows(1).getDouble(3) shouldBe 2.0 / 3.0
    rows(2).getDouble(3) shouldBe 0.5
    rows(3).getDouble(3) shouldBe 0.0        // 0 of 1
    rows(4).isNullAt(3) shouldBe true        // 0-reach predecessor -> null
    rows.map(_.getDouble(4)).toSeq shouldBe
      Seq(0.75, 0.5, 0.25, 0.0, 0.0)         // conv_from_total
  }

  test("rfmSegments: tercile cells with pinned tie order and exact monetary sums") {
    val events = Seq(
      (1L, ts("2024-01-01 00:01:40"), 10.0), (1L, ts("2024-01-01 00:01:00"), 10.0),
      (1L, ts("2024-01-01 00:00:30"), 10.0),                       // last 100s, f3, m30
      (2L, ts("2024-01-01 00:00:50"), 15.0), (2L, ts("2024-01-01 00:00:20"), 5.0),
      (3L, ts("2024-01-01 00:00:10"), 5.0))
      .toDF("user_id", "ts", "value")
    val cells = EventAnalytics.rfmSegments(events, "user_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    cells shouldBe Map(
      (1L, 1L, 1L) -> 1L,  // u1: most recent, most frequent, highest value
      (2L, 2L, 2L) -> 1L,
      (3L, 3L, 3L) -> 1L)
  }

  test("funnel step deadline: late steps don't advance, equal edge included") {
    val events = Seq(
      // u1: click exactly AT the deadline edge (inclusive) -> advances
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-02 10:00:00"), "click"),
      // u2: click one second past the 1-day deadline -> stuck at view,
      // and the still-later click can't rescue it
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-02 10:00:01"), "click"),
      (2L, ts("2024-01-03 10:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val gap = Some(86400L * 1000000)
    val depths = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click"), gap)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    depths shouldBe Map(1L -> 2, 2L -> 1)
    // without the deadline both complete
    EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .collect().map(_.getInt(1)).toSeq shouldBe Seq(2, 2)
  }

  test("lastTouchAttribution: running last touch, (none), reuse across conversions") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "ad"),
      (2L, 1L, ts("2024-01-01 10:05:00"), "purchase"),  // credits ad
      (3L, 1L, ts("2024-01-01 10:10:00"), "purchase"),  // still ad (no new touch)
      (4L, 2L, ts("2024-01-01 10:00:00"), "purchase"),  // nothing before -> (none)
      (5L, 3L, ts("2024-01-01 10:00:00"), "ad"),
      (6L, 3L, ts("2024-01-01 10:01:00"), "email"),
      (7L, 3L, ts("2024-01-01 10:02:00"), "purchase"))  // last touch = email
      .toDF("event_id", "user_id", "ts", "event_type")
    val rows = EventAnalytics.lastTouchAttribution(events, "user_id", "ts",
        "event_id", "event_type", "purchase")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    rows shouldBe Map(
      "(none)" -> ((1L, 0.25)),
      "ad" -> ((2L, 0.5)),
      "email" -> ((1L, 0.25)))
  }

  test("usageHeatmap: Monday=0 weekday pinning and shares") {
    val events = Seq(
      ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"), // Mon 10h x2
      ts("2024-01-07 23:59:00"))                            // Sun 23h
      .map(Tuple1(_)).toDF("ts")
    val rows = EventAnalytics.usageHeatmap(events, "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    rows shouldBe Map(
      (0L, 10L) -> ((2L, 2.0 / 3.0)),
      (6L, 23L) -> ((1L, 1.0 / 3.0)))
  }

  test("peakConcurrency: overlap peak, touching sessions, midnight carry") {
    val gap = 30L * 60 * 1000000
    val events = Seq(
      // day 1: u1 session 10:00-10:05 overlaps u2 10:02-10:03
      (1L, 1L, ts("2024-01-01 10:00:00")), (2L, 1L, ts("2024-01-01 10:05:00")),
      (3L, 2L, ts("2024-01-01 10:02:00")), (4L, 2L, ts("2024-01-01 10:03:00")),
      // u3 session TOUCHES u1's end exactly: end sorts before start
      (5L, 3L, ts("2024-01-01 10:05:00")), (6L, 3L, ts("2024-01-01 10:20:00")),
      // u4 spans midnight: 23:50 -> 00:10 is one session (20 min gap)
      (7L, 4L, ts("2024-01-02 23:50:00")), (8L, 4L, ts("2024-01-03 00:10:00")))
      .toDF("event_id", "user_id", "ts")
    val rows = EventAnalytics.peakConcurrency(events, "user_id", "ts",
        "event_id", gap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows("2024-01-01") shouldBe 2L  // u1+u2 overlap; u3 never stacks
    rows("2024-01-02") shouldBe 1L  // the midnight session opens
    // day 3 has only u4's close: carry 1 + run -1 = 0 after the
    // transition — matching the global-sweep twin exactly
    rows("2024-01-03") shouldBe 0L
  }

  test("botCandidates: cadence stats, flag thresholds, singles excluded") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")), (2L, 1L, ts("2024-01-01 10:00:02")),
      (3L, 1L, ts("2024-01-01 10:00:06")),            // gaps 2, 4 -> median 3
      (4L, 2L, ts("2024-01-01 10:00:00")), (5L, 2L, ts("2024-01-01 10:01:40")),
      (6L, 3L, ts("2024-01-01 10:00:00")))            // single -> excluded
      .toDF("event_id", "user_id", "ts")
    val rows = EventAnalytics.botCandidates(events, "user_id", "ts",
        "event_id", minEvents = 3, maxMedianGapS = 5.0)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    rows.keySet shouldBe Set(1L, 2L)
    rows(1L) shouldBe ((3L, 2.0, 3.0, true))
    rows(2L) shouldBe ((2L, 100.0, 100.0, false)) // under minEvents
  }

  test("errorRates: daily counts, distinct error users, exact rate") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "error"),
      (1L, ts("2024-01-01 12:00:00"), "error"), // same user twice: 1 distinct
      (2L, ts("2024-01-01 13:00:00"), "click"),
      (1L, ts("2024-01-02 10:00:00"), "error"),
      (2L, ts("2024-01-02 11:00:00"), "error"))
      .toDF("user_id", "ts", "event_type")
    val rows = EventAnalytics.errorRates(events, "ts", "event_type", "user_id")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    rows("2024-01-01") shouldBe ((4L, 2L, 1L, 0.5))
    rows("2024-01-02") shouldBe ((2L, 2L, 2L, 1.0))
  }

  test("funnel maxEventsPerEntity: earliest-events truncation, non-binding cap is a no-op") {
    val events = Seq(
      // hot entity: 5 views, then the click+purchase tail
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "view"),
      (1L, ts("2024-01-01 10:02:00"), "view"),
      (1L, ts("2024-01-01 10:03:00"), "view"),
      (1L, ts("2024-01-01 10:04:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:06:00"), "purchase"),
      // normal entity: completes within any cap >= 3
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:01:00"), "click"),
      (2L, ts("2024-01-01 10:02:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val steps = Seq("view", "click", "purchase")
    def depths(cap: Option[Int]) =
      EventAnalytics.funnel(events, "user_id", "ts", "event_type", steps,
          maxEventsPerEntity = cap)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // cap 5: u1's first 5 events are all views -> truncated to depth 1;
    // u2 (3 events) is untouched
    depths(Some(5)) shouldBe Map(1L -> 1, 2L -> 3)
    // cap 6: the click survives truncation, the purchase does not
    depths(Some(6)) shouldBe Map(1L -> 2, 2L -> 3)
    // cap above every entity's activity: identical to uncapped
    depths(Some(100)) shouldBe depths(None)
    depths(None) shouldBe Map(1L -> 3, 2L -> 3)
  }

  test("funnel cap composes with the step deadline: truncate first, then window the machine") {
    val events = Seq(
      // u1: view, then a click 10 min later (outside a 5-min deadline)
      // and a click 2 min later that the CAP cuts away — order of
      // application matters: cap-then-deadline gives depth 1
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:02:00"), "other"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      // u2: in-cap click within the deadline -> depth 2
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:03:00"), "click"),
      (2L, ts("2024-01-01 10:20:00"), "purchase")) // beyond cap 2
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"),
        maxStepGapUs = Some(5L * 60 * 1000000),
        maxEventsPerEntity = Some(2))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // u1's kept prefix = (view, other): the deadline never even sees
    // the late click; u2's kept prefix = (view, click), click inside
    // the 5-min window, purchase truncated
    out shouldBe Map(1L -> 1, 2L -> 2)
  }

  test("sessionStats: gap splits, duration percentiles, bounce rate") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 10:10:00")), // 10 min: same session
      (3L, 1L, ts("2024-01-01 10:50:00")), // 40 min gap: new session
      (4L, 2L, ts("2024-01-01 09:00:00"))) // single-event user
      .toDF("event_id", "user_id", "ts")
    val r = EventAnalytics.sessionStats(events, "user_id", "ts",
      "event_id", gapMicros = 30L * 60 * 1000000).collect().head
    r.getLong(0) shouldBe 3L                 // sessions
    r.getDouble(1) shouldBe 200.0            // durations 600, 0, 0
    r.getDouble(2) shouldBe 0.0              // p50
    r.getDouble(3) shouldBe 480.0            // p90 = 0 + 0.8*(600-0)
    r.getDouble(4) shouldBe 4.0 / 3.0        // events per session
    r.getDouble(5) shouldBe 2.0 / 3.0        // bounce rate
  }

  // ------------------------------------------- co-occurrence lift

  test("cooccurrenceLift: hand-counted support/confidence/lift over gap sessions") {
    val gap = 30L * 60L * 1000000L
    // u1 session A: {view, click}; u1 session B (2h later): {view};
    // u2 session C: {view, click, purchase}
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:05:00"), 2L, "click"),
      (1L, ts("2024-01-01 12:30:00"), 3L, "view"),
      (2L, ts("2024-01-01 09:00:00"), 4L, "view"),
      (2L, ts("2024-01-01 09:10:00"), 5L, "click"),
      (2L, ts("2024-01-01 09:20:00"), 6L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.cooccurrenceLift(events,
        "user_id", "ts", "event_type", "event_id", gap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // 3 sessions; n_view=3, n_click=2, n_purchase=1
    // pairs: (click,view) in A,C => 2; (click,purchase) in C => 1;
    //        (purchase,view) in C => 1
    got.length shouldBe 3
    val m = got.map(t => (t._1, t._2) -> t).toMap
    val cv = m(("click", "view"))
    cv._3 shouldBe 2L
    cv._4 shouldBe 2.0 / 3.0 +- 1e-9           // support 2/3
    cv._5 shouldBe 1.0 +- 1e-9                 // click => view always
    cv._6 shouldBe (2.0 * 3) / (2 * 3) +- 1e-9 // lift 1
    val cp = m(("click", "purchase"))
    cp._3 shouldBe 1L
    cp._6 shouldBe (1.0 * 3) / (2 * 1) +- 1e-9 // lift 1.5
    val pv = m(("purchase", "view"))
    pv._5 shouldBe 1.0 +- 1e-9                 // purchase => view
    pv._6 shouldBe (1.0 * 3) / (1 * 3) +- 1e-9
  }

  test("cooccurrenceLift is partition-invariant") {
    val gap = 30L * 60L * 1000000L
    val events = (0 until 120).map { i =>
      (i.toLong % 7, ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"),
        i.toLong, Seq("a", "b", "c", "d")(i % 4))
    }.toDF("user_id", "ts", "event_id", "event_type")
    rowsOf(EventAnalytics.cooccurrenceLift(events.repartition(5),
      "user_id", "ts", "event_type", "event_id", gap)) shouldBe
      rowsOf(EventAnalytics.cooccurrenceLift(events.coalesce(1),
        "user_id", "ts", "event_type", "event_id", gap))
  }

  // ------------------------------------------- transition PageRank

  test("transitionPageRank: symmetric 2-cycle is uniform; mass sums to ~1; sink of a biased graph ranks first") {
    // a <-> b, perfectly symmetric: pr must be exactly equal
    val sym = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "a"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "b"),
      (1L, ts("2024-01-01 10:04:00"), 5L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val prSym = EventAnalytics.transitionPageRank(sym,
        "user_id", "ts", "event_type", "event_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    prSym("a") shouldBe prSym("b")
    // total fixed-point mass ≈ 10^12 (floor slack: a few units/round)
    val total = prSym.values.sum
    total should be <= 1000000000000L
    total should be >= 1000000000000L - 1000L
    // every timeline funnels b -> c; c only ever re-enters from itself
    val biased = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "b"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "c"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "c"),
      (2L, ts("2024-01-01 10:00:00"), 4L, "b"),
      (2L, ts("2024-01-01 10:01:00"), 5L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val rows = EventAnalytics.transitionPageRank(biased,
        "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.head._1 shouldBe "c" // ordered pr DESC: the sink leads
  }

  test("transitionPageRank is partition-invariant and validates parameters") {
    val events = (0 until 200).map { i =>
      (i.toLong % 9, ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"),
        i.toLong, Seq("a", "b", "c", "d", "e")(i % 5))
    }.toDF("user_id", "ts", "event_id", "event_type")
    rowsOf(EventAnalytics.transitionPageRank(events.repartition(6),
      "user_id", "ts", "event_type", "event_id")) shouldBe
      rowsOf(EventAnalytics.transitionPageRank(events.coalesce(1),
        "user_id", "ts", "event_type", "event_id"))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.transitionPageRank(events, "user_id", "ts",
        "event_type", "event_id", iters = 0)
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.transitionPageRank(events, "user_id", "ts",
        "event_type", "event_id", dampingPct = 101)
  }

  test("cusumChangepoint: level shift lands on the break day; exact scaled drift") {
    // 6 days at 1/day then 6 days at 5/day: mean 3, the cumulative
    // deviation bottoms out exactly on the last low day (day 6)
    val rows = (1 to 6).flatMap(d => Seq.fill(1)(d)) ++
      (7 to 12).flatMap(d => Seq.fill(5)(d))
    val events = rows.zipWithIndex.map { case (d, i) =>
      (1L, ts(f"2024-01-$d%02d 10:00:00"), i.toLong, "x")
    }.toDF("user_id", "ts", "event_id", "event_type")
    val r = EventAnalytics.cusumChangepoint(events, "ts", "event_type")
      .collect()
    r.length shouldBe 1
    r.head.getAs[String]("cp_day") shouldBe "2024-01-06"
    r.head.getAs[Long]("n_days") shouldBe 12L
    r.head.getAs[Long]("total_events") shouldBe 36L
    r.head.getAs[Int]("cp_index") shouldBe 6
    // drift = n_days*prefix - t*total = 12*6 - 6*36 = -144
    r.head.getAs[Long]("cp_drift_scaled") shouldBe -144L
    r.head.getAs[Double]("cp_drift") shouldBe -12.0
  }

  test("cusumChangepoint: flat series ties break to the earliest day; partition-invariant") {
    val events = (1 to 8).flatMap { d =>
      Seq((1L, ts(f"2024-02-$d%02d 09:00:00"), d.toLong, "a"),
        (1L, ts(f"2024-02-$d%02d 09:01:00"), 100L + d, "a"))
    }.toDF("user_id", "ts", "event_id", "event_type")
    val r = EventAnalytics.cusumChangepoint(events, "ts", "event_type")
      .collect()
    r.head.getAs[String]("cp_day") shouldBe "2024-02-01"
    r.head.getAs[Long]("cp_drift_scaled") shouldBe 0L
    rowsOf(EventAnalytics.cusumChangepoint(events.repartition(5),
      "ts", "event_type")) shouldBe
      rowsOf(EventAnalytics.cusumChangepoint(events.coalesce(1),
        "ts", "event_type"))
  }

  test("eventTrigrams: contiguous windows per entity, dual support, pruning") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "c"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "d"),
      (2L, ts("2024-01-01 11:00:00"), 5L, "a"),
      (2L, ts("2024-01-01 11:01:00"), 6L, "b"),
      (2L, ts("2024-01-01 11:02:00"), 7L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val all = EventAnalytics.eventTrigrams(events, "user_id", "ts",
        "event_type", "event_id", minSupport = 1)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getAs[Long]("n_occurrences"),
        r.getAs[Long]("n_users")))
    all.toSeq shouldBe Seq(("a", "b", "c", 2L, 2L),
      ("b", "c", "d", 1L, 1L))
    // windows never cross entities: no (c,d,?) or (d,a,b) patterns
    all.map(t => (t._1, t._2, t._3)) should not contain ("c", "d", "a")
    EventAnalytics.eventTrigrams(events, "user_id", "ts",
      "event_type", "event_id", minSupport = 2)
      .collect().length shouldBe 1
  }

  test("rollingCorrelation: perfect linear coupling reads exactly 1.0; short/flat windows dropped") {
    // day d carries d events each valued 2.0 → vq = 2000·c, an exact
    // linear map, so every full window must read r = 1.0 EXACTLY (the
    // radicand is a perfect square; sqrt is correctly rounded)
    val events = (1 to 14).flatMap { d =>
      (1 to d).map(i =>
        (1L, ts(f"2024-03-$d%02d 10:${i % 60}%02d:00"),
          (d * 100 + i).toLong, "x", 2.0))
    }.toDF("user_id", "ts", "event_id", "event_type", "value")
    val rows = EventAnalytics.rollingCorrelation(events, "ts",
        "event_type", "value").collect()
    rows.length shouldBe 8 // days 7..14 have full 7-day windows
    rows.foreach(_.getAs[Double]("vol_value_r") shouldBe 1.0)
    rows.map(_.getAs[String]("day")).min shouldBe "2024-03-07"
    // a flat-count series has var_c = 0 → every window dropped
    val flat = (1 to 10).map(d =>
      (1L, ts(f"2024-03-$d%02d 09:00:00"), d.toLong, "y", d.toDouble))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    EventAnalytics.rollingCorrelation(flat, "ts", "event_type",
      "value").collect() shouldBe empty
  }

  test("rollingCorrelation is partition-invariant and validates parameters") {
    val events = (0 until 400).map { i =>
      (i.toLong % 9, ts(f"2024-01-${1 + i % 20}%02d ${i % 24}%02d:00:00"),
        i.toLong, Seq("a", "b")(i % 2), (i % 37).toDouble / 3.0)
    }.toDF("user_id", "ts", "event_id", "event_type", "value")
    rowsOf(EventAnalytics.rollingCorrelation(events.repartition(6),
      "ts", "event_type", "value")) shouldBe
      rowsOf(EventAnalytics.rollingCorrelation(events.coalesce(1),
        "ts", "event_type", "value"))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.rollingCorrelation(events, "ts", "event_type",
        "value", windowDays = 1)
  }

  test("eventTrigrams is partition-invariant") {
    val events = (0 until 120).map { i =>
      (i.toLong % 7, ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"),
        i.toLong, Seq("a", "b", "c")(i % 3))
    }.toDF("user_id", "ts", "event_id", "event_type")
    rowsOf(EventAnalytics.eventTrigrams(events.repartition(6),
      "user_id", "ts", "event_type", "event_id", 1)) shouldBe
      rowsOf(EventAnalytics.eventTrigrams(events.coalesce(1),
        "user_id", "ts", "event_type", "event_id", 1))
  }

  // ------------------------------------------------ power-user curve

  test("powerUserCurve: day-count histogram and >=k cumulative") {
    val events = Seq(
      // u1 active 3 distinct days (two events on day 1 count once)
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-03 10:00:00")),
      // u2, u3 active 1 day each
      (2L, ts("2024-01-01 10:00:00")),
      (3L, ts("2024-01-05 10:00:00")), (3L, ts("2024-01-05 23:00:00")))
      .toDF("user_id", "ts")
    val rows = rowsOf(
      EventAnalytics.powerUserCurve(events, "user_id", "ts"))
    rows shouldBe Seq(Seq(1L, 2L, 3L), Seq(3L, 1L, 1L))
  }

  // ------------------------------------------- daily autocorrelation

  test("dailyAutocorrelation: linear daily series reads exactly 1.0; flat and short series dropped; gaps pair only observed days") {
    // type "a": i events on day i (1..8) — x_t vs x_{t-k} is affine,
    // so every lag's Pearson is EXACTLY 1.0 (integer moments cancel)
    val lin = (1 to 8).flatMap { day =>
      (0 until day).map(j =>
        (ts(f"2024-01-$day%02d 0${j % 9}:00:00"), "a"))
    }
    // type "b": constant 2/day — zero variance, dropped entirely
    val flat = (1 to 8).flatMap { day =>
      Seq((ts(f"2024-01-$day%02d 10:00:00"), "b"),
        (ts(f"2024-01-$day%02d 11:00:00"), "b"))
    }
    val events = (lin ++ flat).toDF("ts", "event_type")
    val out = rowsOf(EventAnalytics.dailyAutocorrelation(
      events, "ts", "event_type", maxLag = 3))
    // lag k over days 1..8 has 8-k observed pairs; type "b" gone
    out shouldBe Seq(
      Seq("a", 1L, 7L, 1.0), Seq("a", 2L, 6L, 1.0), Seq("a", 3L, 5L, 1.0))
  }

  test("dailyAutocorrelation: calendar gap drops the missing pairs; partition-invariant") {
    // type "a" on days 1,2,3 then 7,8 — lag 1 pairs: (2,1),(3,2),(8,7)
    val events = Seq(1, 2, 3, 7, 8).flatMap { day =>
      (0 to day).map(j => (ts(f"2024-01-$day%02d 0${j % 9}:10:00"), "a"))
    }.toDF("ts", "event_type")
    val out = EventAnalytics.dailyAutocorrelation(
      events, "ts", "event_type", maxLag = 1).collect()
    out.length shouldBe 1
    out.head.getLong(2) shouldBe 3L // n_pairs
    rowsOf(EventAnalytics.dailyAutocorrelation(
      events.repartition(5), "ts", "event_type", 2)) shouldBe
      rowsOf(EventAnalytics.dailyAutocorrelation(
        events.coalesce(1), "ts", "event_type", 2))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.dailyAutocorrelation(events, "ts", "event_type", 0)
  }

  // ------------------------------------------- funnel step latency

  test("funnelStepLatency: exact per-pair gaps over the greedy machine; non-converters excluded") {
    val events = Seq(
      // u1: view→click 60s, click→purchase 120s
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:03:00"), "purchase"),
      // u2: view→click 180s, never purchases
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 09:03:00"), "click"),
      // u3: purchase only — contributes nothing
      (3L, ts("2024-01-01 10:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val rows = rowsOf(EventAnalytics.funnelStepLatency(events,
      "user_id", "ts", "event_type", Seq("view", "click", "purchase")))
    rows shouldBe Seq(
      Seq(1, "view", "click", 2L, 60000000L, 180000000L, 120000000.0),
      Seq(2, "click", "purchase", 1L, 120000000L, 120000000L,
        120000000.0))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.funnelStepLatency(events, "user_id", "ts",
        "event_type", Seq("view"))
  }

  // ------------------------------------------- transition impurity

  test("transitionImpurity: hand-counted Gini per source state; pure source reads 0; terminal states absent") {
    val events = Seq(
      // u1: a→b, b→a, a→b ; u2: a→b, b→c
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "a"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "b"),
      (2L, ts("2024-01-01 10:00:00"), 5L, "a"),
      (2L, ts("2024-01-01 10:01:00"), 6L, "b"),
      (2L, ts("2024-01-01 10:02:00"), 7L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val rows = rowsOf(EventAnalytics.transitionImpurity(events,
      "user_id", "ts", "event_type", "event_id"))
    // a: 3 transitions, all →b → impurity 0
    // b: 3 transitions, {a:1, c:1, (u1 ends after b)}: b→a once, b→c
    //    once → N=2, ssq=2 → 1 - 2/4 = 0.5
    // c is terminal: absent
    rows shouldBe Seq(
      Seq("a", 3L, 1L, 0.0),
      Seq("b", 2L, 2L, 0.5))
  }

  test("transitionImpurity is partition-invariant") {
    val events = (0 until 200).map { i =>
      (i.toLong % 9, ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"),
        i.toLong, Seq("a", "b", "c", "d")(i % 4))
    }.toDF("user_id", "ts", "event_id", "event_type")
    rowsOf(EventAnalytics.transitionImpurity(events.repartition(6),
      "user_id", "ts", "event_type", "event_id")) shouldBe
      rowsOf(EventAnalytics.transitionImpurity(events.coalesce(1),
        "user_id", "ts", "event_type", "event_id"))
  }

  // ------------------------------------------- session entry/exit

  test("sessionEntryExit: gap splits sessions, tie order by event_id, single-event diagonal") {
    val gap = 30L * 60L * 1000000L
    val events = Seq(
      // u1 session 1: a ... b (entry a, exit b, 3 events)
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:10:00"), 2L, "c"),
      (1L, ts("2024-01-01 10:20:00"), 3L, "b"),
      // u1 session 2 (>30 min later): single event c → bounce
      (1L, ts("2024-01-01 12:00:00"), 4L, "c"),
      // u2: two events at the SAME ts — event_id breaks the tie
      (2L, ts("2024-01-01 10:00:00"), 6L, "z"),
      (2L, ts("2024-01-01 10:00:00"), 5L, "y"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val rows = rowsOf(EventAnalytics.sessionEntryExit(events,
      "user_id", "ts", "event_type", "event_id", gap))
    rows shouldBe Seq(
      Seq("a", "b", 1L, 0L),
      Seq("c", "c", 1L, 1L),
      Seq("y", "z", 1L, 0L))
  }

  test("sessionEntryExit: exactly-gap boundary stays one session; partition-invariant") {
    val gap = 30L * 60L * 1000000L
    val boundary = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:30:00"), 2L, "b")) // exactly 30 min: same session
      .toDF("user_id", "ts", "event_id", "event_type")
    rowsOf(EventAnalytics.sessionEntryExit(boundary, "user_id", "ts",
      "event_type", "event_id", gap)) shouldBe
      Seq(Seq("a", "b", 1L, 0L))
    val events = (0 until 150).map { i =>
      (i.toLong % 7, ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"),
        i.toLong, Seq("a", "b", "c")(i % 3))
    }.toDF("user_id", "ts", "event_id", "event_type")
    rowsOf(EventAnalytics.sessionEntryExit(events.repartition(6),
      "user_id", "ts", "event_type", "event_id", gap)) shouldBe
      rowsOf(EventAnalytics.sessionEntryExit(events.coalesce(1),
        "user_id", "ts", "event_type", "event_id", gap))
  }
}
