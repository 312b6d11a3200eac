package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{GapFill, Telemetry}
import graft.operators.Telemetry._

/** Golden tests for the telemetry query planner: the full aggregation
  * menu, every tag-filter operator, metadata equals-filter (F6), the
  * event-flavor aggregation (A6), tag values (A10), ordering + paging.
  */
class TelemetrySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** 6 points, 2 streams, tags {device, event_type}. */
  private lazy val points: DataFrame = Seq(
    (ts("2024-01-01 10:00:05"), 1L, Map("device" -> "ios", "event_type" -> "click"), 10.0),
    (ts("2024-01-01 10:00:30"), 1L, Map("device" -> "android", "event_type" -> "view"), 20.0),
    (ts("2024-01-01 10:01:10"), 1L, Map("device" -> "ios", "event_type" -> "click"), 40.0),
    (ts("2024-01-01 10:01:45"), 2L, Map("device" -> "web", "event_type" -> "error"), 5.0),
    (ts("2024-01-01 10:02:00"), 2L, Map("device" -> "web", "event_type" -> "click"), 15.0),
    (ts("2024-01-01 10:02:30"), 1L, Map("device" -> "ios", "event_type" -> "view"), 25.0)
  ).toDF("ts", "stream_id", "tags", "value")

  test("A4 full numeric menu over one global group") {
    val out = plan(points, Request(aggs = Seq(
      NumericAgg("value", AggMean, "mean"), NumericAgg("value", AggMax, "max"),
      NumericAgg("value", AggMin, "min"), NumericAgg("value", AggFirst, "first"),
      NumericAgg("value", AggLast, "last"), NumericAgg("value", AggSum, "sum"),
      NumericAgg("value", AggCount, "count"), NumericAgg("value", AggMedian, "median"),
      NumericAgg("value", AggSpread, "spread")))).collect()(0)
    out.getDouble(0) shouldBe (115.0 / 6) +- 1e-9   // mean
    out.getDouble(1) shouldBe 40.0                  // max
    out.getDouble(2) shouldBe 5.0                   // min
    out.getDouble(3) shouldBe 10.0                  // first by time
    out.getDouble(4) shouldBe 25.0                  // last by time
    out.getDouble(5) shouldBe 115.0                 // sum
    out.getLong(6) shouldBe 6L                      // count
    out.getDouble(7) shouldBe 17.5 +- 1e-9          // median of {5,10,15,20,25,40}
    out.getDouble(8) shouldBe 35.0                  // spread
  }

  test("A7 time-bucket down-sampling: 1-minute buckets, epoch-aligned") {
    val out = plan(points, Request(
      bucketNs = Some(60L * 1000000000L),
      aggs = Seq(NumericAgg("value", AggSum, "sum_v")),
      orderBy = Seq(Telemetry.Ordering("bucket_ts"))))
      .collect().map(r => (r.getTimestamp(0).toString, r.getDouble(1)))
    out.toSeq shouldBe Seq(
      ("2024-01-01 10:00:00.0", 30.0),
      ("2024-01-01 10:01:00.0", 45.0),
      ("2024-01-01 10:02:00.0", 40.0))
  }

  test("F4 time-range + stream IN filter") {
    val out = plan(points, Request(
      from = Some("2024-01-01 10:01:00"), to = Some("2024-01-01 10:02:00"),
      streamIds = Seq(1L),
      aggs = Seq(NumericAgg("value", AggCount, "n"))))
      .collect()(0).getLong(0)
    out shouldBe 1L // only the 10:01:10 stream-1 point
  }

  test("F5 all four tag-filter operators") {
    def n(f: TagFilter): Long =
      plan(points, Request(tagFilters = Seq(f),
        aggs = Seq(NumericAgg("value", AggCount, "n")))).collect()(0).getLong(0)
    n(TagFilter("device", TagEqual, Seq("ios"))) shouldBe 3
    n(TagFilter("device", TagEqual, Seq("ios", "web"))) shouldBe 5   // implicit IN
    n(TagFilter("device", TagNotEqual, Seq("ios"))) shouldBe 3
    n(TagFilter("device", TagNotEqual, Seq("ios", "web"))) shouldBe 1
    n(TagFilter("event_type", TagLike, Seq("cl%"))) shouldBe 3
    n(TagFilter("event_type", TagNotLike, Seq("cl%", "vi%"))) shouldBe 1
  }

  test("F6 metadata/tag equals-filter via element_at (ref metadataFilter.ts:16-25)") {
    val out = points.filter(element_at($"tags", "event_type") === "error").count()
    out shouldBe 1
  }

  test("A9 group-by tag dimension alongside time bucket") {
    val out = plan(points, Request(
      bucketNs = Some(3600L * 1000000000L),
      groupByTags = Seq("device"),
      aggs = Seq(NumericAgg("value", AggSum, "sum_v")),
      orderBy = Seq(Telemetry.Ordering("device"))))
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    out.toSeq shouldBe Seq(("android", 20.0), ("ios", 75.0), ("web", 20.0))
  }

  test("A6 event-flavor aggregation: First/Last/Count of a string tag over an interval (ref getEventDataRequest.ts:18-43)") {
    // events are (ts, tag-value) points; aggregate the tag string itself
    val ev = points.select($"ts", $"stream_id",
      element_at($"tags", "event_type").as("etype"))
    val out = ev.groupBy(Telemetry.timeBucket($"ts", 60L * 1000000000L).as("bucket"))
      .agg(
        graft.functions.firstByTime($"etype", $"ts").as("first_event"),
        graft.functions.lastByTime($"etype", $"ts").as("last_event"),
        count($"etype").as("n"))
      .orderBy($"bucket")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    out.toSeq shouldBe Seq(
      ("click", "view", 2L), ("click", "error", 2L), ("click", "view", 2L))
  }

  test("A10 tagValues: distinct values of one tag key (ref getTagValuesRequest.ts:14-31)") {
    val out = Telemetry.tagValues(points, "device")
      .collect().map(_.getString(0)).sorted.toSeq
    out shouldBe Seq("android", "ios", "web")
  }

  test("A5 string-agg menu + F6 metadata filter through the planner") {
    val out = plan(points, Request(
      metadataFilters = Seq(MetadataFilter("device", "ios")),
      stringAggs = Seq(
        StringAgg("event_type", StrFirst, "first_e"),
        StringAgg("event_type", StrLast, "last_e"),
        StringAgg("event_type", StrCount, "n_e")))).collect()(0)
    out.getString(0) shouldBe "click" // 10:00:05
    out.getString(1) shouldBe "view"  // 10:02:30
    out.getLong(2) shouldBe 3L
  }

  test("A6 event aggregation through the planner: per-bucket First/Last/Count of a tag") {
    val out = plan(points, Request(
      bucketNs = Some(60L * 1000000000L),
      stringAggs = Seq(
        StringAgg("event_type", StrFirst, "first_e"),
        StringAgg("event_type", StrCount, "n_e")),
      orderBy = Seq(Telemetry.Ordering("bucket_ts"))))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    out.toSeq shouldBe Seq(("click", 2L), ("click", 2L), ("click", 2L))
  }

  test("O1+O2 ordering + paging: page 1 of length 2 by value desc") {
    val out = plan(points, Request(
      aggs = Seq(NumericAgg("value", AggNone, "v")),
      orderBy = Seq(Telemetry.Ordering("v", descending = true)),
      paging = Some(Paging(1, 2))))
      .collect().map(_.getDouble(2)).toSeq
    out shouldBe Seq(20.0, 15.0) // global order 40,25 | 20,15 | 10,5
  }

  test("§3.3 columnar ParameterData transposition: aligned parallel arrays per group") {
    val out = Telemetry.toColumnarResponse(
      points.withColumn("device", element_at($"tags", "device")),
      "ts", numericCols = Seq("value"), tagCols = Seq("device"),
      groupBy = Seq("stream_id"))
      .orderBy($"stream_id").collect()
    out.length shouldBe 2
    val s1 = out(0)
    s1.getLong(0) shouldBe 1L
    val tss = s1.getSeq[Long](1)
    tss.size shouldBe 4
    tss shouldBe tss.sorted // timestamps ascending
    val nums = s1.getMap[String, Seq[Double]](2)
    nums("value") shouldBe Seq(10.0, 20.0, 40.0, 25.0) // time order
    val tags = s1.getMap[String, Seq[String]](3)
    tags("device") shouldBe Seq("ios", "android", "ios", "ios")
    // arrays are parallel: same length
    nums("value").size shouldBe tss.size
    tags("device").size shouldBe tss.size
  }

  test("§3.3 write-back: fromColumnarResponse inverts toColumnarResponse exactly") {
    val original = points
      .withColumn("device", element_at($"tags", "device"))
      .select($"stream_id", $"ts", $"value", $"device")
    val columnar = Telemetry.toColumnarResponse(original, "ts",
      numericCols = Seq("value"), tagCols = Seq("device"),
      groupBy = Seq("stream_id"))
    val back = Telemetry.fromColumnarResponse(columnar,
      numericCols = Seq("value"), tagCols = Seq("device"),
      groupBy = Seq("stream_id"))
    val a = original.collect().map(_.toSeq).toSet
    val b = back.select($"stream_id", $"ts", $"value", $"device")
      .collect().map(_.toSeq).toSet
    b shouldBe a
    back.count() shouldBe 6
  }

  test("DataSnippet expands to a stream/time-range request (ref dataSnippet.ts:13-49)") {
    val snip = DataSnippet("slice-1", Seq(1L),
      fromNs = 1704103260000000000L, // 2024-01-01 10:01:00 UTC
      toNs = 1704103320000000000L)   // 2024-01-01 10:02:00
    val req = Telemetry.snippetRequest(snip)
      .copy(aggs = Seq(NumericAgg("value", AggCount, "n")))
    plan(points, req).collect()(0).getLong(0) shouldBe 1L // only 10:01:10 stream 1
  }

  test("snippetDataRequest: the snippet's saved parameter/event lists expand with ONE agg each (ref getDataSnippetParameterDataRequest.ts)") {
    // a snippet saving one numeric parameter and one event column; the
    // request supplies bucketing + the single numeric aggregation the
    // contract applies to every saved numeric parameter
    val pts = points.withColumn("ev_kind", element_at($"tags", "event_type"))
    val snip = DataSnippet("daily", Seq(1L),
      fromNs = 1704103200000000000L,  // 10:00:00
      toNs = 1704103320000000000L,    // 10:02:00 (excl)
      numericParameterIds = Seq("value"),
      stringParameterIds = Nil,
      eventIds = Seq("ev_kind"))
    val req = Telemetry.snippetDataRequest(snip,
      bucketNs = Some(60L * 1000000000L),
      numericAgg = AggSum, stringAgg = StrCount)
    val out = plan(pts, req).orderBy($"bucket_ts").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1), r.getLong(2)))
    // stream 1 only: 10:00 bucket has 10+20, 10:01 bucket has 40
    out.toSeq shouldBe Seq(
      ("2024-01-01 10:00:00.0", 30.0, 2L),
      ("2024-01-01 10:01:00.0", 40.0, 1L))
    // a one-sided aggregation would silently drop the other family's
    // saved columns in plan()'s group-by branch — must be rejected
    an[IllegalArgumentException] should be thrownBy
      Telemetry.snippetDataRequest(snip, numericAgg = AggSum) // events saved, StrNone
    an[IllegalArgumentException] should be thrownBy
      Telemetry.snippetDataRequest(snip, stringAgg = StrCount) // numerics saved, AggNone
    // raw fetch (both None) stays legal
    Telemetry.snippetDataRequest(snip).aggs.map(_.agg) shouldBe Seq(AggNone)
    // an aggregation over a snippet that saves NO columns would
    // silently degrade to a raw full-point fetch — must be rejected
    an[IllegalArgumentException] should be thrownBy
      Telemetry.snippetDataRequest(
        DataSnippet("empty", Seq(1L), 0L, 1L), numericAgg = AggSum)
  }

  test("binary parameters run the First/Last/Count menu through the planner (ref parameterAggregation.ts:17-23)") {
    // a BinaryType value column: First/Last tie-break on (ts, bytes) —
    // binary is orderable in Spark, so the same strAggColumn path serves
    // string, tag AND binary parameters
    val bin = points.withColumn("payload", unhex(md5(concat_ws(":",
      unix_micros($"ts"), $"stream_id"))))
    val out = plan(bin, Request(
      groupByTags = Nil,
      stringAggs = Seq(
        StringAgg("payload", StrFirst, "first_payload"),
        StringAgg("payload", StrLast, "last_payload"),
        StringAgg("payload", StrCount, "n_payload")))).collect()(0)
    val firstExpected = bin.orderBy($"ts".asc).select($"payload").collect()(0).getAs[Array[Byte]](0)
    val lastExpected = bin.orderBy($"ts".desc).select($"payload").collect()(0).getAs[Array[Byte]](0)
    out.getAs[Array[Byte]]("first_payload").toSeq shouldBe firstExpected.toSeq
    out.getAs[Array[Byte]]("last_payload").toSeq shouldBe lastExpected.toSeq
    out.getAs[Long]("n_payload") shouldBe 6L
  }

  test("§3.3 columnar payload carries string/binary/events families; round-trips through fromColumnarResponse (ref data.ts:16-41)") {
    val df = points
      .withColumn("note", concat(lit("n-"), $"value".cast("int")))
      .withColumn("blob", unhex(md5($"value".cast("string"))))
      .withColumn("ev_state", element_at($"tags", "event_type"))
      .select($"stream_id", $"ts", $"value", $"note", $"blob", $"ev_state")
    val columnar = Telemetry.toColumnarResponse(df, "ts",
      numericCols = Seq("value"), groupBy = Seq("stream_id"),
      stringCols = Seq("note"), binaryCols = Seq("blob"),
      eventCols = Seq("ev_state"))
    columnar.columns.toSeq shouldBe Seq("stream_id", "timestamps",
      "numericValues", "stringValues", "binaryValues", "events")
    // events map: per-key parallel arrays in timestamp order
    val s1 = columnar.filter($"stream_id" === 1L).collect()(0)
    s1.getMap[String, Seq[String]](s1.fieldIndex("events"))("ev_state") shouldBe
      Seq("click", "view", "click", "view")
    // full inverse
    val back = Telemetry.fromColumnarResponse(columnar,
      numericCols = Seq("value"), groupBy = Seq("stream_id"),
      stringCols = Seq("note"), binaryCols = Seq("blob"),
      eventCols = Seq("ev_state"))
      .select($"stream_id", $"ts", $"value", $"note", $"blob", $"ev_state")
    back.count() shouldBe 6
    val a = df.collect().map(r => r.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x }).toSet
    val b = back.collect().map(r => r.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x }).toSet
    b shouldBe a
  }

  test("snippetRequest keeps sub-second precision: ns bounds round up to the µs grid") {
    // ns-precision bounds (ref dataSnippet.ts is ns); whole-second
    // formatting would admit up to 1s of extra data before `from` and
    // drop up to 1s before `to`.
    val snip = DataSnippet("slice-ns", Seq(1L),
      fromNs = 1704103260123456789L,  // 10:01:00.123456789 → ceil .123457
      toNs   = 1704103321000000000L)  // 10:02:01.000000000 → exact
    val req = Telemetry.snippetRequest(snip)
    req.from shouldBe Some("2024-01-01 10:01:00.123457")
    req.to shouldBe Some("2024-01-01 10:02:01.000000")
    // a µs-aligned bound passes through unchanged (ceil is identity)
    Telemetry.snippetRequest(DataSnippet("a", Nil,
      1704103260123456000L, 1704103260123457000L)).from shouldBe
      Some("2024-01-01 10:01:00.123456")
  }

  test("snippet on a raw-ns table filters with EXACT ns bounds (no µs rounding loss)") {
    // data with true sub-µs precision: three rows inside the same µs.
    // The snippet contract is ns (ref dataSnippet.ts.ts bounds), so
    // bounds that cut through a microsecond must separate these rows —
    // a µs-rounded predicate (ts_ns < ceil(toNs/1000)·1000) would
    // wrongly admit the 750-ns row.
    val baseNs = 1704103260123456000L // 10:01:00.123456 on the µs grid
    val nsRows = Seq(baseNs + 250L, baseNs + 500L, baseNs + 750L,
      baseNs + 2000L)
    val df = nsRows.map { n =>
      (new Timestamp(0), n, 1L, 1.0)
    }.toDF("ts0", "ts_ns", "stream_id", "value")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
      .drop("ts0")
    val req = Telemetry.snippetRequest(
      DataSnippet("ns-slice", Seq(1L), baseNs + 300L, baseNs + 700L))
      .copy(aggs = Seq(NumericAgg("ts_ns", AggNone, "ts_ns")))
    val got = plan(df, req).select($"ts_ns").collect().map(_.getLong(0)).toSeq
    got shouldBe Seq(baseNs + 500L)
    // and the derived µs ts predicate stayed consistent (floor on
    // `from`): a row admitted by the ns bound is never excluded by ts
    val req2 = Telemetry.snippetRequest(
      DataSnippet("ns-slice2", Seq(1L), baseNs + 300L, baseNs + 2100L))
    plan(df, req2).count() shouldBe 3L // +500, +750 (same µs as from) and +2000
  }

  test("snippet ns bounds on a µs-only table keep the ceil'd-grid semantics") {
    // no raw ts_ns column: the best achievable read of a ns range on
    // µs-grid data admits grid point p iff ceil(from/1000) <= p <
    // ceil(to/1000) — a sub-µs `from` must NOT pull in the grid point
    // it truncates to.
    val baseUs = 1704103260123456L
    val df = Seq(baseUs, baseUs + 1, baseUs + 2).map { us =>
      (new Timestamp(0), 1L, 1.0, us)
    }.toDF("ts0", "stream_id", "value", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("ts0")
    // from cuts INSIDE grid point baseUs (ns = baseUs*1000 + 500):
    // baseUs itself is before the ns bound, so it must be excluded
    val req = Telemetry.snippetRequest(DataSnippet("us-slice", Seq(1L),
      baseUs * 1000L + 500L, (baseUs + 2) * 1000L))
      .copy(aggs = Seq(NumericAgg("us", AggNone, "us")))
    plan(df, req).collect().map(_.getAs[Long]("us")).toSeq shouldBe
      Seq(baseUs + 1)
  }

  // sparse per-device minute series for the Request-level interpolation
  // knob (A8 through the planner): ios has a 2-bucket hole, web none
  private lazy val sparse: DataFrame = Seq(
    (ts("2024-01-01 10:00:05"), 1L, Map("device" -> "ios"), 10.0),
    (ts("2024-01-01 10:03:10"), 1L, Map("device" -> "ios"), 40.0),
    (ts("2024-01-01 10:01:30"), 2L, Map("device" -> "web"), 6.0),
    (ts("2024-01-01 10:02:15"), 2L, Map("device" -> "web"), 8.0)
  ).toDF("ts", "stream_id", "tags", "value")

  private def interpReq(mode: Option[GapFill.Interpolation]) = Request(
    bucketNs = Some(60L * 1000000000L),
    groupByTags = Seq("device"),
    aggs = Seq(NumericAgg("value", AggMean, "mv")),
    interpolation = mode,
    orderBy = Seq(Telemetry.Ordering("device"), Telemetry.Ordering("bucket_ts")))

  private def interpRows(mode: Option[GapFill.Interpolation]) =
    plan(sparse, interpReq(mode)).collect().map(r =>
      (r.getString(1), r.getTimestamp(0).toString.stripSuffix(".0").drop(11),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq

  test("A8 planner interpolation: None passes sparse buckets through") {
    interpRows(None) shouldBe Seq(
      ("ios", "10:00:00", Some(10.0)), ("ios", "10:03:00", Some(40.0)),
      ("web", "10:01:00", Some(6.0)), ("web", "10:02:00", Some(8.0)))
  }

  test("A8 planner interpolation: Null densifies the grid per tag group") {
    interpRows(Some(GapFill.FillNull)) shouldBe Seq(
      ("ios", "10:00:00", Some(10.0)), ("ios", "10:01:00", None),
      ("ios", "10:02:00", None), ("ios", "10:03:00", Some(40.0)),
      ("web", "10:01:00", Some(6.0)), ("web", "10:02:00", Some(8.0)))
  }

  test("A8 planner interpolation: Previous carries the last value forward") {
    interpRows(Some(GapFill.FillPrevious)) shouldBe Seq(
      ("ios", "10:00:00", Some(10.0)), ("ios", "10:01:00", Some(10.0)),
      ("ios", "10:02:00", Some(10.0)), ("ios", "10:03:00", Some(40.0)),
      ("web", "10:01:00", Some(6.0)), ("web", "10:02:00", Some(8.0)))
  }

  test("A8 planner interpolation: Linear interpolates across the gap") {
    interpRows(Some(GapFill.FillLinear)) shouldBe Seq(
      ("ios", "10:00:00", Some(10.0)), ("ios", "10:01:00", Some(20.0)),
      ("ios", "10:02:00", Some(30.0)), ("ios", "10:03:00", Some(40.0)),
      ("web", "10:01:00", Some(6.0)), ("web", "10:02:00", Some(8.0)))
  }

  test("A8 interpolation without a time bucket is a malformed request (contract: groupByTimeSettings)") {
    an[IllegalArgumentException] should be thrownBy
      plan(sparse, Request(
        aggs = Seq(NumericAgg("value", AggMean, "mv")),
        interpolation = Some(GapFill.FillNull)))
  }

  test("property: plan() matches a driver-side reference evaluator on random requests (30 trials)") {
    // fuzz the planner's filter/bucket/agg composition: random time
    // ranges, stream subsets, tag filters and bucketed aggregations,
    // checked cell-for-cell against a plain-Scala evaluation of the
    // same request semantics
    val rnd = new scala.util.Random(20260812L)
    val streams = Seq(1L, 2L, 3L)
    val tagVals = Seq("a", "b", "c")
    val baseUs = 1704103200000000L // 2024-01-01 10:00:00 UTC
    val rows = (0 until 200).map { i =>
      (baseUs + rnd.nextInt(600) * 1000000L,   // within 10 minutes
        streams(rnd.nextInt(3)), tagVals(rnd.nextInt(3)),
        (rnd.nextInt(100) + 1).toDouble)
    }
    val df = rows.toDF("ts_us", "stream_id", "k1", "value")
      .select(timestamp_micros($"ts_us").as("ts"), $"stream_id",
        map(lit("k1"), $"k1").as("tags"), $"value")
    def isoOf(us: Long): String =
      java.time.Instant.ofEpochSecond(us / 1000000L)
        .atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    for (_ <- 1 to 30) {
      val fromUs = baseUs + rnd.nextInt(300) * 1000000L
      val toUs = fromUs + (rnd.nextInt(300) + 1) * 1000000L
      val streamSel = streams.filter(_ => rnd.nextBoolean()) match {
        case Nil => streams; case s => s
      }
      val tagSel = if (rnd.nextBoolean()) Some(tagVals(rnd.nextInt(3))) else None
      // round-6: the interpolation knob joins the fuzzed composition
      // (Linear is pinned by its own golden test + the q45 oracle —
      // a double-arithmetic evaluator here would chase ulps)
      val interp = Seq(None, Some(GapFill.FillNull),
        Some(GapFill.FillPrevious))(rnd.nextInt(3))
      val bucketUs = 60000000L
      val req = Request(
        from = Some(isoOf(fromUs)), to = Some(isoOf(toUs)),
        streamIds = streamSel,
        tagFilters = tagSel.map(v => TagFilter("k1", TagEqual, Seq(v))).toList,
        bucketNs = Some(bucketUs * 1000L),
        aggs = Seq(NumericAgg("value", AggSum, "s"),
          NumericAgg("value", AggCount, "n"),
          NumericAgg("value", AggMax, "mx")),
        interpolation = interp)
      def opt[A](r: org.apache.spark.sql.Row, i: Int, get: Int => A): Option[A] =
        if (r.isNullAt(i)) None else Some(get(i))
      val got = plan(df, req).collect()
        .map(r => (r.getTimestamp(0).getTime * 1000L,
          opt(r, 1, r.getDouble), opt(r, 2, r.getLong), opt(r, 3, r.getDouble)))
        .toSet
      val base = rows
        .filter { case (us, sid, k1, _) =>
          us >= fromUs && us < toUs && streamSel.contains(sid) &&
            tagSel.forall(_ == k1) }
        .groupBy { case (us, _, _, _) => us - Math.floorMod(us, bucketUs) }
        .map { case (b, rs) =>
          b -> (rs.map(_._4).sum, rs.size.toLong, rs.map(_._4).max) }
      val expected: Set[(Long, Option[Double], Option[Long], Option[Double])] =
        interp match {
          case _ if base.isEmpty => Set.empty
          case None =>
            base.map { case (b, (s, n, mx)) =>
              (b, Some(s), Some(n), Some(mx)) }.toSet
          case Some(mode) =>
            var lastSeen: Option[(Double, Long, Double)] = None
            (base.keys.min to base.keys.max by bucketUs).map { b =>
              base.get(b) match {
                case Some(v) =>
                  lastSeen = Some(v)
                  (b, Some(v._1), Some(v._2), Some(v._3))
                case None if mode == GapFill.FillPrevious =>
                  (b, lastSeen.map(_._1), lastSeen.map(_._2), lastSeen.map(_._3))
                case None =>
                  (b, None, None, None)
              }
            }.toSet
        }
      withClue(s"from=$fromUs to=$toUs streams=$streamSel tag=$tagSel interp=$interp: ") {
        got shouldBe expected
      }
    }
  }

  test("AggNone raw fetch projects requested tag columns") {
    val out = plan(points, Request(
      groupByTags = Seq("device"),
      aggs = Seq(NumericAgg("value", AggNone, "v"))))
    out.columns.toSeq shouldBe Seq("ts", "stream_id", "device", "v")
    out.count() shouldBe 6
  }
}
