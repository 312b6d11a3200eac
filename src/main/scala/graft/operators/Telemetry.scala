package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Batch query planner for the reference's Telemetry Query API contract
  * (ref dashboard/src/Models/getParameterDataRequest.ts:17-50,
  * getDataRequestBase.ts:14-33, tagFilter.ts:17-27,
  * groupByTimeSettings.ts:17-23, numericAggregationType.ts:16,
  * ordering.ts:17-23, paging.ts:13-22).
  *
  * A request is compiled into ONE declarative DataFrame so Catalyst sees
  * the whole plan: filters push to the parquet scan, the bucket+tag
  * group-by is a single partial+final hash aggregate, and paging rides on
  * the global sort. Input is the long/narrow telemetry shape:
  * `(ts: timestamp, stream_id: long, tags: map<string,string>,
  * <numeric value columns>)`.
  */
object Telemetry {

  /** Tag filter operators (ref tagFilter.ts:17-27, tagOperator.ts:16).
    * A multi-valued Equal is an implicit IN; NotEqual an implicit NOT IN.
    */
  sealed trait TagOp
  case object TagEqual    extends TagOp
  case object TagNotEqual extends TagOp
  case object TagLike     extends TagOp
  case object TagNotLike  extends TagOp
  final case class TagFilter(key: String, op: TagOp, values: Seq[String])

  /** The 10-item numeric aggregation menu
    * (ref numericAggregationType.ts:16). `AggNone` = raw points.
    */
  sealed trait AggType
  case object AggNone   extends AggType
  case object AggMean   extends AggType
  case object AggMax    extends AggType
  case object AggMin    extends AggType
  case object AggFirst  extends AggType
  case object AggLast   extends AggType
  case object AggSum    extends AggType
  case object AggCount  extends AggType
  case object AggMedian extends AggType
  case object AggSpread extends AggType
  final case class NumericAgg(column: String, agg: AggType, as: String)

  /** String/binary/event aggregation menu: None, First, Last, Count
    * (ref aggregationType.ts:16, eventDataAggregationType.ts:16 — the
    * event flavor A6 shares the same three aggregations over an
    * interval, ref eventDataAggregation.ts:18-25).
    */
  sealed trait StrAggType
  case object StrNone  extends StrAggType
  case object StrFirst extends StrAggType
  case object StrLast  extends StrAggType
  case object StrCount extends StrAggType
  final case class StringAgg(column: String, agg: StrAggType, as: String)

  /** Stream-metadata equals-filter (ref metadataFilter.ts:16-25): key
    * must equal value in the `metadata` map column (F6). Falls back to
    * the `tags` map when the points table has no metadata column.
    */
  final case class MetadataFilter(key: String, value: String)

  final case class Ordering(by: String, descending: Boolean = false)
  /** Paging {index, length} (ref paging.ts:13-22). */
  final case class Paging(index: Int, length: Int)

  /** GetParameterDataRequest analog. `from`/`to` are inclusive/exclusive
    * ISO timestamps; `bucketNs` the time-bucket duration in NANOSECONDS
    * (the contract's unit — ref groupByTimeSettings.ts:17-23);
    * `groupByTags` the tag keys to group by alongside the time bucket
    * (ref getParameterDataRequest.ts:21-25). `fromNs`/`toNs` are EXACT
    * nanosecond bounds (set by [[snippetRequest]] — the snippet
    * contract is ns, ref dataSnippet.ts:13-49): on tables carrying the
    * raw `ts_ns` long they take precedence over the necessarily-rounded
    * ISO µs bounds, so sub-µs precision is never lost to the rounding.
    *
    * `interpolation` is the `groupByTimeSettings.interpolationType` knob
    * (ref groupByTimeSettings.ts:17-23, interpolationType.ts:16): one
    * request = bucket + interpolation, so it requires `bucketNs` and an
    * aggregating request — after the group-by the bucket grid is
    * densified per tag group and every NUMERIC aggregate column is
    * filled per the mode (string/event aggregates stay null on
    * generated rows). `None` here = the contract's
    * `InterpolationType.None`: sparse buckets pass through untouched.
    */
  final case class Request(
      from: Option[String]              = None,
      to: Option[String]                = None,
      fromNs: Option[Long]              = None,
      toNs: Option[Long]                = None,
      streamIds: Seq[Long]              = Nil,
      tagFilters: Seq[TagFilter]        = Nil,
      metadataFilters: Seq[MetadataFilter] = Nil,
      bucketNs: Option[Long]            = None,
      groupByTags: Seq[String]          = Nil,
      aggs: Seq[NumericAgg]             = Nil,
      stringAggs: Seq[StringAgg]        = Nil,
      interpolation: Option[GapFill.Interpolation] = None,
      orderBy: Seq[Ordering]            = Nil,
      paging: Option[Paging]            = None)

  /** Ceil a nanosecond epoch to the µs grid, overflow-safe across the
    * whole Long range (the naive `floorDiv(n + 999, 1000)` wraps for
    * `n` near Long.MaxValue — a natural "no upper bound" sentinel).
    */
  private[graft] def ceilNsToUs(n: Long): Long =
    Math.floorDiv(n, 1000L) + (if (Math.floorMod(n, 1000L) == 0L) 0L else 1L)

  /** Tolerant driver-side parse of a Request ISO bound (the formats
    * `to_timestamp` accepts under the UTC session: `yyyy-MM-dd[ HH:mm:
    * ss[.SSSSSS]]`) to epoch µs, as UTC. None when unparseable — the
    * caller then simply skips the derived predicate rather than
    * failing the query.
    */
  private[graft] def parseUtcUs(iso: String): Option[Long] = {
    val s = iso.trim
    val attempts: Seq[() => java.time.Instant] = Seq(
      () => java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC),
      () => java.time.LocalDate.parse(s).atStartOfDay
        .toInstant(java.time.ZoneOffset.UTC),
      () => java.time.Instant.parse(s))
    attempts.iterator
      .flatMap(f => scala.util.Try(f()).toOption)
      .nextOption()
      .map(i => Math.addExact(
        Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
  }

  /** Epoch-aligned time bucket: floor(ts to a multiple of the bucket),
    * in pure long arithmetic (`u - pmod(u, b)` — no double division, so
    * exact at any epoch magnitude).
    */
  def timeBucket(ts: Column, bucketNs: Long): Column = {
    val us = bucketNs / 1000L
    val u = unix_micros(ts)
    timestamp_micros(u - pmod(u, lit(us)))
  }

  /** Compile one tag filter to a predicate over the `tags` map column. */
  def tagPredicate(f: TagFilter): Column = {
    val tag = element_at(col("tags"), f.key)
    f.op match {
      case TagEqual =>
        if (f.values.size == 1) tag === f.values.head else tag.isin(f.values: _*)
      case TagNotEqual =>
        if (f.values.size == 1) tag =!= f.values.head else !tag.isin(f.values: _*)
      case TagLike    => f.values.map(tag.like).reduce(_ || _)
      case TagNotLike => f.values.map(v => !tag.like(v)).reduce(_ && _)
    }
  }

  def aggColumn(a: NumericAgg): Column = {
    val c = col(a.column)
    (a.agg match {
      case AggNone   => c // only valid un-aggregated; guarded in plan()
      case AggMean   => davg(c)
      case AggMax    => max(c)
      case AggMin    => min(c)
      case AggFirst  => firstByTime(c, col("ts"))
      case AggLast   => lastByTime(c, col("ts"))
      case AggSum    => dsum(c)
      case AggCount  => count(c)
      case AggMedian => median(c)
      case AggSpread => spread(c)
    }).as(a.as)
  }

  /** Compile one string/event aggregation (A5/A6). The column resolves
    * to a real column when present, else to a tag value. First/Last
    * tie-break on the value itself so engines can never diverge when
    * two events share a timestamp within a bucket.
    */
  def strAggColumn(points: DataFrame, a: StringAgg): Column = {
    val c = if (points.columns.contains(a.column)) col(a.column)
            else element_at(col("tags"), a.column)
    (a.agg match {
      case StrNone  => c
      case StrFirst => min_by(c, struct(col("ts"), c))
      case StrLast  => max_by(c, struct(col("ts"), c))
      case StrCount => count(c)
    }).as(a.as)
  }

  /** Compile the request into a DataFrame over `points`. */
  def plan(points: DataFrame, req: Request): DataFrame = {
    // ---- filter stage (F4/F5/F6): one conjunctive predicate → scan pushdown
    val metaCol =
      if (points.columns.contains("metadata")) "metadata" else "tags"
    // When the raw nanosecond long survives on the table (ts is the
    // DERIVED µs timestamp, so a predicate on it cannot reach the
    // parquet scan), emit an EQUIVALENT predicate on ts_ns too:
    // trunc(ns/1000) >= F_µs ⟺ ns >= F_µs·1000 (truncation is
    // monotone and F has µs precision). That predicate DOES push down
    // (`PushedFilters: GreaterThanOrEqual(ts_ns, …)`), which at 100 TB
    // is the row-group/partition pruning that makes time-range queries
    // scan only the touched time slice.
    val hasRawNs = points.columns.contains("ts_ns")
    def nsOf(iso: String): Column =
      (unix_micros(to_timestamp(lit(iso))) * 1000L)
    val nsPreds =
      if (!hasRawNs) Nil
      else req.fromNs.map(n => col("ts_ns") >= n)
             .orElse(req.from.map(f => col("ts_ns") >= nsOf(f))).toSeq ++
           req.toNs.map(n => col("ts_ns") < n)
             .orElse(req.to.map(t => col("ts_ns") < nsOf(t))).toSeq
    // ts-level twins of the bounds. With exact ns bounds the µs ts
    // predicate must be IMPLIED BY the ns predicate, not stricter:
    // ts = trunc(ts_ns/1000), so `ts_ns >= F` implies
    // `ts >= floor(F/1000)` (floor, NOT ceil — a sub-µs F would
    // otherwise exclude rows the exact ns filter admits) and
    // `ts_ns < T` implies `ts < ceil(T/1000)`. Without a raw ns
    // column the data is µs-grid and the ceil'd bound on both ends is
    // itself exact (grid point p ∈ [F, T) iff ceil(F/1000) ≤ p <
    // ceil(T/1000)).
    val tsFromPred =
      req.fromNs.map { n =>
        val us = if (hasRawNs) Math.floorDiv(n, 1000L) else ceilNsToUs(n)
        col("ts") >= timestamp_micros(lit(us))
      }.orElse(req.from.map(f => col("ts") >= to_timestamp(lit(f))))
    val tsToPred =
      req.toNs.map(n => col("ts") < timestamp_micros(lit(ceilNsToUs(n))))
        .orElse(req.to.map(t => col("ts") < to_timestamp(lit(t))))
    // When the table carries the Scale.writeTimePartitioned layout (a
    // `dt` UTC-day hive partition column), derive the IMPLIED day-range
    // predicate too: ts/ts_ns data filters cannot prune hive
    // directories, so without this the scan lists and opens every
    // day's files. dt = utcDay(ts) is monotone in ts, so
    // `ts >= F ⟹ dt >= utcDay(F)` and `ts < T ⟹ dt <= utcDay(T)`
    // (inclusive on both ends — the bound days are partially covered).
    //
    // CONTRACT — `dt` is a RESERVED column name on planner inputs,
    // exactly like `ts_ns`: it must be the UTC day of ts per
    // Scale.writeTimePartitioned's epochDay definition (floorDiv of
    // epoch µs — NOT a session-timezone to_date). A table carrying an
    // unrelated column named `dt` would get rows near day boundaries
    // silently dropped by these derived predicates — rename such a
    // column before handing the table to plan().
    val hasDt = points.columns.contains("dt")
    // from-bound µs (inclusive) and to-bound µs (EXCLUSIVE, so the last
    // admissible µs is bound−1 — that's what the day is derived from)
    val usFrom: Option[Long] =
      req.fromNs.map(n => Math.floorDiv(n, 1000L))
        .orElse(req.from.flatMap(parseUtcUs))
    val usToExcl: Option[Long] =
      req.toNs.map(ceilNsToUs)
        .orElse(req.to.flatMap(parseUtcUs))
    def utcDay(us: Long): java.sql.Date =
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
        Math.floorDiv(us, 86400000000L)))
    val dtPreds =
      if (!hasDt) Nil
      else usFrom.map(us => col("dt") >= lit(utcDay(us))).toSeq ++
           usToExcl.map(us => col("dt") <= lit(utcDay(us - 1L))).toSeq
    val preds = nsPreds ++ tsFromPred.toSeq ++ tsToPred.toSeq ++ dtPreds ++
      (if (req.streamIds.nonEmpty) Seq(col("stream_id").isin(req.streamIds: _*)) else Nil) ++
      req.tagFilters.map(tagPredicate) ++
      req.metadataFilters.map(m => element_at(col(metaCol), m.key) === m.value)
    val filtered = preds.foldLeft(points)((df, p) => df.filter(p))

    // ---- group-by stage (A7 time bucket + A9 tag dims + A4/A5/A6 menus)
    val wantsAgg = req.aggs.exists(_.agg != AggNone) ||
      req.stringAggs.exists(_.agg != StrNone)
    val grouped =
      if (!wantsAgg) {
        // raw-point fetch (AggNone): project requested columns
        val tagCols = req.groupByTags.map(k => element_at(col("tags"), k).as(k))
        val valCols = req.aggs.map(a => col(a.column).as(a.as)) ++
          req.stringAggs.map(a => strAggColumn(points, a))
        filtered.select(col("ts") +: col("stream_id") +: tagCols ++: valCols: _*)
      } else {
        val bucketCol = req.bucketNs.map(b =>
          timeBucket(col("ts"), b).as("bucket_ts")).toSeq
        val tagCols = req.groupByTags.map(k => element_at(col("tags"), k).as(k))
        val keys = bucketCol ++ tagCols
        val aggCols = req.aggs.filter(_.agg != AggNone).map(aggColumn) ++
          req.stringAggs.filter(_.agg != StrNone).map(strAggColumn(points, _))
        if (keys.isEmpty) filtered.agg(aggCols.head, aggCols.tail: _*)
        else filtered.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
      }

    // ---- interpolation stage (A8, ref groupByTimeSettings.ts:17-23):
    // densify the bucket grid per tag group and fill the numeric
    // aggregate columns. Nested inside groupByTimeSettings in the
    // contract, so requesting it without a time bucket (or without an
    // aggregation for the bucket to act on) is a malformed request —
    // fail fast rather than silently skipping the knob.
    val interpolated = req.interpolation match {
      case None => grouped
      case Some(mode) =>
        require(req.bucketNs.isDefined && wantsAgg,
          "interpolation is a groupByTimeSettings knob: it requires " +
            "bucketNs and at least one aggregation")
        val numCols = req.aggs.filter(_.agg != AggNone).map(_.as)
        GapFill.interpolate(grouped, req.groupByTags, "bucket_ts",
          s"INTERVAL ${req.bucketNs.get / 1000L} MICROSECOND",
          numCols, mode)
    }

    // ---- ordering + paging stage (O1/O2)
    val ordered =
      if (req.orderBy.isEmpty) interpolated
      else interpolated.orderBy(req.orderBy.map(o =>
        if (o.descending) col(o.by).desc else col(o.by).asc): _*)
    req.paging match {
      case Some(Paging(i, len)) => ordered.offset(i * len).limit(len)
      case None                 => ordered
    }
  }

  /** Distinct values of one tag key (A10, ref getTagValuesRequest.ts:14-31). */
  def tagValues(points: DataFrame, key: String): DataFrame =
    points.select(element_at(col("tags"), key).as("value"))
      .filter(col("value").isNotNull).distinct()

  /** A DataSnippet — a named saved slice (streams × [from, to] ns)
    * that expands into a query request
    * (ref dataSnippet.ts:13-49: the saved-query primitive of the API).
    */
  final case class DataSnippet(name: String, streamIds: Seq[Long],
                               fromNs: Long, toNs: Long,
                               numericParameterIds: Seq[String] = Nil,
                               stringParameterIds: Seq[String] = Nil,
                               eventIds: Seq[String] = Nil)

  /** Expand a snippet into a Request; extra knobs (aggs, bucketing)
    * compose on top via `copy`.
    *
    * The snippet contract is ns-precision (ref dataSnippet.ts:13-49)
    * while the Request's ISO bounds — like the ts column — carry µs.
    * The EXACT ns bounds ride along as `fromNs`/`toNs`: on tables with
    * the raw `ts_ns` long, plan() filters `ts_ns >= fromNs AND
    * ts_ns < toNs` directly (true ns semantics, no rounding loss);
    * the ISO strings remain the µs-grid rendering — rounded UP
    * (`ceil(ns/1000)`), which is exact for µs-grid data: a grid point
    * p is in [fromNs, toNs) iff `ceil(fromNs/1000) <= p <
    * ceil(toNs/1000)`. Whole-second truncation here previously
    * admitted up to 1 s of extra leading data and dropped up to 1 s
    * before `to`.
    */
  def snippetRequest(s: DataSnippet): Request = {
    def iso(ns: Long): String = {
      val us = ceilNsToUs(ns) // ceil to the µs grid, overflow-safe
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L)
        .atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
    }
    Request(from = Some(iso(s.fromNs)), to = Some(iso(s.toNs)),
      fromNs = Some(s.fromNs), toNs = Some(s.toNs),
      streamIds = s.streamIds)
  }

  /** GetDataSnippetParameterDataRequest analog (ref
    * getDataSnippetParameterDataRequest.ts:13-31): expand a snippet
    * into a FULL query — the snippet contributes the stream/time scope
    * and its saved parameter/event id lists, the request contributes
    * the knobs. Per the contract, ONE numeric aggregation applies to
    * all of the snippet's numeric parameters and ONE string
    * aggregation to its string parameters and events (each output
    * column keeps its parameter id as its name).
    */
  def snippetDataRequest(s: DataSnippet,
                         tagFilters: Seq[TagFilter] = Nil,
                         bucketNs: Option[Long] = None,
                         numericAgg: AggType = AggNone,
                         stringAgg: StrAggType = StrNone,
                         groupByTags: Seq[String] = Nil): Request = {
    // Mixing a real aggregation on one family with None on the other
    // would make plan() take the group-by branch and silently DROP the
    // None family's saved columns — the snippet's lists define the
    // output, so that must be an error, not a narrower result.
    val anyAgg = numericAgg != AggNone || stringAgg != StrNone
    require(!anyAgg || s.numericParameterIds.nonEmpty ||
        s.stringParameterIds.nonEmpty || s.eventIds.nonEmpty,
      "an aggregation was requested but the snippet saves no parameter or " +
        "event columns — the result would silently degrade to a raw " +
        "full-point fetch with no value columns")
    require(!anyAgg || s.numericParameterIds.isEmpty || numericAgg != AggNone,
      "snippet saves numeric parameters but numericAgg is AggNone while " +
        "stringAgg aggregates — the numeric columns would be dropped")
    require(!anyAgg || (s.stringParameterIds.isEmpty && s.eventIds.isEmpty) ||
        stringAgg != StrNone,
      "snippet saves string parameters/events but stringAgg is StrNone " +
        "while numericAgg aggregates — those columns would be dropped")
    snippetRequest(s).copy(
      tagFilters = tagFilters,
      bucketNs = bucketNs,
      groupByTags = groupByTags,
      aggs = s.numericParameterIds.map(p => NumericAgg(p, numericAgg, p)),
      stringAggs = (s.stringParameterIds ++ s.eventIds)
        .map(p => StringAgg(p, stringAgg, p)))
  }

  /** §3.3 — transpose a query result into the reference's COLUMNAR
    * `ParameterData`/`Data` payload: one row per group carrying
    * `timestamps: array<long ns>` plus parallel per-parameter value
    * arrays, per-tag arrays, string/binary parameter arrays and the
    * event-flavor `events` map (ref parameterData.ts:16-40 /
    * data.ts:16-41 — `{timestamps, numericValues: {param → double[]},
    * stringValues, binaryValues, tagValues, events}`). Each family is
    * its own map column because Spark maps are monomorphic in the value
    * type; `binaryValues` carries raw `array<binary>` here — the
    * base64-string encoding the JSON contract speaks is a serialization
    * concern at the HTTP boundary, not an engine representation.
    *
    * Executed distributed: ONE `array_sort(collect_list(struct))` per
    * group builds the row set in timestamp order, then each output
    * array is a `transform` over it — no driver-side transposition.
    * This is the presentation boundary: the payload for one stream's
    * window is bounded (the API pages it), so a per-group array is the
    * intended shape, not a scale risk.
    */
  def toColumnarResponse(df: DataFrame, tsCol: String,
                         numericCols: Seq[String],
                         tagCols: Seq[String] = Nil,
                         groupBy: Seq[String] = Nil,
                         stringCols: Seq[String] = Nil,
                         binaryCols: Seq[String] = Nil,
                         eventCols: Seq[String] = Nil): DataFrame = {
    val tsNs = df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        unix_micros(col(tsCol)) * 1000L // contract speaks nanoseconds
      case _ => col(tsCol)
    }
    val dataCols = numericCols ++ tagCols ++ stringCols ++ binaryCols ++ eventCols
    val rowStruct = struct(tsNs.as("__ts") +: dataCols.map(col): _*)
    val collected =
      if (groupBy.isEmpty) df.agg(array_sort(collect_list(rowStruct)).as("__rows"))
      else df.groupBy(groupBy.map(col): _*)
        .agg(array_sort(collect_list(rowStruct)).as("__rows"))
    val rows = col("__rows")
    def family(name: String, cols: Seq[String]): Seq[Column] =
      if (cols.isEmpty) Nil
      else Seq(map(cols.flatMap(c =>
        Seq(lit(c), transform(rows, r => r.getField(c)))): _*).as(name))
    val outCols =
      groupBy.map(col) ++
      Seq(transform(rows, r => r.getField("__ts")).as("timestamps")) ++
      family("numericValues", numericCols) ++
      family("tagValues", tagCols) ++
      family("stringValues", stringCols) ++
      family("binaryValues", binaryCols) ++
      family("events", eventCols)
    collected.select(outCols: _*)
  }

  /** The write-back inverse of [[toColumnarResponse]]: a columnar
    * `ParameterData` frame (one row per group with parallel arrays)
    * exploded back to long rows — the `SendParameterData` publish path
    * (ref dashboard/src/services/quix.ts:133-136, App.js:28-38: the
    * dashboard writes columnar frames INTO the topic). `posexplode` on
    * the timestamps array drives the index; every value/tag array is
    * read at the same position, so ragged payloads fail fast (null)
    * rather than silently misalign.
    */
  def fromColumnarResponse(df: DataFrame,
                           numericCols: Seq[String],
                           tagCols: Seq[String] = Nil,
                           groupBy: Seq[String] = Nil,
                           stringCols: Seq[String] = Nil,
                           binaryCols: Seq[String] = Nil,
                           eventCols: Seq[String] = Nil): DataFrame = {
    val families = Seq(
      "numericValues" -> numericCols, "tagValues" -> tagCols,
      "stringValues" -> stringCols, "binaryValues" -> binaryCols,
      "events" -> eventCols).filter(_._2.nonEmpty)
    val exploded = df.select(
      groupBy.map(col) ++ families.map(f => col(f._1)) :+
        posexplode(col("timestamps")).as(Seq("__pos", "__ts")): _*)
    val valueCols = families.flatMap { case (fam, cols) =>
      cols.map(c =>
        element_at(element_at(col(fam), c), col("__pos") + 1).as(c))
    }
    exploded.select(
      groupBy.map(col) ++
        // exact ns→µs truncation — Column./ is double division and
        // epoch-ns exceeds 2^53 (see graft.functions.nsToTimestamp)
        Seq(graft.functions.nsToTimestamp(col("__ts")).as("ts")) ++
        valueCols: _*)
  }
}
