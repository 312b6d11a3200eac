package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Metadata-catalog search — the GetAllStreams/Parameters/Events request
  * family (ref dashboard/src/Models/getAllStreamsRequest.ts:20-69,
  * getAllParametersRequest.ts:19-56, getAllEventsRequest.ts:19-56):
  * Equals / StartsWith (case-insensitive) / Contains (smart-case) /
  * ContainsAny, include+exclude value lists, and naive full-text search
  * across columns. Compiles to one conjunctive predicate → pushdown.
  */
object Catalog {

  sealed trait Match
  final case class Equals(column: String, value: String)            extends Match
  /** case-insensitive Equals (ref getAllDataSnippetsRequest.ts:31-34 —
    * the snippet catalog's streamId match). */
  final case class EqualsCI(column: String, value: String)          extends Match
  final case class StartsWith(column: String, pattern: String)      extends Match
  /** case-SENSITIVE StartsWith (ref getAllLocationsRequest.ts:24-27 —
    * the location-path prefix match, unlike the CI name StartsWith). */
  final case class StartsWithCS(column: String, pattern: String)    extends Match
  /** smart-case: case-sensitive iff the pattern has a capital
    * (ref getAllStreamsRequest.ts:55-58). */
  final case class Contains(column: String, pattern: String)        extends Match
  /** array column overlaps any of the given values. */
  final case class ContainsAny(column: String, values: Seq[String]) extends Match
  final case class Include(column: String, values: Seq[String])     extends Match
  final case class Exclude(column: String, values: Seq[String])     extends Match
  /** naive full-text: smart-case contains across the given columns. */
  final case class Search(columns: Seq[String], pattern: String)    extends Match
  /** hierarchical location-tree subtree match over a '/'-separated
    * path column (ref streamLocation.ts:16-28): the node itself or any
    * descendant — "/a/b" matches "/a/b" and "/a/b/c" but NOT "/a/bc".
    */
  final case class UnderLocation(column: String, path: String)      extends Match

  def compile(m: Match): Column = m match {
    case Equals(c, v)       => col(c) === v
    case EqualsCI(c, v)     => lower(col(c)) === v.toLowerCase(java.util.Locale.ROOT)
    case StartsWith(c, p)   => startsWithCI(col(c), p)
    case StartsWithCS(c, p) => col(c).startsWith(p)
    case Contains(c, p)     => smartCaseContains(col(c), p)
    case ContainsAny(c, vs) => arrays_overlap(col(c), array(vs.map(lit): _*))
    case Include(c, vs)     => col(c).isin(vs: _*)
    case Exclude(c, vs)     => !col(c).isin(vs: _*)
    case Search(cols, p)    => cols.map(c => smartCaseContains(col(c), p)).reduce(_ || _)
    case UnderLocation(c, path) =>
      val norm = if (path.endsWith("/")) path.dropRight(1) else path
      col(c) === norm || col(c).startsWith(norm + "/")
  }

  def search(catalog: DataFrame, filters: Seq[Match]): DataFrame =
    filters.map(compile).reduceOption(_ && _)
      .map(catalog.filter).getOrElse(catalog)

  // ---------------------------------------------------------- enum filters

  /** The 8-state stream-status vocabulary (ref streamStatus.ts:16). */
  val StreamStatuses: Seq[String] = Seq("Open", "Closed", "Aborted",
    "Terminated", "Interrupted", "Deleting", "SoftDeleted", "Idle")

  /** The 6-level event-severity vocabulary (ref eventLevel.ts:16). */
  val EventLevels: Seq[String] = Seq("Trace", "Debug", "Information",
    "Warning", "Error", "Critical")

  private def enumMatch(column: String, values: Seq[String],
                        vocab: Seq[String], include: Boolean): Match = {
    val bad = values.filterNot(vocab.contains)
    require(bad.isEmpty, s"unknown $column value(s): ${bad.mkString(", ")} " +
      s"(vocabulary: ${vocab.mkString(", ")})")
    if (include) Include(column, values) else Exclude(column, values)
  }

  /** Enum-checked include/exclude over the `status` column — rejects
    * values outside the contract's 8-state vocabulary at plan time.
    */
  def statusFilter(values: Seq[String], include: Boolean = true): Match =
    enumMatch("status", values, StreamStatuses, include)

  /** Enum-checked include/exclude over the `level` column — rejects
    * values outside the contract's 6 severities at plan time.
    */
  def levelFilter(values: Seq[String], include: Boolean = true): Match =
    enumMatch("level", values, EventLevels, include)

  /** The 4-type parameter vocabulary (ref parameterType.ts:16). */
  val ParameterTypes: Seq[String] = Seq("Unknown", "Numeric", "String", "Binary")

  /** Enum-checked include/exclude over the parameter `type` column. */
  def parameterTypeFilter(values: Seq[String], include: Boolean = true): Match =
    enumMatch("type", values, ParameterTypes, include)

  /** GetAllLocationsRequest analog (ref getAllLocationsRequest.ts:
    * 16-33) over the stream-location table `(stream_id, location,
    * status, …)`: stream ids are a case-sensitive Equals/IN, location
    * a case-SENSITIVE StartsWith prefix, statuses the enum-checked
    * vocabulary filter.
    */
  def locationFilters(streamIds: Seq[String] = Nil,
                      locationPrefix: Option[String] = None,
                      statuses: Seq[String] = Nil): Seq[Match] =
    (if (streamIds.nonEmpty) Seq(Include("stream_id", streamIds)) else Nil) ++
      locationPrefix.map(p => StartsWithCS("location", p)).toSeq ++
      (if (statuses.nonEmpty) Seq(statusFilter(statuses)) else Nil)

  /** GetAllDataSnippetsRequest analog (ref
    * getAllDataSnippetsRequest.ts:16-40) over a snippet catalog table
    * `(name, parameter_ids: array<string>, event_ids: array<string>,
    * stream_id, …)`: name is a case-INsensitive Contains (the pattern
    * is lowercased, which makes [[smartCaseContains]] fold case),
    * parameter/event ids are case-sensitive ContainsAny, streamId a
    * case-insensitive Equals. Compose with ordering/paging via the
    * standard DataFrame orderBy/offset/limit, as Telemetry.plan does.
    */
  def snippetFilters(name: Option[String] = None,
                     parameterIds: Seq[String] = Nil,
                     eventIds: Seq[String] = Nil,
                     streamId: Option[String] = None): Seq[Match] =
    name.map(n => Contains("name", n.toLowerCase(java.util.Locale.ROOT))).toSeq ++
      (if (parameterIds.nonEmpty) Seq(ContainsAny("parameter_ids", parameterIds)) else Nil) ++
      (if (eventIds.nonEmpty) Seq(ContainsAny("event_ids", eventIds)) else Nil) ++
      streamId.map(sid => EqualsCI("stream_id", sid)).toSeq

  // -------------------------------------------------------------- lineage

  /** Transitive ancestor closure over the stream dimension's `parents`
    * array (ref stream.ts:49-52 — "The stream Ids this session is
    * derived from"): returns `(id, ancestor_id, depth)` with depth 1 =
    * direct parent, each pair at its SHALLOWEST depth. Driver-
    * coordinated iterative BFS of keyed joins — the stream catalog is a
    * dimension table (catalog-scale, not the 100 TB fact path), so a
    * bounded loop of small hash joins is the right plan. The per-round
    * anti-join against already-seen pairs both deduplicates diamond
    * lineages and terminates cycles. The loop stops on its own when
    * the frontier empties; if it is STILL expanding after `maxDepth`
    * rounds the call throws rather than returning a silently-truncated
    * closure (truncation is indistinguishable from completion to the
    * caller).
    *
    * Every round's FRONTIER is cut with an EAGER `localCheckpoint`:
    * the round plan references both the previous frontier and the
    * accumulated closure, so without truncation the logical plan
    * doubles per round and Catalyst analysis goes exponential in depth
    * (observed as a driver-bound hang at depth ≈ 11 on the sf0.1
    * lineage — the standard iterative-algorithm failure mode, same
    * reason GraphX checkpoints). The closure itself stays a lazy UNION
    * of the flat checkpointed frontiers — linear plan depth, and each
    * pair is written to the block manager once (O(E)) instead of
    * re-checkpointing the whole accumulated closure every round
    * (O(E·depth)).
    */
  def ancestors(streams: DataFrame, idCol: String, parentsCol: String,
                maxDepth: Int = 20): DataFrame = {
    val edges = streams
      .select(col(idCol).cast("string").as("id"),
        explode(col(parentsCol)).as("__anc"))
      .select(col("id"), col("__anc").cast("string").as("ancestor_id"))
      .distinct().localCheckpoint(true)
    // Only each round's FRONTIER is checkpointed; the closure is a lazy
    // UNION of those flat checkpointed leaves. That keeps the logical
    // plan linear in depth (≤ maxDepth flat nodes — the exponential
    // blow-up only comes from chaining unTRUNCATED round plans) while
    // writing each pair to the block manager once, not once per
    // remaining round (the previous acc-recheckpointing was O(E·depth)
    // checkpoint volume; this is O(E)).
    var frontier = edges.withColumn("depth", lit(1)).localCheckpoint(true)
    var closure = frontier
    var depth = 1
    var done = false
    while (!done) {
      val next = frontier.select(col("id"), col("ancestor_id").as("__mid"))
        .join(edges.select(col("id").as("__mid"), col("ancestor_id")), "__mid")
        .select(col("id"), col("ancestor_id")).distinct()
        .join(closure.select("id", "ancestor_id"), Seq("id", "ancestor_id"), "left_anti")
        .withColumn("depth", lit(depth + 1))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else if (depth >= maxDepth)
        // Refuse to return a silently-truncated closure (same contract
        // as connectedComponents' convergence guard): a partial result
        // is indistinguishable from a complete one to the caller, and
        // a depth-capped lineage would silently diverge from the
        // unbounded recursive-CTE semantics on deeper hierarchies.
        throw new IllegalStateException(
          s"ancestor closure still expanding after maxDepth=$maxDepth rounds; " +
            "raise maxDepth (the loop stops on its own once the frontier empties)")
      else {
        closure = closure.union(next)
        // periodic compaction: a pure lazy union accumulates one flat
        // checkpointed leaf per round, and the per-round anti-join then
        // scans depth-many small RDDs (32 partitions each) — task count
        // grows quadratically with depth while each task shrinks
        // (measured r5: q36 2.9 → 4.1 s driver after the O(E·depth) →
        // O(E) checkpoint-volume rework). Re-checkpointing the closure
        // every few rounds bounds the union fan-in at K leaves while
        // keeping checkpoint volume O(E·depth/K) — between the r4 and
        // r5 extremes on both axes.
        if (depth % closureCompactEvery == 0)
          closure = closure.localCheckpoint(true)
        frontier = next; depth += 1
      }
    }
    closure
  }

  /** Union fan-in bound for [[ancestors]]' lazy closure (see the
    * periodic-compaction comment in the loop). */
  private val closureCompactEvery = 4

  /** Downward closure — every (id, descendant_id, depth) — derived from
    * [[ancestors]] by swapping the pair (descendant-of is the inverse
    * relation of ancestor-of; ref streamWithChildren.ts:16-18's
    * children tree is the depth-1 slice of this).
    */
  def descendants(streams: DataFrame, idCol: String, parentsCol: String,
                  maxDepth: Int = 20): DataFrame =
    ancestors(streams, idCol, parentsCol, maxDepth)
      .select(col("ancestor_id").as("id"), col("id").as("descendant_id"),
        col("depth"))

  // ------------------------------------------------- stream lifecycle

  /** Soft-delete request (ref deleteStreamRequest.ts:16-24): target
    * streams get status SoftDeleted and a softDeleteAt stamp;
    * hardDelete=true removes the rows instead. `now` is caller-supplied
    * so the transform stays deterministic/replayable.
    */
  def deleteStreams(streams: DataFrame, idCol: String, ids: Seq[String],
                    now: java.sql.Timestamp,
                    hardDelete: Boolean = false): DataFrame = {
    val hit = col(idCol).cast("string").isin(ids: _*)
    if (hardDelete) streams.filter(!hit)
    else streams
      .withColumn("status", when(hit, lit("SoftDeleted")).otherwise(col("status")))
      .withColumn("softDeleteAt", when(hit, lit(now)).otherwise(col("softDeleteAt")))
  }

  /** Restore request (ref restoreStreamRequest.ts:16-19): soft-deleted
    * targets return to Closed with the stamp cleared.
    */
  def restoreStreams(streams: DataFrame, idCol: String, ids: Seq[String]): DataFrame = {
    val hit = col(idCol).cast("string").isin(ids: _*) &&
      col("status") === "SoftDeleted"
    // ONE projection: a second withColumn would re-evaluate `hit`
    // against the already-rewritten status and never clear the stamp
    streams.select(streams.columns.map {
      case "status" => when(hit, lit("Closed")).otherwise(col("status")).as("status")
      case "softDeleteAt" =>
        when(hit, lit(null).cast("timestamp")).otherwise(col("softDeleteAt")).as("softDeleteAt")
      case c => col(c)
    }: _*)
  }

  /** Patch request (ref patchStreamRequest.ts:16-31): set any of name /
    * status / location / metadata on one stream. Enum-checked like
    * [[statusFilter]].
    */
  def patchStream(streams: DataFrame, idCol: String, id: String,
                  name: Option[String] = None,
                  status: Option[String] = None,
                  location: Option[String] = None,
                  metadata: Option[Map[String, String]] = None): DataFrame = {
    status.foreach(s => require(StreamStatuses.contains(s),
      s"unknown status $s (vocabulary: ${StreamStatuses.mkString(", ")})"))
    val hit = col(idCol).cast("string") === id
    def set(df: DataFrame, c: String, v: Column): DataFrame =
      df.withColumn(c, when(hit, v).otherwise(col(c)))
    var out = streams
    name.foreach(v => out = set(out, "name", lit(v)))
    status.foreach(v => out = set(out, "status", lit(v)))
    location.foreach(v => out = set(out, "location", lit(v)))
    metadata.foreach(m => out = set(out, "metadata",
      map(m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)))
    out
  }

  // ---------------------------------------------------------- group trees

  /** Parent path within a '/'-separated hierarchy ("a/b/c" → "a/b",
    * top-level → null) — shared by the parameter-group and event-group
    * trees (ref parameterGroup.ts:17-20, eventGroup.ts:17-20: `path` is
    * the absolute hierarchy path and unique identifier).
    */
  def parentPath(path: Column): Column = {
    val norm = when(length(path) > 1, regexp_replace(path, "/+$", ""))
      .otherwise(path) // strip trailing '/', but leave a bare root "/"
    val parent = regexp_replace(norm, "/[^/]*$", "")
    when(parent === norm || parent === "", lit(null)).otherwise(parent)
  }

  /** Attach `childrenCount` — the number of DIRECT child groups — to a
    * group dimension (ref parameterGroup.ts:37-40 / eventGroup.ts:37-40)
    * via one self-aggregation join on the parent path. Subtree queries
    * over the same tables reuse [[UnderLocation]] on the `path` column
    * (the two group hierarchies and the stream location tree share the
    * '/'-path shape — ref streamLocation.ts:16-28).
    */
  def withChildrenCount(groups: DataFrame, pathCol: String): DataFrame = {
    val counts = groups
      .select(parentPath(col(pathCol)).as(pathCol))
      .filter(col(pathCol).isNotNull)
      .groupBy(pathCol).agg(count(lit(1)).as("childrenCount"))
    groups.join(counts, Seq(pathCol), "left")
      .withColumn("childrenCount", coalesce(col("childrenCount"), lit(0L)))
  }
}
