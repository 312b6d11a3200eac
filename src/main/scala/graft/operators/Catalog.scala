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
  final case class StartsWith(column: String, pattern: String)      extends Match
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
    case StartsWith(c, p)   => startsWithCI(col(c), p)
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
}
