package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared column-expression helpers. Everything here is built from
  * codegen'd `org.apache.spark.sql.functions` — no UDFs — so the whole
  * library stays inside whole-stage codegen and is oracle-deterministic.
  */
package object functions {

  /** Order-independent double sum: accumulate exactly in DECIMAL(30,6),
    * round to double once at the end. Double summation is re-association
    * sensitive (Spark's shuffle order differs from any oracle's scan
    * order); this makes `sum` bit-identical across engines while staying
    * a single-pass partial+final hash aggregate. The DuckDB twin is
    * `CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast(DoubleType)

  /** Exact mean built on [[dsum]]; IEEE double division is deterministic.
    * DuckDB twin: `CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / COUNT(x)`.
    */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Conditional sum bucket — the reference's 24-accumulator reducer
    * (ref option_trade_aggs/main.py:85-140) is exactly this shape:
    * `sum(CASE WHEN cond THEN x ELSE 0 END)` with map-side partials.
    */
  def sumWhen(cond: Column, x: Column): Column =
    dsum(when(cond, x).otherwise(lit(0.0)))

  /** Conditional count bucket. */
  def countWhen(cond: Column): Column = count(when(cond, lit(1)))

  /** max(x)-min(x) "Spread" from the telemetry aggregation menu
    * (ref dashboard/src/Models/numericAggregationType.ts:16).
    */
  def spread(c: Column): Column = max(c) - min(c)

  /** Sigmoid mapped to [-1, 1] — side-confidence score
    * (ref darkpool_trades/main.py:80-86). Pure expression, codegen'd.
    */
  def signedSigmoid(x: Column): Column =
    lit(2.0) / (lit(1.0) + exp(-x)) - lit(1.0)

  /** Smart-case Contains from the catalog filter contract: the match is
    * case-sensitive iff the pattern contains a capital letter
    * (ref dashboard/src/Models/getAllStreamsRequest.ts:55-58).
    */
  def smartCaseContains(col: Column, pattern: String): Column =
    if (pattern.exists(_.isUpper)) col.contains(lit(pattern))
    else lower(col).contains(lit(pattern.toLowerCase))

  /** Smart-case StartsWith (same contract as [[smartCaseContains]]). */
  def smartCaseStartsWith(col: Column, pattern: String): Column =
    if (pattern.exists(_.isUpper)) col.startsWith(lit(pattern))
    else lower(col).startsWith(lit(pattern.toLowerCase))
}
