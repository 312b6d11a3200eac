package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata star schema + stream tables
  * (see /root/repo/TESTDATA.md). One parquet file per table under
  * `sfDir`. All engine operators take DataFrames, so these are only a
  * convenience for SparkEntry / tests.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark 4 rejects
    // unless read as a raw long (the oracle's DuckDB truncates ns→µs on
    // read; we reproduce that truncation in [[events]]).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** documents/embeddings with their integer/float widths pinned to the
    * canonical logical schema, whatever physical widths a driver
    * regeneration writes (the round-8 lesson generalized, VERDICT r8
    * item 8: events is not the only loader exposed to a regeneration).
    * Casts are no-ops when the file already matches; a column that
    * STOPS being castable fails here, named, not 60 queries deep.
    */
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
      .withColumn("doc_id", col("doc_id").cast(LongType))
      .withColumn("n_chars", col("n_chars").cast(LongType))

  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
      .withColumn("vec_id", col("vec_id").cast(LongType))
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", col("label").cast("int"))

  /** events with the canonical event-time columns, regardless of how the
    * generator encoded `ts` on disk. Two physical encodings have been
    * observed across driver testdata regenerations (SURVEY.md §7 hard
    * part 6):
    *
    *   - TIMESTAMP(NANOS), which Spark 4 only reads as a raw long
    *     (`nanosAsLong`): `ts_ns` = the raw long; `ts` = µs TimestampType
    *     by exact truncation — bit-identical to DuckDB's ns→µs read.
    *   - TIMESTAMP(MICROS) (Spark reads TIMESTAMP_NTZ): `ts` = the value
    *     cast to TimestampType (µs-exact under the session's fixed UTC —
    *     [[GraftConf]]); `ts_ns` = `unix_micros(ts) * 1000`.
    *
    * Both paths yield the same logical schema in the same column order
    * (`ts_ns`: ns-epoch long in the original `ts` slot; `ts`: µs
    * TimestampType appended) and identical values wherever the source
    * resolution allows, so every downstream consumer and every DuckDB
    * twin is encoding-agnostic. Any other physical type fails fast with
    * the observed schema rather than 30 queries deep in analysis.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", graft.functions.nsToTimestamp(col("ts_ns")))
      case TimestampType | TimestampNTZType =>
        val ordered = raw.columns.map(c => if (c == "ts") "ts_ns" else c) :+ "ts"
        raw
          .withColumn("ts_ns",
            unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
          .withColumn("ts", col("ts").cast(TimestampType))
          .select(ordered.map(col).toIndexedSeq: _*)
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other in $d/events.parquet " +
            "(expected TIMESTAMP(NANOS)-as-long or TIMESTAMP[_NTZ])")
    }
  }
}
