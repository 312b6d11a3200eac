package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** events with the canonical event-time column: `ts` is rewritten from
    * the raw nanosecond long to a microsecond TimestampType by truncation
    * — bit-identical to what DuckDB v1 sees when it reads the same file
    * (SURVEY.md §7 hard part 6). The raw long survives as `ts_ns`.
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", graft.functions.nsToTimestamp(col("ts_ns")))
}
