package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins [[Tables.events]] against every physical `ts` encoding the driver's
  * generator has produced, so the next testdata regeneration fails here in
  * `sbt test` — not 30 queries deep in the driver's correctness gate
  * (round-8 incident: TIMESTAMP(NANOS) → TIMESTAMP_NTZ(µs) switch broke
  * every events-family query at analysis time).
  *
  * Encodings covered:
  *   - ns-epoch long (what `nanosAsLong` yields for parquet TIMESTAMP(NANOS))
  *   - TIMESTAMP_NTZ µs (the post-2026-08-13 generator output)
  *   - TIMESTAMP (UTC-adjusted) µs (the third plausible writer choice)
  *
  * All three must load to an identical logical table: same schema, same
  * column order, same values. A fourth case pins the fail-fast contract for
  * an unsupported physical type.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one event at an instant with non-zero µs so truncation bugs can't hide,
  // one at an exact second boundary, one pre-epoch-day to catch tz drift
  private val microInstants = Seq(
    (1L, 1700000000123456L, 10L, "click", 1.5, "{}"),
    (2L, 1700000100000000L, 11L, "view", 2.5, "{}"),
    (3L, 43200000000L, 12L, "click", 3.5, "{}"))

  private def writeFixture(encode: DataFrame => DataFrame): String = {
    val dir = Files.createTempDirectory("tables-spec-").toString
    val base = microInstants
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    encode(base).write.parquet(s"$dir/events.parquet")
    dir
  }

  private val asNsLong = writeFixture(
    _.withColumn("ts", $"ts_us" * 1000L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props"))
  private val asNtz = writeFixture(
    _.withColumn("ts", timestamp_micros($"ts_us").cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props"))
  private val asLtz = writeFixture(
    _.withColumn("ts", timestamp_micros($"ts_us"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props"))

  private def loaded(dir: String): DataFrame = Tables.events(spark, dir)

  test("all three ts encodings load to one logical schema, in one order") {
    for (dir <- Seq(asNsLong, asNtz, asLtz)) {
      val df = loaded(dir)
      df.columns.toSeq shouldBe Seq(
        "event_id", "ts_ns", "user_id", "event_type", "value", "props", "ts")
      df.schema("ts_ns").dataType shouldBe LongType
      df.schema("ts").dataType shouldBe TimestampType
    }
  }

  test("values are encoding-independent (ns long ≡ ntz µs ≡ ltz µs)") {
    val Seq(a, b, c) = Seq(asNsLong, asNtz, asLtz)
      .map(d => rowsOf(loaded(d).orderBy("event_id")))
    a shouldBe b
    b shouldBe c
    // and the canonical columns carry the values the fixture encoded
    val byId = loaded(asNtz).orderBy("event_id")
      .select($"ts_ns", unix_micros($"ts")).as[(Long, Long)].collect()
    byId.map(_._1).toSeq shouldBe microInstants.map(_._2 * 1000L)
    byId.map(_._2).toSeq shouldBe microInstants.map(_._2)
  }

  test("a ts_ns consumer (time-bucket agg) agrees across encodings") {
    // Telemetry's down-sampler consumes ts_ns directly — the path the
    // round-8 break killed first (operators/Telemetry.scala bucketing).
    def bucketed(dir: String): Seq[Seq[Any]] = rowsOf(
      loaded(dir)
        .groupBy((($"ts_ns" / 60000000000L).cast(LongType)).as("bucket"))
        .agg(sum($"value").as("v"), count(lit(1)).as("n"))
        .orderBy("bucket"))
    bucketed(asNsLong) shouldBe bucketed(asNtz)
    bucketed(asNsLong) shouldBe bucketed(asLtz)
  }

  test("time-range predicates reach the parquet scan under BOTH encodings") {
    // the 100 TB property behind Telemetry's twin-predicate design
    // (operators/Telemetry.scala plan()): whatever the generator's
    // encoding, ONE of the canonical columns is (a cast of) the physical
    // column and its bound must appear in PushedFilters — that is the
    // row-group/partition pruning that keeps a time-slice query from
    // scanning the whole table. Spark unwraps the NTZ→LTZ cast under the
    // fixed-UTC session, so the µs encoding pushes through `ts`; the
    // ns-long encoding pushes through `ts_ns`.
    def pushed(dir: String): String = {
      val fromUs = 1700000050000000L
      loaded(dir)
        .filter($"ts_ns" >= fromUs * 1000L &&
          $"ts" >= timestamp_micros(lit(fromUs)))
        .agg(count(lit(1)))
        .queryExecution.executedPlan.toString
        .linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    }
    // ns-long path: the rename ts→ts_ns is logical only, so the pushed
    // bound appears under the PHYSICAL name `ts` with the raw ns value
    pushed(asNsLong) should include("GreaterThanOrEqual(ts,1700000050000000000)")
    pushed(asNtz) should include("GreaterThanOrEqual(ts,")
    pushed(asLtz) should include("GreaterThanOrEqual(ts,")
  }

  test("an unsupported ts type fails fast, naming the file") {
    val dir = writeFixture(
      _.withColumn("ts", date_format(timestamp_micros($"ts_us"), "yyyy-MM-dd"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props"))
    val e = intercept[IllegalStateException](loaded(dir).schema)
    e.getMessage should include("unsupported physical type")
    e.getMessage should include(dir)
  }

  test("documents/embeddings loaders pin canonical widths under regenerated physical types") {
    // a regeneration that writes int32 ids, int64 labels, or
    // double-width embeddings must still load to the canonical logical
    // schema (the round-8 events lesson, generalized per VERDICT r8
    // item 8)
    val dir = Files.createTempDirectory("tables-spec-wide-").toString
    Seq((1, "hello world", "en", "src0", 11))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((7, Array(1.0, 2.0), 3L))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val docs = Tables.documents(spark, dir)
    docs.schema("doc_id").dataType shouldBe LongType
    docs.schema("n_chars").dataType shouldBe LongType
    val emb = Tables.embeddings(spark, dir)
    emb.schema("vec_id").dataType shouldBe LongType
    emb.schema("embedding").dataType.simpleString shouldBe "array<float>"
    emb.schema("label").dataType.simpleString shouldBe "int"
    emb.select($"embedding").collect()(0).getSeq[Float](0) shouldBe Seq(1.0f, 2.0f)
  }
}
