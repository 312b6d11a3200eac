package graft

import graft.sinks.{AvroBinary, InMemorySchemaRegistry, SchemaRegistry}
import graft.sinks.AvroBinary.DarkpoolTrade

/** Schema-Registry resolution semantics (ref darkpool_trades/
  * basic.py:87-110,136-157,229-239): subject/version/id bookkeeping,
  * topic-prefix subject matching, and the producer/consumer framing
  * compositions. Transport (REST + auth) is out of zero-egress scope;
  * these pin the resolution contract the pipeline depends on.
  */
class RegistrySpec extends SparkSpec {

  private val schemaV1 = """{"type":"record","name":"T","fields":[]}"""
  private val schemaV2 = """{"type":"record","name":"T","fields":[{"name":"x","type":"long"}]}"""

  test("register assigns global ids and per-subject versions; re-registering a schema is idempotent") {
    val reg = new InMemorySchemaRegistry
    val a1 = reg.register("darkpool-trades-value", schemaV1)
    val b1 = reg.register("news-value", schemaV1)
    val a2 = reg.register("darkpool-trades-value", schemaV2)
    // ids are CONTENT-global (Confluent semantics): the same schema
    // text under a second subject reuses the id; new text gets the
    // next id
    Seq(a1.schemaId, b1.schemaId, a2.schemaId) shouldBe Seq(1, 1, 2)
    // versions are per subject
    a1.version shouldBe 1
    b1.version shouldBe 1
    a2.version shouldBe 2
    reg.versions("darkpool-trades-value") shouldBe Seq(1, 2)
    // same (subject, schema) again -> the EXISTING entry, no new version
    reg.register("darkpool-trades-value", schemaV1) shouldBe a1
    reg.versions("darkpool-trades-value") shouldBe Seq(1, 2)
  }

  test("latest-version and id lookups resolve; unknown subject/id throw like the reference's ValueError") {
    val reg = new InMemorySchemaRegistry
    reg.register("darkpool-trades-value", schemaV1)
    val latest = reg.register("darkpool-trades-value", schemaV2)
    reg.latestVersion("darkpool-trades-value") shouldBe latest
    reg.schemaById(latest.schemaId) shouldBe schemaV2
    a[NoSuchElementException] should be thrownBy reg.latestVersion("nope")
    a[NoSuchElementException] should be thrownBy reg.schemaById(99)
  }

  test("topic resolution: first subject with the topic prefix wins; no match throws (basic.py:100-110)") {
    val reg = new InMemorySchemaRegistry
    reg.register("other-value", schemaV1)
    reg.register("darkpool-trades-value", schemaV1)
    val v2 = reg.register("darkpool-trades-value", schemaV2)
    // prefix match on the TOPIC name resolves the -value subject
    SchemaRegistry.latestSchemaForTopic(reg, "darkpool-trades") shouldBe v2
    a[NoSuchElementException] should be thrownBy
      SchemaRegistry.latestSchemaForTopic(reg, "missing-topic")
  }

  test("producer/consumer composition: encodeFramedLatest embeds the resolved id; decodeFramedChecked round-trips and rejects unknown ids") {
    val spark = this.spark
    import spark.implicits._
    val reg = new InMemorySchemaRegistry
    reg.register("darkpool-trades-value", schemaV1)
    val latest = reg.register("darkpool-trades-value", schemaV2)

    val trades = Seq(
      DarkpoolTrade(1700000000001L, "AAPL", "189.4500", 300, "189.4700", 200,
        "189.4600", 500, "94723.0000", "B", 0.75f, "D"),
      DarkpoolTrade(1700000000002L, "MSFT", "411.0000", 100, "411.0500", 150,
        "411.0200", 250, "102755.5000", "S", 0.5f, "D")).toDS()

    val framed = SchemaRegistry.encodeFramedLatest(trades, reg, "darkpool-trades")
    // every frame embeds the LATEST version's registry-wide id
    import org.apache.spark.sql.functions._
    val ids = framed.toDF("framed")
      .select(graft.sinks.ConfluentFraming.unframe(col("framed"))
        .getField("schema_id").as("id"))
      .distinct().collect().map(_.getInt(0)).toSeq
    ids shouldBe Seq(latest.schemaId)

    val decoded = SchemaRegistry.decodeFramedChecked(spark, framed, reg)
      .collect().sortBy(_.ts)
    decoded shouldBe trades.collect().sortBy(_.ts)

    // a registry that never saw that id refuses the stream — the check
    // rides the decode pass (one scan), so it surfaces at action time
    val stranger = new InMemorySchemaRegistry
    stranger.register("darkpool-trades-value", schemaV1) // id 1 only
    val ex = intercept[Exception] {
      SchemaRegistry.decodeFramedChecked(spark, framed, stranger).collect()
    }
    // executor exceptions arrive wrapped (SparkException -> cause chain)
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
      .mkString("; ")
    msgs should include("Unknown schema id")
  }
}
