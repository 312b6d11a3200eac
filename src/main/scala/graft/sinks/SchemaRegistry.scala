package graft.sinks

import org.apache.spark.sql.{Dataset, SparkSession}

/** Schema-Registry client SEMANTICS (K2's resolution half), modeled
  * after the reference's Confluent client usage (ref darkpool_trades/
  * basic.py:87-110 and 136-157): a producer resolves the LATEST schema
  * for its topic once at construction — subjects are scanned for the
  * first one whose name starts with the topic, its latest version's
  * schema id goes into every framed message — and a registry-aware
  * consumer resolves the id embedded in each frame back to a schema
  * before deserializing (basic.py:229-239).
  *
  * The sandbox has no network, so the TRANSPORT (REST + basic auth,
  * basic.py:129-132 reads SCHEMA_REGISTRY_URL/AUTH_INFO from the
  * environment) is out of scope by design; what is modeled is the
  * resolution contract the pipeline depends on: subject→versions→id,
  * id→schema, topic-prefix subject matching, and the failure modes
  * (unknown topic, unknown id). Resolution happens DRIVER-SIDE, once
  * per stream — exactly like the reference's producer — so the id is a
  * plan-time constant and no per-row lookup ever ships to executors.
  */
trait SchemaRegistry {

  /** All registered subject names. */
  def subjects: Seq[String]

  /** Version numbers registered under a subject, ascending. */
  def versions(subject: String): Seq[Int]

  /** The newest registered schema under a subject.
    * @throws NoSuchElementException if the subject is unknown.
    */
  def latestVersion(subject: String): RegisteredSchema

  /** The schema text registered under a global schema id.
    * @throws NoSuchElementException if the id is unknown.
    */
  def schemaById(id: Int): String
}

/** One registered (subject, version) entry; `schemaId` is the GLOBAL
  * id the wire format embeds (ids are registry-wide, versions are
  * per-subject — the Confluent split the reference relies on).
  */
final case class RegisteredSchema(subject: String, version: Int,
                                  schemaId: Int, schema: String)

object SchemaRegistry {

  /** Topic → latest schema, with the reference's resolution rule
    * verbatim: the FIRST subject (registration order) whose name
    * starts with the topic wins — Confluent subjects are conventionally
    * `<topic>-value`/`<topic>-key`, which is why prefix matching is the
    * contract (ref basic.py:100-109).
    * @throws NoSuchElementException mirroring the reference's
    *   `ValueError: No schema found for topic` (basic.py:110).
    */
  def latestSchemaForTopic(registry: SchemaRegistry,
                           topic: String): RegisteredSchema =
    registry.subjects.find(_.startsWith(topic))
      .map(registry.latestVersion)
      .getOrElse(throw new NoSuchElementException(
        s"No schema found for topic: $topic"))

  /** Producer-shaped composition: resolve the topic's latest schema id
    * once (driver-side), then Avro-encode + Confluent-frame every
    * record with that id — the exact construction-time resolution the
    * reference producer does (basic.py:136-157 + main.py:19-39).
    */
  def encodeFramedLatest(ds: Dataset[AvroBinary.DarkpoolTrade],
                         registry: SchemaRegistry,
                         topic: String): Dataset[Array[Byte]] = {
    val resolved = latestSchemaForTopic(registry, topic)
    AvroBinary.encodeFramed(ds, resolved.schemaId)
  }

  /** Consumer-shaped composition: check every frame's embedded id
    * against the registry (driver-side lookup of the DISTINCT ids —
    * one tiny action, not a per-row RPC), then decode. Unknown ids
    * throw, mirroring a consumer that cannot fetch the writer schema
    * (basic.py:229-239).
    */
  def decodeFramedChecked(spark: SparkSession,
                          framed: Dataset[Array[Byte]],
                          registry: SchemaRegistry): Dataset[AvroBinary.DarkpoolTrade] = {
    import org.apache.spark.sql.functions._
    val ids = framed.toDF("framed")
      .select(ConfluentFraming.unframe(col("framed")).getField("schema_id"))
      .distinct().collect().map(_.getInt(0))
    ids.foreach(registry.schemaById) // throws on the first unknown id
    AvroBinary.decodeFramed(spark, framed)
  }
}

/** In-memory registry: `register` assigns registry-wide monotonically
  * increasing schema ids and per-subject version numbers — the
  * Confluent id/version split. Same-schema re-registration under a
  * subject returns the existing entry (Confluent idempotency) instead
  * of burning a new version.
  */
final class InMemorySchemaRegistry extends SchemaRegistry {
  private var entries = Vector.empty[RegisteredSchema]
  private var nextId = 1

  def register(subject: String, schema: String): RegisteredSchema =
    synchronized {
      entries.find(e => e.subject == subject && e.schema == schema)
        .getOrElse {
          val version = versions(subject).lastOption.getOrElse(0) + 1
          val e = RegisteredSchema(subject, version, nextId, schema)
          nextId += 1
          entries :+= e
          e
        }
    }

  def subjects: Seq[String] =
    synchronized(entries.map(_.subject).distinct)

  def versions(subject: String): Seq[Int] =
    synchronized(entries.filter(_.subject == subject).map(_.version).sorted)

  def latestVersion(subject: String): RegisteredSchema =
    synchronized {
      val subjectEntries = entries.filter(_.subject == subject)
      if (subjectEntries.isEmpty)
        throw new NoSuchElementException(s"Unknown subject: $subject")
      subjectEntries.maxBy(_.version)
    }

  def schemaById(id: Int): String =
    synchronized {
      entries.find(_.schemaId == id)
        .getOrElse(throw new NoSuchElementException(s"Unknown schema id: $id"))
        .schema
    }
}
