package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata structs. The Spark-side
  * machinery — schema, per-batch shape, partition sizing, metadata
  * extraction, frame sampling — is real; the codec itself is a
  * clearly-marked deterministic STUB (this container ships no
  * image/audio libraries), structured so a real decoder drops in as a
  * `mapPartitions` over the same schema.
  */
object Multimodal {

  /** Wrap a string column as a binary payload column (test harness for
    * the pipeline; production data arrives as parquet `binary`).
    */
  def asBinary(c: Column): Column = c.cast("binary")

  /** STUB decode: parse a fake fixed header from the first bytes of the
    * payload — byte[0] → format id, byte[1] → width/16, byte[2] →
    * height/16 — as pure expressions (hex slice + base conversion).
    * Deterministic stand-in with the exact schema a real image decode
    * (`mapPartitions` + JNI/codec) would produce.
    */
  def fakeDecodeMeta(bin: Column): Column = {
    def byteAt(i: Int): Column =
      conv(hex(substring(bin, i, 1)), 16, 10).cast("int")
    struct(
      octet_length(bin).as("n_bytes"),
      byteAt(1).as("format_id"),
      (byteAt(2) * 16).as("width"),
      (byteAt(3) * 16).as("height"),
      md5(bin).as("content_md5"))
  }

  /** Attach payload + metadata to a DataFrame (media table shape). */
  def withMedia(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("media", asBinary(col(payloadCol)))
      .withColumn("media_meta", fakeDecodeMeta(col("media")))

  /** Decoded-media record: the schema a real image/audio decode
    * produces (the stub fills it deterministically).
    */
  case class DecodedMedia(id: Long, n_bytes: Long, format_id: Int,
                          width: Int, height: Int, features: Array[Float])

  /** The batched-UDF decode harness — Scala's `mapPartitions` analogue
    * of a Pandas `mapInPandas` decode: rows stream through a
    * per-partition function that would hold the codec context (JNI
    * handle, model session) open across the whole batch instead of
    * per row. The decoder is pluggable; [[stubDecoder]] is the
    * clearly-marked deterministic stand-in (no image/audio libs in
    * this container — SURVEY.md stub policy), producing the exact
    * schema and batch shape a real decoder drops into.
    */
  def decodePartitions(df: DataFrame, idCol: String, payloadCol: String,
                       decoder: (Long, Array[Byte]) => DecodedMedia = stubDecoder)
                      : org.apache.spark.sql.Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup happens HERE (codec init, model load);
        // the stub needs none
        rows.map { case (id, payload) => decoder(id, payload) }
      }
  }

  /** STUB decoder: deterministic metadata from the leading bytes (same
    * convention as [[fakeDecodeMeta]]) plus a fake 8-dim feature
    * vector derived from a rolling byte hash — the embedding-extraction
    * shape with a real signature and none of the codec.
    */
  def stubDecoder(id: Long, payload: Array[Byte]): DecodedMedia = {
    def at(i: Int): Int = if (payload.length > i) payload(i) & 0xff else 0
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    val features = Array.tabulate(8) { k =>
      val hk = h ^ (k.toLong * 0x9E3779B97F4A7C15L)
      ((hk >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
    DecodedMedia(id, payload.length.toLong, at(0), at(1) * 16, at(2) * 16, features)
  }

  /** Frame sampling over an array-of-binary column (video → every k-th
    * frame), keeping frame indices: `posexplode` + modulo filter — the
    * generator shape, executed distributed, no driver involvement.
    */
  def sampleFrames(df: DataFrame, framesCol: String, every: Int): DataFrame =
    df.select(col("*"), posexplode(col(framesCol)).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % every === 0)
      .drop(framesCol)

  /** Size-aware repartition for heavy binary rows: target ~`rowsPerTask`
    * rows per task so a 100 MB-payload table doesn't OOM an executor
    * (coarse, deterministic — range on the id keeps ordering stable).
    */
  def repartitionForPayloads(df: DataFrame, idCol: String, rowsPerTask: Long,
                             totalRows: Long): DataFrame = {
    val parts = math.max(1, (totalRows / math.max(1L, rowsPerTask)).toInt)
    df.repartitionByRange(parts, col(idCol))
  }
}
