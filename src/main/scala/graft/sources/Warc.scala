package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) record plumbing — the container
  * Common Crawl ships in, i.e. THE ingestion format of a web-scale
  * training-data pipeline. Pure-JVM parsing of the public format, no
  * dependencies, same contract as the other graft decoders
  * ([[graft.operators.Multimodal]]): malformed containers THROW, they
  * are never silently skipped or fabricated.
  *
  * Format (ISO 28500 / WARC 1.0-1.1): records are concatenated; each
  * is a `WARC/1.x\r\n` version line, `Name: value\r\n` headers, a
  * blank `\r\n` line, exactly `Content-Length` bytes of block, and a
  * `\r\n\r\n` record separator.
  *
  * Scale design: a WARC FILE is the unit of parallelism (Common Crawl
  * segments are ~1 GB gzip members) — one task parses one file's
  * byte stream sequentially (records are length-prefixed, so the walk
  * is O(bytes) with no scanning), and files distribute across the
  * cluster. The parse itself is a typed `flatMap`: file payload in,
  * record rows out — no driver involvement, no shuffle.
  */
object Warc {

  /** One parsed record: the standard headers a curation pipeline keys
    * on, the full header map for everything else, and the raw block.
    */
  case class WarcRecord(warc_type: String, target_uri: String,
                        record_id: String, content_type: String,
                        content_length: Long, headers: Map[String, String],
                        body: Array[Byte])

  /** Serialize records into one WARC byte stream (the writer side —
    * also what the specs and the q72 round-trip build fixtures with).
    * Header names follow the spec's canonical casing.
    */
  def writeRecords(records: Seq[(String, String, String, Array[Byte])])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (warcType, uri, recordId, body) =>
      val header = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append(s"WARC-Type: $warcType\r\n")
        .append(s"WARC-Target-URI: $uri\r\n")
        .append(s"WARC-Record-ID: $recordId\r\n")
        .append("Content-Type: text/plain\r\n")
        .append(s"Content-Length: ${body.length}\r\n")
        .append("\r\n")
      out.write(header.toString.getBytes("UTF-8"))
      out.write(body)
      out.write("\r\n\r\n".getBytes("UTF-8"))
    }
    out.toByteArray
  }

  /** Parse one WARC byte stream into its records. Malformed input
    * THROWS (bad version line, missing Content-Length, truncated
    * block, missing separator) — ingestion must fail loudly, not
    * silently drop web pages.
    */
  def parseWarc(payload: Array[Byte]): Seq[WarcRecord] = {
    val records = Seq.newBuilder[WarcRecord]
    var pos = 0
    def line(from: Int): (String, Int) = {
      var i = from
      while (i + 1 < payload.length &&
        !(payload(i) == '\r' && payload(i + 1) == '\n')) i += 1
      require(i + 1 < payload.length,
        s"WARC header line without CRLF at offset $from")
      (new String(payload, from, i - from, "UTF-8"), i + 2)
    }
    while (pos < payload.length) {
      val (version, afterVersion) = line(pos)
      require(version.startsWith("WARC/"),
        s"not a WARC version line at offset $pos: '${version.take(20)}'")
      var p = afterVersion
      var headers = Map.empty[String, String]
      var lastKey: String = null
      var done = false
      while (!done) {
        val (l, next) = line(p)
        p = next
        if (l.isEmpty) done = true
        else if (l.charAt(0) == ' ' || l.charAt(0) == '\t') {
          // folded header continuation (ISO 28500 named fields follow
          // the RFC field grammar): a leading-whitespace line extends
          // the PREVIOUS field's value, joined by a single space —
          // real Common Crawl records use this; it is spec-legal, not
          // malformed. A fold before any field still throws.
          require(lastKey != null,
            s"WARC header continuation with no preceding field: '$l'")
          headers += (lastKey -> (headers(lastKey) + " " + l.trim))
        } else {
          val colon = l.indexOf(':')
          require(colon > 0, s"malformed WARC header '$l'")
          lastKey = l.substring(0, colon).trim.toLowerCase
          headers += (lastKey -> l.substring(colon + 1).trim)
        }
      }
      val len = headers.getOrElse("content-length",
        throw new IllegalArgumentException(
          s"WARC record at $pos has no Content-Length")).toLong
      require(len >= 0,
        s"WARC record at $pos has negative Content-Length: $len")
      // overflow-safe form of `p + len + 4 <= payload.length`: a huge
      // Content-Length must not wrap the Long sum past the bound
      require(len <= payload.length.toLong - p - 4,
        s"WARC block truncated at offset $p (need $len + separator)")
      val body = java.util.Arrays.copyOfRange(payload, p, (p + len).toInt)
      require(payload((p + len).toInt) == '\r' &&
        payload((p + len).toInt + 1) == '\n' &&
        payload((p + len).toInt + 2) == '\r' &&
        payload((p + len).toInt + 3) == '\n',
        s"WARC record separator missing after block at offset ${p + len}")
      records += WarcRecord(
        headers.getOrElse("warc-type", ""),
        headers.getOrElse("warc-target-uri", ""),
        headers.getOrElse("warc-record-id", ""),
        headers.getOrElse("content-type", ""),
        len, headers, body)
      pos = (p + len).toInt + 4
    }
    records.result()
  }

  /** Distributed parse: one row per WARC record from a DataFrame of
    * (file id, file payload) — the typed flatMap shape; a file is the
    * parallelism unit, exactly how Common Crawl segments shard.
    */
  def records(df: DataFrame, idCol: String, payloadCol: String)
      : Dataset[(Long, WarcRecord)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (fileId, payload) =>
        parseWarc(payload).map(r => (fileId, r))
      }
  }
}
