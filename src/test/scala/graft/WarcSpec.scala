package graft

import graft.sources.Warc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class WarcFile(file_id: Long, payload: Array[Byte])

/** WARC container parsing: write→parse round trip, hand-laid fixture,
  * refusal cases, and the distributed flatMap path.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  test("writeRecords -> parseWarc round trip preserves every field and body byte") {
    val recs = Seq(
      ("response", "https://example.com/a", "<urn:uuid:1>",
        "hello world".getBytes("UTF-8")),
      ("response", "https://example.com/b", "<urn:uuid:2>",
        Array[Byte](0, 1, 2, -1, 13, 10, 13, 10, 42)), // binary incl. CRLFCRLF
      ("metadata", "https://example.com/c", "<urn:uuid:3>",
        Array.empty[Byte])
    )
    val parsed = Warc.parseWarc(Warc.writeRecords(recs))
    parsed.length shouldBe 3
    parsed.zip(recs).foreach { case (got, (t, uri, id, body)) =>
      got.warc_type shouldBe t
      got.target_uri shouldBe uri
      got.record_id shouldBe id
      got.content_type shouldBe "text/plain"
      got.content_length shouldBe body.length.toLong
      got.body.toSeq shouldBe body.toSeq // length-prefixed: CRLF inside survives
    }
    parsed.head.headers("warc-target-uri") shouldBe "https://example.com/a"
  }

  test("hand-laid record parses without the writer (independent of writeRecords)") {
    val raw = ("WARC/1.1\r\n" +
      "WARC-Type: conversion\r\n" +
      "WARC-Target-URI: urn:doc:7\r\n" +
      "Content-Length: 3\r\n" +
      "\r\n" +
      "abc\r\n\r\n").getBytes("UTF-8")
    val r = Warc.parseWarc(raw)
    r.length shouldBe 1
    r.head.warc_type shouldBe "conversion"
    r.head.target_uri shouldBe "urn:doc:7"
    new String(r.head.body, "UTF-8") shouldBe "abc"
    r.head.record_id shouldBe "" // absent optional header -> empty
  }

  test("folded header continuations (spec-legal) extend the previous field; fold-first throws") {
    val raw = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://example.com/a\r\n" +
      " very/long/path?q=1\r\n" +      // space-folded continuation
      "Content-Type: text/html;\r\n" +
      "\tcharset=utf-8\r\n" +          // tab-folded continuation
      "Content-Length: 2\r\n" +
      "\r\n" +
      "hi\r\n\r\n").getBytes("UTF-8")
    val r = Warc.parseWarc(raw)
    r.length shouldBe 1
    r.head.target_uri shouldBe "https://example.com/a very/long/path?q=1"
    r.head.content_type shouldBe "text/html; charset=utf-8"
    new String(r.head.body, "UTF-8") shouldBe "hi"
    // a continuation line with no preceding field is still malformed
    an[IllegalArgumentException] should be thrownBy
      Warc.parseWarc(("WARC/1.0\r\n" +
        " orphan-fold\r\n" +
        "Content-Length: 0\r\n\r\n\r\n\r\n").getBytes("UTF-8"))
  }

  test("malformed WARC throws: bad version, no length, truncated block, missing separator") {
    an[IllegalArgumentException] should be thrownBy
      Warc.parseWarc("HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8"))
    an[IllegalArgumentException] should be thrownBy
      Warc.parseWarc("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody".getBytes("UTF-8"))
    val good = Warc.writeRecords(Seq(("response", "u", "i", "12345".getBytes)))
    an[IllegalArgumentException] should be thrownBy
      Warc.parseWarc(good.dropRight(3)) // separator cut
    an[IllegalArgumentException] should be thrownBy
      Warc.parseWarc(good.take(good.length - 8)) // block truncated
  }

  test("records(): distributed parse, one row per record, file id carried") {
    val f0 = Warc.writeRecords(Seq(
      ("response", "urn:doc:1", "<1>", "one".getBytes("UTF-8")),
      ("response", "urn:doc:2", "<2>", "two".getBytes("UTF-8"))))
    val f1 = Warc.writeRecords(Seq(
      ("response", "urn:doc:3", "<3>", "three".getBytes("UTF-8"))))
    val df = Seq((0L, f0), (1L, f1)).toDF("file_id", "payload")
    val got = Warc.records(df, "file_id", "payload")
      .map { case (fid, r) => (fid, r.target_uri, new String(r.body, "UTF-8")) }
      .collect().toSet
    got shouldBe Set((0L, "urn:doc:1", "one"), (0L, "urn:doc:2", "two"),
      (1L, "urn:doc:3", "three"))
  }

  test("records() runs unchanged on a STREAM of segment files (stateless flatMap; stream ≡ batch)") {
    val f0 = Warc.writeRecords(Seq(
      ("response", "urn:doc:1", "<1>", "one".getBytes("UTF-8")),
      ("response", "urn:doc:2", "<2>", "two".getBytes("UTF-8"))))
    val f1 = Warc.writeRecords(Seq(
      ("response", "urn:doc:3", "<3>", "three".getBytes("UTF-8"))))
    val input = MemoryStream[WarcFile](spark)
    input.addData(WarcFile(0L, f0))
    val q = Warc.records(input.toDF(), "file_id", "payload")
      .map { case (fid, r) => (fid, r.target_uri, new String(r.body, "UTF-8")) }
      .toDF("fid", "uri", "body")
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(WarcFile(1L, f1)) // second micro-batch: a new segment
    q.processAllAvailable()
    q.stop()
    val got = spark.table("warc_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    got shouldBe Set((0L, "urn:doc:1", "one"), (0L, "urn:doc:2", "two"),
      (1L, "urn:doc:3", "three"))
  }
}
