package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary payload handling, stub decode schema,
  * frame sampling, payload-aware repartitioning.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("withMedia: binary payload + typed metadata struct with stable stub fields") {
    val df = Seq((1L, "ABC payload")).toDF("id", "text")
    val out = Multimodal.withMedia(df, "text")
    val row = out.select(
      $"media_meta.n_bytes", $"media_meta.format_id",
      $"media_meta.width", $"media_meta.height", $"media_meta.content_md5")
      .collect()(0)
    row.getInt(0) shouldBe 11           // octet_length("ABC payload")
    row.getInt(1) shouldBe 'A'.toInt    // byte[0] -> format id
    row.getInt(2) shouldBe 'B'.toInt * 16
    row.getInt(3) shouldBe 'C'.toInt * 16
    row.getString(4) should fullyMatch regex "[0-9a-f]{32}"
  }

  test("sampleFrames keeps every k-th frame with its index (the UDTF/generator shape)") {
    val df = Seq((1L, Seq("f0", "f1", "f2", "f3", "f4", "f5").map(_.getBytes)))
      .toDF("id", "frames")
    val out = Multimodal.sampleFrames(df, "frames", every = 2)
    out.select($"frame_idx").collect().map(_.getInt(0)).toSeq shouldBe Seq(0, 2, 4)
    out.columns should contain allOf ("id", "frame_idx", "frame")
    out.columns should not contain "frames"
  }

  test("decodePartitions: mapPartitions batch-decode with pluggable decoder, deterministic stub") {
    val df = Seq((1L, "ABC data"), (2L, "XYZ other")).toDF("id", "text")
      .withColumn("payload", $"text".cast("binary"))
    val out = Multimodal.decodePartitions(df, "id", "payload")
      .collect().sortBy(_.id)
    out.length shouldBe 2
    out(0).format_id shouldBe 'A'.toInt
    out(0).width shouldBe 'B'.toInt * 16
    out(0).n_bytes shouldBe 8L
    out(0).features.length shouldBe 8
    all(out(0).features.toSeq) should (be >= 0.0f and be <= 1.0f)
    // deterministic: same payload -> same features; different -> different
    val again = Multimodal.decodePartitions(df, "id", "payload")
      .collect().sortBy(_.id)
    again(0).features.toSeq shouldBe out(0).features.toSeq
    out(0).features.toSeq should not be out(1).features.toSeq
    // a custom decoder plugs into the same harness
    val custom = Multimodal.decodePartitions(df, "id", "payload",
      (id, p) => Multimodal.DecodedMedia(id, p.length.toLong, 99, 0, 0, Array(1f)))
      .collect()
    all(custom.map(_.format_id).toSeq) shouldBe 99
  }

  test("repartitionForPayloads sizes partitions from rows-per-task") {
    val df = (1L to 100L).toDF("id")
    val out = Multimodal.repartitionForPayloads(df, "id", rowsPerTask = 10, totalRows = 100)
    out.rdd.getNumPartitions shouldBe 10
    out.count() shouldBe 100
  }
}
