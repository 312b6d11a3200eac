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

  // ---- real decoders (netpbm / WAV PCM — public formats, no deps) ----

  /** Build a raw P5 (grayscale) payload: header + raster. */
  private def p5(width: Int, height: Int, maxval: Int,
                 raster: Array[Byte], comment: Option[String] = None): Array[Byte] = {
    val c = comment.map(t => s"# $t\n").getOrElse("")
    s"P5\n$c$width $height\n$maxval\n".getBytes("US-ASCII") ++ raster
  }

  /** Build a 16-bit PCM WAV payload from samples (LE throughout). */
  private def wav(channels: Int, sampleRate: Int,
                  samples: Array[Short]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    val dataLen = samples.length * 2
    out.write("RIFF".getBytes("US-ASCII")); w32(36L + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16L)
    w16(1); w16(channels); w32(sampleRate.toLong)
    w32(sampleRate.toLong * channels * 2); w16(channels * 2); w16(16)
    out.write("data".getBytes("US-ASCII")); w32(dataLen.toLong)
    samples.foreach(s => w16(s & 0xffff))
    out.toByteArray
  }

  test("netpbmDecoder parses P5 headers (incl. comments) and computes the exact intensity histogram") {
    // 4x2 grayscale, maxval 255: bins of width 32 -> values chosen to
    // land in bins 0, 0, 7, 7, 3, 3, 3, 0 -> hist = [3,0,0,3,0,0,0,2]/8
    val raster = Array[Byte](0, 31, -1 /*255*/, -32 /*224*/,
      96, 97, 127, 10)
    val d = Multimodal.netpbmDecoder(7L,
      p5(4, 2, 255, raster, comment = Some("a header comment")))
    d.format_id shouldBe 5
    d.width shouldBe 4
    d.height shouldBe 2
    d.features.toSeq shouldBe Seq(3f / 8, 0f, 0f, 3f / 8, 0f, 0f, 0f, 2f / 8)
  }

  test("netpbmDecoder rejects bad magic, truncated raster, and oversize maxval") {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.netpbmDecoder(1L, "JFIF....".getBytes("US-ASCII"))
    an[IllegalArgumentException] should be thrownBy
      Multimodal.netpbmDecoder(2L, p5(4, 2, 255, Array[Byte](1, 2, 3))) // 3 < 8
    an[IllegalArgumentException] should be thrownBy
      Multimodal.netpbmDecoder(3L,
        "P5\n2 2\n65535\n".getBytes("US-ASCII") ++ Array.fill[Byte](8)(0))
  }

  test("netpbmRasterDecoder returns the exact raster; resizeNearest samples the expected pixels") {
    // 4x2 grayscale: downscale to 2x1 → source pixels (0,0) and (2,0);
    // the exact ⌊x·W/W'⌋ grid, no interpolation
    val raster = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)
    val img = Multimodal.netpbmRasterDecoder(1L, p5(4, 2, 255, raster))
    img.width shouldBe 4
    img.height shouldBe 2
    img.channels shouldBe 1
    img.pixels.toSeq shouldBe raster.toSeq
    val small = Multimodal.resizeNearest(img, 2, 1)
    (small.width, small.height) shouldBe ((2, 1))
    small.pixels.toSeq shouldBe Seq[Byte](10, 30)
    // upscale 2x: each source pixel replicates into a 2x2 block
    val up = Multimodal.resizeNearest(
      Multimodal.netpbmRasterDecoder(2L,
        p5(2, 1, 255, Array[Byte](1, 9))), 4, 2)
    up.pixels.toSeq shouldBe Seq[Byte](1, 1, 9, 9, 1, 1, 9, 9)
    // identity resize is a pixel-exact no-op
    Multimodal.resizeNearest(img, 4, 2).pixels.toSeq shouldBe raster.toSeq
    // RGB (P6): channels move together — 2x1 red|blue upscaled to 4x1
    val rgb = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](-1, 0, 0, 0, 0, -1)
    val rgbUp = Multimodal.resizeNearest(
      Multimodal.netpbmRasterDecoder(3L, rgb), 4, 1)
    rgbUp.channels shouldBe 3
    rgbUp.pixels.toSeq shouldBe
      Seq[Byte](-1, 0, 0, -1, 0, 0, 0, 0, -1, 0, 0, -1)
  }

  test("resizeNetpbm runs the decode+resize batch over a DataFrame of payloads") {
    val rows = Seq(
      (1L, p5(4, 2, 255, Array[Byte](10, 20, 30, 40, 50, 60, 70, 80))),
      (2L, p5(2, 2, 255, Array[Byte](1, 2, 3, 4))))
    val df = spark.createDataFrame(rows).toDF("id", "payload")
    val out = Multimodal.resizeNetpbm(df, "id", "payload", 2, 2)
      .collect().sortBy(_.id)
    out.map(r => (r.width, r.height, r.channels)).toSeq shouldBe
      Seq((2, 2, 1), (2, 2, 1))
    out(0).pixels.toSeq shouldBe Seq[Byte](10, 30, 50, 70)
    out(1).pixels.toSeq shouldBe Seq[Byte](1, 2, 3, 4)
  }

  test("wavDecoder parses RIFF/fmt/data and computes exact signal stats on a known square wave") {
    // mono 8 kHz square wave +/-16384: rms = 0.5, peak = 0.5, zcr =
    // sign flips every sample -> 7/7 = 1.0, mean = 0 (4 up, 4 down)
    val samples = Array.tabulate[Short](8)(i =>
      if (i % 2 == 0) 16384.toShort else (-16384).toShort)
    val d = Multimodal.wavDecoder(9L, wav(1, 8000, samples))
    d.channels shouldBe 1
    d.sample_rate shouldBe 8000
    d.bits shouldBe 16
    d.n_samples shouldBe 8
    d.features(0) shouldBe 0.5f +- 1e-6f // rms
    d.features(1) shouldBe 0.5f          // peak
    d.features(2) shouldBe 1.0f          // zcr
    d.features(3) shouldBe 0.0f +- 1e-6f // mean
  }

  test("wavDecoder rejects non-PCM, truncated data, and corrupt chunk sizes") {
    val good = wav(1, 8000, Array[Short](1, 2, 3, 4))
    // flip the audioFormat field (offset 20) to 3 = IEEE float
    val nonPcm = good.clone(); nonPcm(20) = 3
    an[IllegalArgumentException] should be thrownBy
      Multimodal.wavDecoder(1L, nonPcm)
    // truncate mid-data
    an[IllegalArgumentException] should be thrownBy
      Multimodal.wavDecoder(2L, good.dropRight(3))
    // corrupt the data chunk size to a value that cannot advance
    val corrupt = good.clone()
    corrupt(40) = -1; corrupt(41) = -1; corrupt(42) = -1; corrupt(43) = -1
    an[IllegalArgumentException] should be thrownBy
      Multimodal.wavDecoder(3L, corrupt)
  }

  test("decodePartitionsAs runs the real decoders through the batched mapPartitions harness") {
    val img1 = p5(2, 2, 255, Array[Byte](0, 0, -1, -1))
    val img2 = p5(1, 4, 255, Array[Byte](10, 20, 30, 40))
    val df = Seq((1L, img1), (2L, img2)).toDF("id", "payload")
    val decoded = Multimodal.decodePartitionsAs(df, "id", "payload")(
        Multimodal.netpbmDecoder)
      .collect().sortBy(_.id)
    decoded.map(d => (d.id, d.width, d.height)).toSeq shouldBe
      Seq((1L, 2, 2), (2L, 1, 4))
    decoded(0).features(0) shouldBe 0.5f // two black pixels of four
    decoded(0).features(7) shouldBe 0.5f // two white pixels of four

    val audio = Seq((5L, wav(2, 44100, Array[Short](0, 0, 100, -100))))
      .toDF("id", "payload")
    val a = Multimodal.decodePartitionsAs(audio, "id", "payload")(
        Multimodal.wavDecoder)
      .collect().head
    a.channels shouldBe 2
    a.sample_rate shouldBe 44100
    a.n_samples shouldBe 2 // 4 interleaved samples / 2 channels
  }

  // ------------------------- PNG/JPEG container-header parse fixtures

  /** Minimal PNG: 8-byte signature + a 13-byte IHDR chunk. Fields are
    * hand-laid big-endian; CRC bytes are zeros (the header parse does
    * not checksum — a pixel decoder would). */
  private def png(w: Int, h: Int, depth: Int): Array[Byte] = {
    def be32(v: Long) = Array[Byte](
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](depth.toByte, 6, 0, 0, 0) ++ // color/compress/filter/interlace
      be32(0) // CRC placeholder
  }

  /** Minimal JPEG: SOI, an APP0 segment to exercise the segment walk,
    * a fill byte before the SOF0 marker, then SOF0 with the given
    * dimensions. Hand-laid per ITU T.81 B.2.2. */
  private def jpeg(w: Int, h: Int, precision: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ // SOI
      Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16) ++ // APP0, len 16
      "JFIF".getBytes("US-ASCII") ++ Array.fill[Byte](10)(0) ++ // 14 body bytes
      Array[Byte](0xff.toByte) ++ // fill byte before the next marker
      Array[Byte](0xff.toByte, 0xc0.toByte, 0, 17, precision.toByte,
        ((h >>> 8) & 0xff).toByte, (h & 0xff).toByte,
        ((w >>> 8) & 0xff).toByte, (w & 0xff).toByte, 3)

  test("imageHeaderDecoder parses PNG IHDR and JPEG SOF dimensions from hand-laid headers") {
    val p = Multimodal.imageHeaderDecoder(1L, png(640, 480, 8))
    (p.format, p.width, p.height, p.bit_depth) shouldBe ("png", 640, 480, 8)
    // dimensions above 255 exercise the multi-byte big-endian reads
    val p2 = Multimodal.imageHeaderDecoder(2L, png(70000, 3, 16))
    (p2.width, p2.height, p2.bit_depth) shouldBe (70000, 3, 16)
    val j = Multimodal.imageHeaderDecoder(3L, jpeg(1920, 1080, 8))
    (j.format, j.width, j.height, j.bit_depth) shouldBe ("jpeg", 1920, 1080, 8)
    val j2 = Multimodal.imageHeaderDecoder(4L, jpeg(300, 70, 12))
    (j2.width, j2.height, j2.bit_depth) shouldBe (300, 70, 12)
  }

  test("imageHeaderDecoder refuses malformed containers instead of fabricating") {
    // PNG signature but no IHDR first chunk
    val noIhdr = png(10, 10, 8).patch(12, "IDAT".getBytes("US-ASCII"), 4)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.imageHeaderDecoder(1L, noIhdr)
    // PNG truncated inside IHDR
    an[IllegalArgumentException] should be thrownBy
      Multimodal.imageHeaderDecoder(2L, png(10, 10, 8).take(20))
    // JPEG that hits EOI before any SOF
    an[IllegalArgumentException] should be thrownBy
      Multimodal.imageHeaderDecoder(3L,
        Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte))
    // JPEG with a corrupt (impossible) segment length
    an[IllegalArgumentException] should be thrownBy
      Multimodal.imageHeaderDecoder(4L,
        Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 0, 1))
    // zero-dimension SOF is refused
    an[IllegalArgumentException] should be thrownBy
      Multimodal.imageHeaderDecoder(5L, jpeg(0, 10, 8))
    // neither magic
    an[IllegalArgumentException] should be thrownBy
      Multimodal.imageHeaderDecoder(6L, "plain text".getBytes("US-ASCII"))
  }

  test("mp3HeaderDecoder parses hand-laid MPEG frame headers, incl. an ID3v2-prefixed one") {
    // 0xFF 0xFB 0x90 0x00: MPEG1 Layer III, bitrate idx 9 = 128 kbps,
    // sr idx 0 = 44100, channel mode 0 = stereo — worked out by hand
    // from the public header layout
    val body = Array.fill[Byte](417)(0x55) // ~one 128kbps frame of filler
    val frame = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0) ++ body
    val h = Multimodal.mp3HeaderDecoder(1L, frame)
    (h.version, h.layer, h.bitrate_kbps, h.sample_rate, h.channels,
      h.frame_samples) shouldBe ("1", 3, 128, 44100, 2, 1152)
    h.est_duration_ms shouldBe (frame.length.toLong * 8 / 128)

    // same frame behind an ID3v2 tag: 10-byte header, syncsafe size 0x85
    // = (1<<7) + 5 = 133 tag bytes
    val id3 = Array[Byte]('I'.toByte, 'D'.toByte, '3'.toByte, 4, 0, 0, 0, 0, 1, 5) ++
      Array.fill[Byte](133)(0) ++ frame
    val h2 = Multimodal.mp3HeaderDecoder(2L, id3)
    (h2.version, h2.bitrate_kbps, h2.sample_rate) shouldBe ("1", 128, 44100)
    h2.est_duration_ms shouldBe h.est_duration_ms // tag bytes excluded

    // 0xFF 0xE2 0x40 0xC0: MPEG2.5 (verBits 0), Layer III (layerBits 1),
    // bitrate idx 4 = 32 kbps (MPEG2 L3 table), sr idx 0 = 11025, mono
    val lo = Multimodal.mp3HeaderDecoder(3L,
      Array[Byte](0xff.toByte, 0xe2.toByte, 0x40.toByte, 0xc0.toByte))
    (lo.version, lo.layer, lo.bitrate_kbps, lo.sample_rate, lo.channels,
      lo.frame_samples) shouldBe ("2.5", 3, 32, 11025, 1, 576)

    // MPEG1 Layer II keeps 1152 samples; Layer I is 384
    val l2 = Multimodal.mp3HeaderDecoder(4L,
      Array[Byte](0xff.toByte, 0xfd.toByte, 0x90.toByte, 0))
    (l2.layer, l2.bitrate_kbps, l2.frame_samples) shouldBe (2, 160, 1152)
    val l1 = Multimodal.mp3HeaderDecoder(5L,
      Array[Byte](0xff.toByte, 0xff.toByte, 0x90.toByte, 0))
    (l1.layer, l1.bitrate_kbps, l1.frame_samples) shouldBe (1, 288, 384)
  }

  test("mp3HeaderDecoder refuses malformed payloads instead of fabricating") {
    // no sync
    an[IllegalArgumentException] should be thrownBy
      Multimodal.mp3HeaderDecoder(1L, Array[Byte](0x00, 0x00, 0x00, 0x00))
    // sync present but reserved version (verBits == 1: 0xFF 0xE8)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.mp3HeaderDecoder(2L,
        Array[Byte](0xff.toByte, 0xe8.toByte, 0x90.toByte, 0))
    // reserved layer (layerBits == 0: 0xFF 0xF9)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.mp3HeaderDecoder(3L,
        Array[Byte](0xff.toByte, 0xf9.toByte, 0x90.toByte, 0))
    // bad bitrate index 15 / free-format 0
    an[IllegalArgumentException] should be thrownBy
      Multimodal.mp3HeaderDecoder(4L,
        Array[Byte](0xff.toByte, 0xfb.toByte, 0xf0.toByte, 0))
    an[IllegalArgumentException] should be thrownBy
      Multimodal.mp3HeaderDecoder(5L,
        Array[Byte](0xff.toByte, 0xfb.toByte, 0x00, 0))
    // reserved sample-rate index (srIdx == 3)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.mp3HeaderDecoder(6L,
        Array[Byte](0xff.toByte, 0xfb.toByte, 0x9c.toByte, 0))
    // ID3 tag whose declared size runs past the payload
    an[IllegalArgumentException] should be thrownBy
      Multimodal.mp3HeaderDecoder(7L,
        Array[Byte]('I'.toByte, 'D'.toByte, '3'.toByte, 4, 0, 0, 0, 0, 7, 0x7f) ++
          Array.fill[Byte](20)(0))
    // non-syncsafe ID3 size byte (high bit set)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.mp3HeaderDecoder(8L,
        Array[Byte]('I'.toByte, 'D'.toByte, '3'.toByte, 4, 0, 0, 0x80.toByte, 0, 0, 0) ++
          Array.fill[Byte](20)(0))
  }

  test("sniffingDecoder routes by magic: netpbm full decode, PNG/JPEG real header dims, stub otherwise") {
    val pngMedia = Multimodal.sniffingDecoder(1L, png(320, 200, 8))
    (pngMedia.width, pngMedia.height) shouldBe (320, 200)
    val jpegMedia = Multimodal.sniffingDecoder(2L, jpeg(64, 32, 8))
    (jpegMedia.width, jpegMedia.height) shouldBe (64, 32)
    // a PNG-magic payload with a broken header THROWS — the sniffing
    // default must not silently fall back to fabricated dimensions
    an[IllegalArgumentException] should be thrownBy
      Multimodal.sniffingDecoder(3L, png(10, 10, 8).take(20))
    // non-media payloads keep the deterministic stub convention
    // (field-wise: the features Array breaks case-class equality)
    val text = "hello world".getBytes("US-ASCII")
    val got = Multimodal.sniffingDecoder(4L, text)
    val want = Multimodal.stubDecoder(4L, text)
    (got.n_bytes, got.format_id, got.width, got.height) shouldBe
      (want.n_bytes, want.format_id, want.width, want.height)
    got.features.toSeq shouldBe want.features.toSeq
  }

  /** Build a real encoded image via the JDK writer, pixels set through
    * RAW raster samples (setRGB on a gray image would color-convert).
    */
  private def encodedGradient(w: Int, h: Int, rgb: Boolean,
      format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      if (rgb) java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val channels = if (rgb) 3 else 1
    for (y <- 0 until h; x <- 0 until w; c <- 0 until channels)
      img.getRaster.setSample(x, y, c, (x * 7 + y * 3 + c) % 256)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos) shouldBe true
    baos.toByteArray
  }

  test("imageioRasterDecoder round-trips PNG pixels exactly, gray and RGB") {
    for (rgb <- Seq(false, true)) {
      val (w, h) = (9, 5)
      val img = Multimodal.imageioRasterDecoder(1L, encodedGradient(w, h, rgb, "png"))
      (img.width, img.height, img.channels) shouldBe (w, h, if (rgb) 3 else 1)
      val c = img.channels
      for (y <- 0 until h; x <- 0 until w; k <- 0 until c)
        (img.pixels((y * w + x) * c + k) & 0xff) shouldBe (x * 7 + y * 3 + k) % 256
    }
  }

  test("imageioRasterDecoder decodes 2-band gray+alpha PNG as 1-channel gray (ADVICE r13)") {
    // the JDK round-trips gray+alpha PNG as a 2-band non-indexed
    // ComponentColorModel raster — the old channels=3 guess read band 2
    // of a 2-band raster (ArrayIndexOutOfBounds); now band count drives
    // channels and the alpha band is dropped
    val (w, h) = (6, 4)
    val cs = java.awt.color.ColorSpace.getInstance(
      java.awt.color.ColorSpace.CS_GRAY)
    val cm = new java.awt.image.ComponentColorModel(cs, true, false,
      java.awt.Transparency.TRANSLUCENT, java.awt.image.DataBuffer.TYPE_BYTE)
    val raster = cm.createCompatibleWritableRaster(w, h)
    val src = new java.awt.image.BufferedImage(cm, raster, false, null)
    for (y <- 0 until h; x <- 0 until w) {
      raster.setSample(x, y, 0, (x * 7 + y * 3) % 256)
      raster.setSample(x, y, 1, 255) // opaque: PNG alpha is straight
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", baos) shouldBe true
    val img = Multimodal.imageioRasterDecoder(7L, baos.toByteArray)
    (img.width, img.height, img.channels) shouldBe (w, h, 1)
    for (y <- 0 until h; x <- 0 until w)
      (img.pixels(y * w + x) & 0xff) shouldBe (x * 7 + y * 3) % 256
  }

  test("imageioRasterDecoder normalizes bit depth per band: 16-bit gray down, 5/6/5 BMP up (ADVICE r13)") {
    // 16-bit gray PNG: samples v*257 (full 16-bit scale) shift down to v
    val (w, h) = (6, 4)
    val g16 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      g16.getRaster.setSample(x, y, 0, ((x * 7 + y * 3) % 256) * 257)
    val b1 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(g16, "png", b1) shouldBe true
    val gray = Multimodal.imageioRasterDecoder(8L, b1.toByteArray)
    (gray.width, gray.height, gray.channels) shouldBe (w, h, 1)
    for (y <- 0 until h; x <- 0 until w)
      (gray.pixels(y * w + x) & 0xff) shouldBe (x * 7 + y * 3) % 256
    // 565 BMP: the JDK round-trips TYPE_USHORT_565_RGB as a 3-band
    // raster with component sizes [5,6,5] — each band scales UP by
    // 255/(2^size−1), not the old pass-through of 0..31/0..63 raw values
    val rgb565 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_565_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      rgb565.getRaster.setSample(x, y, 0, x % 32)
      rgb565.getRaster.setSample(x, y, 1, (x + y) % 64)
      rgb565.getRaster.setSample(x, y, 2, y % 32)
    }
    val b2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb565, "bmp", b2) shouldBe true
    val img = Multimodal.imageioRasterDecoder(9L, b2.toByteArray)
    (img.width, img.height, img.channels) shouldBe (w, h, 3)
    for (y <- 0 until h; x <- 0 until w) {
      (img.pixels((y * w + x) * 3) & 0xff) shouldBe (x % 32) * 255 / 31
      (img.pixels((y * w + x) * 3 + 1) & 0xff) shouldBe ((x + y) % 64) * 255 / 63
      (img.pixels((y * w + x) * 3 + 2) & 0xff) shouldBe (y % 32) * 255 / 31
    }
  }

  test("imageioRasterDecoder decodes JPEG dimensions/channels exactly with bounded pixel error") {
    val (w, h) = (32, 24)
    val img = Multimodal.imageioRasterDecoder(2L, encodedGradient(w, h, rgb = true, "jpg"))
    (img.width, img.height, img.channels) shouldBe (w, h, 3)
    var got = 0L; var exp = 0L
    for (y <- 0 until h; x <- 0 until w; k <- 0 until 3) {
      got += img.pixels((y * w + x) * 3 + k) & 0xff
      exp += (x * 7 + y * 3 + k) % 256
    }
    math.abs(got - exp).toDouble / exp should be < 0.05
  }

  test("rasterDecoder sniffs the container and routes: netpbm bytes, PNG via ImageIO, corrupt throws") {
    val (w, h) = (9, 5)
    // P5 netpbm: the dispatcher must take the raw byte parser leg —
    // pixel-exact round trip, 1 channel
    val p5 = (s"P5\n$w $h\n255\n").getBytes("US-ASCII") ++
      Array.tabulate(w * h)(i => ((i % w) * 7 + (i / w) * 3).toByte)
    val net = Multimodal.rasterDecoder(1L, p5)
    (net.width, net.height, net.channels) shouldBe (w, h, 1)
    for (y <- 0 until h; x <- 0 until w)
      (net.pixels(y * w + x) & 0xff) shouldBe (x * 7 + y * 3) % 256
    // PNG: the ImageIO leg — same gradient, still pixel-exact
    val png = Multimodal.rasterDecoder(2L, encodedGradient(w, h, rgb = false, "png"))
    (png.width, png.height, png.channels) shouldBe (w, h, 1)
    for (y <- 0 until h; x <- 0 until w)
      (png.pixels(y * w + x) & 0xff) shouldBe (x * 7 + y * 3) % 256
    // neither leg accepts -> THROW (no stub fall-through on the pixel path)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.rasterDecoder(3L, "definitely not an image".getBytes("US-ASCII"))
  }

  test("imageioRasterDecoder refuses payloads no codec accepts; imageioDecoder histogram sums to 1") {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.imageioRasterDecoder(3L, "definitely not an image".getBytes("US-ASCII"))
    val meta = Multimodal.imageioDecoder(4L, encodedGradient(8, 8, rgb = false, "png"))
    (meta.width, meta.height, meta.n_bytes > 0) shouldBe (8, 8, true)
    meta.features.map(_.toDouble).sum shouldBe 1.0 +- 1e-6
  }

  test("resizeImageio thumbnails PNG payloads on the mapPartitions plumbing") {
    import org.apache.spark.sql.functions.{col, lit}
    val payload = encodedGradient(16, 8, rgb = true, "png")
    val df = spark.range(4).select(col("id"), lit(payload).as("payload"))
    val out = Multimodal.resizeImageio(df, "id", "payload", 4, 2).collect()
    out.length shouldBe 4
    all(out.map(r => (r.width, r.height, r.channels))) shouldBe ((4, 2, 3))
    // nearest-neighbor sample map: out(x,y) = src(⌊x·16/4⌋, ⌊y·8/2⌋)
    for (r <- out; y <- 0 until 2; x <- 0 until 4; k <- 0 until 3)
      (r.pixels((y * 4 + x) * 3 + k) & 0xff) shouldBe ((x * 4) * 7 + (y * 4) * 3 + k) % 256
  }
}
