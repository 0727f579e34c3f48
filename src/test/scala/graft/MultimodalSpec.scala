package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")

  test("attachBinary carries payload bytes plus a typed metadata struct") {
    val out = Multimodal.attachBinary(docs, "doc_id", "text").orderBy("doc_id").collect()
    val r = out(0)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
    val meta = r.getStruct(2)
    assert(meta.getInt(0) == 11)
    assert(meta.getString(2) == "application/octet-stream")
  }

  test("sampleFrames chunks payloads into positional frames that reassemble") {
    val docs2 = Seq((1L, "abcdefghij")).toDF("doc_id", "text") // 10 bytes
    val withBin = Multimodal.attachBinary(docs2, "doc_id", "text")
    val frames = Multimodal.sampleFrames(withBin, "doc_id", frameBytes = 4)
      .orderBy("frame_pos")
      .collect()
    assert(frames.length == 3) // 4+4+2
    val joined = frames.map(r => new String(r.getAs[Array[Byte]]("frame"), "UTF-8")).mkString
    assert(joined == "abcdefghij")
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(frames.last.getStruct(3).getInt(0) == 2) // last frame length
  }

  test("sampleFrames stride keeps every Nth frame") {
    val docs2 = Seq((1L, "abcdefghijkl")).toDF("doc_id", "text") // 12 bytes, 6 frames of 2
    val withBin = Multimodal.attachBinary(docs2, "doc_id", "text")
    val frames = Multimodal.sampleFrames(withBin, "doc_id", frameBytes = 2, stride = 2)
      .orderBy("frame_pos").collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
  }

  test("decodeStubBatched is row-identical to per-row decode at any batch size") {
    val many = (0 until 100).map(i => (i.toLong, s"payload-$i")).toDF("doc_id", "text")
    val withBin = Multimodal.attachBinary(many, "doc_id", "text").repartition(3)
    val rowWise = Multimodal.decodeStub(spark, withBin, "doc_id").collect().sortBy(_.doc_id)
    for (bs <- Seq(1, 7, 64, 1000)) {
      val batched = Multimodal.decodeStubBatched(spark, withBin, "doc_id", batchSize = bs)
        .collect().sortBy(_.doc_id)
      assert(batched.toSeq == rowWise.toSeq, s"batchSize=$bs changed the output")
    }
  }

  test("decodeStub is deterministic and partition-parallel") {
    val withBin = Multimodal.attachBinary(docs, "doc_id", "text").repartition(3)
    val a = Multimodal.decodeStub(spark, withBin, "doc_id").collect().sortBy(_.doc_id)
    val b = Multimodal.decodeStub(spark, withBin, "doc_id").collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a(0).byte_len == 11)
    assert(a(0).width >= 64 && a(0).height >= 64)
    assert(a(1).byte_len == 0)
  }

  test("image_meta parses PNG/JPEG/GIF/BMP headers without a decoder; garbage is 'unknown'") {
    import org.apache.spark.sql.functions.col
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // minimal PNG: signature + IHDR length/type + width 640 height 480
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++ Array[Byte](8, 2, 0, 0, 0)
    // JPEG: SOI, APP0 segment (len 4, skipped), SOF0 with height 300 width 200
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(4) ++ Array[Byte](0, 0) ++
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++ Array[Byte](8) ++
      be16(300) ++ be16(200) ++ Array[Byte](3, 0, 0, 0)
    val gif = "GIF89a".getBytes ++ le16(320) ++ le16(200) ++ Array[Byte](0, 0, 0, 0)
    // BITMAPINFOHEADER: DIB size 40 at offset 14, 32-bit dims at 18/22
    val bmp = "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(40) ++ le32(800) ++ le32(-600) ++ Array.fill[Byte](4)(0)
    // legacy BITMAPCOREHEADER: DIB size 12, 16-bit dims at 18/20
    val bmpCore = "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(12) ++ le16(1024) ++ le16(768) ++ Array.fill[Byte](8)(0)
    // unrecognized DIB size (16): dimensions would be garbage — must be unknown
    val bmpBadDib = "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(16) ++ le32(800) ++ le32(600) ++ Array.fill[Byte](4)(0)
    val junk = "definitely not an image, just text".getBytes
    val truncated = Array[Byte](0x89.toByte, 'P', 'N', 'G')
    val rows = Seq(
      (1L, png), (2L, jpeg), (3L, gif), (4L, bmp), (5L, junk), (6L, truncated),
      (7L, bmpCore), (8L, bmpBadDib))
      .toDF("id", "payload")
      .select(col("id"), graft.functions.image_meta(col("payload")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(rows.toSeq == Seq(
      (1L, "png", 640, 480),
      (2L, "jpeg", 200, 300),
      (3L, "gif", 320, 200),
      (4L, "bmp", 800, 600), // negative BMP height = top-down rows; magnitude
      (5L, "unknown", -1, -1),
      (6L, "unknown", -1, -1),
      (7L, "bmp", 1024, 768), // BITMAPCOREHEADER 16-bit fields
      (8L, "unknown", -1, -1))) // unrecognized DIB header size
  }

  test("webp/tiff: builder round-trips, VP8/VP8L handcrafted, endianness, rejects") {
    import graft.functions.MediaOps
    def meta(b: Array[Byte]): Seq[Int] = MediaOps.imageMeta(b).toIntArray().toSeq
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // VP8X builder round trip, incl. the 1x1 and 2^24 boundary canvases
    assert(meta(MediaOps.webpBytes(640, 480)) == Seq(MediaOps.FormatWebp, 640, 480))
    assert(meta(MediaOps.webpBytes(1, 1)) == Seq(MediaOps.FormatWebp, 1, 1))
    assert(meta(MediaOps.webpBytes(1 << 24, 3)) == Seq(MediaOps.FormatWebp, 1 << 24, 3))
    intercept[IllegalArgumentException] { MediaOps.webpBytes(0, 5) }
    // handcrafted lossy 'VP8 ' key frame: 3 frame-tag bytes, 9D 01 2A,
    // 14-bit LE dims
    val vp8 = "RIFF".getBytes ++ le32(24) ++ "WEBP".getBytes ++
      "VP8 ".getBytes ++ le32(12) ++ Array[Byte](0, 0, 0) ++
      Array[Byte](0x9d.toByte, 0x01, 0x2a) ++ le16(320) ++ le16(240) ++ le16(0)
    assert(meta(vp8) == Seq(MediaOps.FormatWebp, 320, 240))
    // handcrafted lossless VP8L: 0x2F signature then width-1 | height-1<<14
    val bits = (511 - 1) | ((256 - 1) << 14)
    val vp8l = "RIFF".getBytes ++ le32(17) ++ "WEBP".getBytes ++
      "VP8L".getBytes ++ le32(5) ++ Array[Byte](0x2f.toByte) ++ le32(bits)
    assert(meta(vp8l) == Seq(MediaOps.FormatWebp, 511, 256))
    // a RIFF/WEBP with an unknown first chunk is not parseable
    val oddChunk = "RIFF".getBytes ++ le32(20) ++ "WEBP".getBytes ++
      "ANIM".getBytes ++ le32(6) ++ Array.fill[Byte](6)(0)
    assert(meta(oddChunk) == Seq(MediaOps.FormatUnknown, -1, -1))
    // a WAV (RIFF/WAVE) must never sniff as WebP
    assert(meta(MediaOps.wavBytes(1, 8000, 8, Array[Byte](1))) ==
      Seq(MediaOps.FormatUnknown, -1, -1))
    // TIFF builder: both endiannesses round-trip
    assert(meta(MediaOps.tiffBytes(5000, 7000, bigEndian = false)) ==
      Seq(MediaOps.FormatTiff, 5000, 7000))
    assert(meta(MediaOps.tiffBytes(123, 456, bigEndian = true)) ==
      Seq(MediaOps.FormatTiff, 123, 456))
    // handcrafted SHORT-typed entries (left-justified value rule), LE
    val shortTiff = "II".getBytes ++ le16(42) ++ le32(8) ++
      le16(2) ++
      le16(256) ++ le16(3) ++ le32(1) ++ le16(800) ++ le16(0) ++
      le16(257) ++ le16(3) ++ le32(1) ++ le16(600) ++ le16(0) ++
      le32(0)
    assert(meta(shortTiff) == Seq(MediaOps.FormatTiff, 800, 600))
    // bad magic, truncated IFD, missing dimension tags: all unknown
    assert(meta("II".getBytes ++ le16(41) ++ le32(8)) ==
      Seq(MediaOps.FormatUnknown, -1, -1))
    assert(meta("II".getBytes ++ le16(42) ++ le32(8) ++ le16(9)) ==
      Seq(MediaOps.FormatUnknown, -1, -1))
    val noDims = "II".getBytes ++ le16(42) ++ le32(8) ++
      le16(1) ++ le16(259) ++ le16(3) ++ le32(1) ++ le32(1) ++ le32(0)
    assert(meta(noDims) == Seq(MediaOps.FormatUnknown, -1, -1))
  }

  test("wavBytes/audioMeta round-trip, tolerate extra chunks, reject junk") {
    import graft.functions.MediaOps
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def meta(b: Array[Byte]): Seq[Int] =
      MediaOps.audioMeta(b).toIntArray().toSeq

    // writer -> parser round trip
    val wav = MediaOps.wavBytes(2, 44100, 16, Array[Byte](1, 2, 3, 4, 5))
    assert(meta(wav) === Seq(2, 44100, 16, 5))
    assert(wav.length === 44 + 5) // canonical 44-byte header

    // chunk walk: a LIST chunk (odd length -> padded) BEFORE fmt/data
    val listChunk = "LIST".getBytes ++ le32(3) ++ Array[Byte](9, 9, 9, 0)
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(8000) ++ le16(1) ++ le16(8)
    val data = "data".getBytes ++ le32(2) ++ Array[Byte](7, 7)
    val exotic = "RIFF".getBytes ++ le32(4 + listChunk.length + fmt.length + data.length) ++
      "WAVE".getBytes ++ listChunk ++ fmt ++ data
    assert(meta(exotic) === Seq(1, 8000, 8, 2))

    // data before fmt is legal RIFF too
    val swapped = "RIFF".getBytes ++ le32(4 + fmt.length + data.length) ++
      "WAVE".getBytes ++ data ++ fmt
    assert(meta(swapped) === Seq(1, 8000, 8, 2))

    assert(meta("not audio at all, just text bytes".getBytes) === Seq(-1, -1, -1, -1))
    assert(meta("RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes) === Seq(-1, -1, -1, -1))
    assert(meta(wav.take(20)) === Seq(-1, -1, -1, -1)) // truncated mid-fmt
  }

  test("mp4Bytes/mp4Meta round-trip, reject truncation and junk") {
    import graft.functions.MediaOps
    import org.apache.spark.unsafe.types.UTF8String
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def meta(b: Array[Byte]): Seq[Int] = MediaOps.mp4Meta(b).toIntArray().toSeq

    val mp4 = MediaOps.mp4Bytes(UTF8String.fromString("isom"), Array[Byte](1, 2, 3))
    assert(meta(mp4) === Seq(3, 1, 0, 3))
    assert(mp4.length === 20 + 8 + 8 + 3)

    // unknown box types are walked over by size
    val free = be32(12) ++ "free".getBytes ++ Array[Byte](0, 0, 0, 0)
    assert(meta(mp4 ++ free) === Seq(4, 1, 0, 3))

    assert(meta(mp4.dropRight(1)) === Seq(-1, -1, -1, -1)) // short mdat
    assert(meta("plain text, not a box sequence!!".getBytes) === Seq(-1, -1, -1, -1))
    // size=1 (64-bit largesize marker) is out of scope -> reject, not misparse
    assert(meta(be32(1) ++ "mdat".getBytes ++ Array.fill[Byte](16)(0)) === Seq(-1, -1, -1, -1))
    // ftyp not first -> ftyp_ok = 0
    val moovFirst = be32(8) ++ "moov".getBytes ++ be32(16) ++ "ftyp".getBytes ++
      "isom".getBytes ++ be32(0)
    assert(meta(moovFirst) === Seq(2, 0, 0, -1))
  }

  test("bootstrapCiMean is repartition-invariant and brackets the mean") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 200L).map(v => Tuple1(v * v)).toDF("v")
    val a = graft.operators.Sketches.bootstrapCiMean(df, "v", resamples = 20)
      .collect().head
    val b = graft.operators.Sketches.bootstrapCiMean(df.repartition(7, col("v")), "v", resamples = 20)
      .collect().head
    assert(a === b) // content-hash draws: identical on any partitioning
    val (mean, lo, hi) = (a.getDouble(2), a.getDouble(3), a.getDouble(4))
    assert(lo <= mean && mean <= hi)
  }
}
