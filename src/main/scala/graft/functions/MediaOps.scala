package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Header-level media introspection — REAL parsing (not a stub): container
  * formats put dimensions in their first bytes precisely so tools can read
  * them without a decoder, and that is exactly the 100 TB posture — sizing,
  * filtering and bucketing billions of images from a few header bytes per
  * row, no codec, no JNI, no image in memory.
  *
  * All formats per their public specifications: PNG (ISO 15948 §5.3/11.2.2,
  * big-endian IHDR), JPEG/JFIF (ITU T.81 §B.2.2, SOFn frame headers), GIF
  * (GIF89a spec, little-endian logical screen descriptor), BMP
  * (BITMAPINFOHEADER, little-endian).
  */
object MediaOps {

  final val FormatUnknown = 0
  final val FormatPng = 1
  final val FormatJpeg = 2
  final val FormatGif = 3
  final val FormatBmp = 4
  final val FormatWebp = 5
  final val FormatTiff = 6

  /** `[format, width, height]` from the payload header; `[0, -1, -1]` when
    * no known signature matches or the header is truncated/corrupt. One
    * bounded scan — JPEG walks its marker segments, everything else reads
    * fixed offsets. */
  def imageMeta(payload: Array[Byte]): ArrayData = {
    val out = parse(payload)
    new GenericArrayData(Array(out._1, out._2, out._3))
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private def parse(b: Array[Byte]): (Int, Int, Int) = {
    if (b == null || b.length < 10) return (FormatUnknown, -1, -1)
    // PNG: 89 'P' 'N' 'G' 0D 0A 1A 0A, then the IHDR chunk must come first;
    // width/height are the IHDR's first 8 data bytes (offset 16)
    if (b.length >= 24 &&
      u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a)
      return (FormatPng, be32(b, 16), be32(b, 20))
    // GIF87a / GIF89a: logical screen descriptor right after the signature
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return (FormatGif, le16(b, 6), le16(b, 8))
    // BMP: 'B' 'M', then a DIB header at offset 14 whose first field is its
    // own size. BITMAPINFOHEADER family (size >= 40) carries 32-bit
    // width/height at 18/22 (height may be negative for top-down rows);
    // the legacy 12-byte BITMAPCOREHEADER carries 16-bit fields at 18/20.
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val dibSize = le32(b, 14)
      if (dibSize >= 40) return (FormatBmp, le32(b, 18), math.abs(le32(b, 22)))
      if (dibSize == 12) return (FormatBmp, le16(b, 18), le16(b, 20))
      return (FormatUnknown, -1, -1)
    }
    // WebP (RIFF container, Google's public spec): 'RIFF' <size> 'WEBP',
    // then the first chunk decides the flavor — VP8X extended (24-bit
    // canvas−1 fields), 'VP8 ' lossy (9D 01 2A start code, 14-bit LE
    // dims) or VP8L lossless (0x2F signature, 14-bit packed dims)
    if (b.length >= 16 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') {
      def le24(i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
      if (b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == 'X' &&
        b.length >= 30)
        return (FormatWebp, 1 + le24(24), 1 + le24(27))
      if (b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == ' ' &&
        b.length >= 30 && u8(b, 23) == 0x9d && u8(b, 24) == 0x01 &&
        u8(b, 25) == 0x2a)
        return (FormatWebp, le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff)
      if (b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == 'L' &&
        b.length >= 25 && u8(b, 20) == 0x2f) {
        val bits = le32(b, 21)
        return (FormatWebp, 1 + (bits & 0x3fff), 1 + ((bits >> 14) & 0x3fff))
      }
      return (FormatUnknown, -1, -1)
    }
    // TIFF (TIFF 6.0 spec): 'II'/'MM' byte order + magic 42 + first IFD
    // offset; dimensions are IFD tags 256/257 (SHORT or LONG, honoring
    // the declared endianness and the SHORT left-justified value rule)
    if (b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I') || (b(0) == 'M' && b(1) == 'M'))) {
      val bigE = b(0) == 'M'
      def r16(i: Int): Int = if (bigE) be16(b, i) else le16(b, i)
      def r32(i: Int): Int = if (bigE) be32(b, i) else le32(b, i)
      if (r16(2) != 42) return (FormatUnknown, -1, -1)
      val ifd = r32(4)
      if (ifd < 8 || ifd + 2 > b.length) return (FormatUnknown, -1, -1)
      val nEntries = r16(ifd)
      if (ifd + 2 + 12 * nEntries > b.length) return (FormatUnknown, -1, -1)
      var w = -1; var h = -1
      var e = 0
      while (e < nEntries) {
        val off = ifd + 2 + 12 * e
        val tag = r16(off)
        val typ = r16(off + 2)
        // SHORT (3) is left-justified in the 4-byte value field; LONG (4)
        // fills it
        val v =
          if (typ == 3) r16(off + 8)
          else if (typ == 4) r32(off + 8)
          else -1
        if (tag == 256) w = v
        if (tag == 257) h = v
        e += 1
      }
      if (w >= 0 && h >= 0) return (FormatTiff, w, h)
      return (FormatUnknown, -1, -1)
    }
    // JPEG: FF D8, then marker segments; dimensions live in the first SOFn
    // (C0..CF excluding C4/C8/CC) — skip everything else by its BE length
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return (FormatUnknown, -1, -1)
        val marker = u8(b, i + 1)
        if (marker == 0xff) { i += 1 } // fill byte
        else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i += 2 // standalone marker, no length
        } else if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOFn: [len:2][precision:1][height:2][width:2]
          if (i + 8 < b.length) return (FormatJpeg, be16(b, i + 7), be16(b, i + 5))
          return (FormatUnknown, -1, -1)
        } else {
          val len = be16(b, i + 2)
          if (len < 2) return (FormatUnknown, -1, -1)
          i += 2 + len
        }
      }
      return (FormatUnknown, -1, -1)
    }
    (FormatUnknown, -1, -1)
  }

  /** Build a canonical extended-WebP (VP8X) container header per Google's
    * public WebP spec: `RIFF <size> WEBP VP8X <10-byte canvas header>`
    * with the 24-bit little-endian width−1/height−1 canvas fields — a
    * real RIFF layout the [[imageMeta]] walk round-trips (a canvas header
    * without coded frame chunks; the introspection surface is the point,
    * as with the WAV twin). Dimensions must be in [1, 2^24]. */
  def webpBytes(width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && width <= (1 << 24),
      s"webp width must be in [1, 2^24], got $width")
    require(height >= 1 && height <= (1 << 24),
      s"webp height must be in [1, 2^24], got $height")
    val out = new java.io.ByteArrayOutputStream(30)
    def le24(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff)
    }
    def le32(v: Int): Unit = { le24(v); out.write((v >> 24) & 0xff) }
    def tag(t: String): Unit = out.write(t.getBytes("US-ASCII"))
    tag("RIFF"); le32(22); tag("WEBP")
    tag("VP8X"); le32(10)
    out.write(0); out.write(0); out.write(0); out.write(0) // flags + reserved
    le24(width - 1); le24(height - 1)
    out.toByteArray
  }

  /** Build a minimal valid TIFF (TIFF 6.0): byte-order mark (II or MM),
    * magic 42, one IFD with LONG ImageWidth (256) / ImageLength (257)
    * entries — 38 real bytes honoring the declared endianness, which
    * [[imageMeta]]'s IFD walk round-trips. */
  def tiffBytes(width: Int, height: Int, bigEndian: Boolean): Array[Byte] = {
    require(width >= 0 && height >= 0,
      s"tiff dims must be >= 0, got ${width}x$height")
    val out = new java.io.ByteArrayOutputStream(38)
    def w16(v: Int): Unit =
      if (bigEndian) { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit =
      if (bigEndian) { w16((v >> 16) & 0xffff); w16(v & 0xffff) }
      else { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    if (bigEndian) { out.write('M'); out.write('M') }
    else { out.write('I'); out.write('I') }
    w16(42); w32(8)
    w16(2) // two IFD entries
    w16(256); w16(4); w32(1); w32(width)
    w16(257); w16(4); w32(1); w32(height)
    w32(0) // no next IFD
    out.toByteArray
  }

  /** Build a canonical PCM RIFF/WAVE container around `data` — the
    * public WAVE layout (Microsoft/IBM RIFF spec; little-endian fields):
    * `RIFF <size> WAVE` + a 16-byte `fmt ` chunk (PCM tag 1, channels,
    * sample rate, derived byte rate / block align, bits per sample) + the
    * `data` chunk. Used to materialize real audio containers in-plan so
    * the parse side round-trips actual bytes, not a stub. */
  def wavBytes(channels: Int, sampleRate: Int, bitsPerSample: Int, data: Array[Byte]): Array[Byte] = {
    val body = if (data == null) Array.emptyByteArray else data
    val blockAlign = channels * (bitsPerSample / 8)
    val byteRate = sampleRate * blockAlign
    val out = new java.io.ByteArrayOutputStream(44 + body.length)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def tag(t: String): Unit = out.write(t.getBytes("US-ASCII"))
    tag("RIFF"); le32(36 + body.length); tag("WAVE")
    tag("fmt "); le32(16)
    le16(1); le16(channels); le32(sampleRate); le32(byteRate)
    le16(blockAlign); le16(bitsPerSample)
    tag("data"); le32(body.length)
    out.write(body)
    out.toByteArray
  }

  /** `[channels, sample_rate, bits_per_sample, data_bytes]` from a
    * RIFF/WAVE payload header, `[-1, -1, -1, -1]` when the payload is not
    * a parseable WAV. Walks the chunk list (chunks are not guaranteed in
    * fmt/data order and may include others, e.g. LIST) honoring the
    * spec's even-byte chunk padding — one bounded scan, no decode. */
  def audioMeta(payload: Array[Byte]): ArrayData = {
    val none = new GenericArrayData(Array(-1, -1, -1, -1))
    val b = payload
    if (b == null || b.length < 12 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return none
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var dataLen = -1
    while (i + 8 <= b.length && (channels < 0 || dataLen < 0)) {
      val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' '
      val isData = b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a'
      val len = le32(b, i + 4)
      if (len < 0) return none
      if (isFmt) {
        if (len < 16 || i + 8 + 16 > b.length) return none
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        bits = le16(b, i + 22)
      } else if (isData) {
        dataLen = len
      }
      // long cursor: a near-2^31 declared chunk length must end the walk,
      // not wrap the int cursor back into the buffer
      val next = i.toLong + 8L + len.toLong + (len & 1)
      if (next > b.length) i = b.length
      else i = next.toInt // chunks pad to even length
    }
    if (channels < 0 || dataLen < 0) none
    else new GenericArrayData(Array(channels, rate, bits, dataLen))
  }

  /** Build a minimal ISO BMFF (MP4) box sequence around `data` — the
    * public ISO/IEC 14496-12 layout: each box is [size:4 BE][type:4], here
    * `ftyp` (major brand + minor version + one compatible brand), an empty
    * `moov` shell, and an `mdat` carrying the payload. Enough structure
    * for header-only tooling to size and classify the file. */
  def mp4Bytes(majorBrand: UTF8String, data: Array[Byte]): Array[Byte] = {
    val body = if (data == null) Array.emptyByteArray else data
    val brand = {
      val b = majorBrand.toString.getBytes("US-ASCII")
      java.util.Arrays.copyOf(b, 4) // pad/trim to the 4-char brand code
    }
    val out = new java.io.ByteArrayOutputStream(40 + body.length)
    def be32(v: Int): Unit = {
      out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
    def tag(t: String): Unit = out.write(t.getBytes("US-ASCII"))
    be32(20); tag("ftyp"); out.write(brand); be32(0); out.write(brand)
    be32(8); tag("moov")
    be32(8 + body.length); tag("mdat"); out.write(body)
    out.toByteArray
  }

  /** `[n_boxes, ftyp_ok, moov_bytes, mdat_bytes]` from a top-level ISO
    * BMFF box walk (`ftyp_ok` = 1 when the first box is a well-formed
    * ftyp), `[-1, -1, -1, -1]` when the payload is not a parseable box
    * sequence. Bounded scan over box headers only — size fields skip the
    * contents, no codec. */
  def mp4Meta(payload: Array[Byte]): ArrayData = {
    val none = new GenericArrayData(Array(-1, -1, -1, -1))
    val b = payload
    if (b == null || b.length < 8) return none
    var i = 0
    var nBoxes = 0; var ftypOk = 0; var moov = -1; var mdat = -1
    while (i + 8 <= b.length) {
      val size = be32(b, i)
      // size < 8 covers size==1 (64-bit largesize, out of scope) and junk
      if (size < 8 || i + size > b.length) return none
      val isFirst = nBoxes == 0
      if (b(i + 4) == 'f' && b(i + 5) == 't' && b(i + 6) == 'y' && b(i + 7) == 'p') {
        if (isFirst && size >= 16) ftypOk = 1
      } else if (b(i + 4) == 'm' && b(i + 5) == 'o' && b(i + 6) == 'o' && b(i + 7) == 'v') {
        moov = size - 8
      } else if (b(i + 4) == 'm' && b(i + 5) == 'd' && b(i + 6) == 'a' && b(i + 7) == 't') {
        mdat = size - 8
      }
      nBoxes += 1
      i += size
    }
    if (i != b.length) return none // trailing junk after the last box
    new GenericArrayData(Array(nBoxes, ftypOk, moov, mdat))
  }
}
