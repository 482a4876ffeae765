package graft.operators

import graft.functions.PolyHash
import graft.operators.Multimodal.{Codec, DecodedMedia, MediaRecord}

/** Real pure-JVM codecs behind the S2 decode seam (the reference
  * decodes actual media via `decodebin`, `/root/reference/run.sh:53`;
  * this container ships no native codec libraries, so the formats
  * implemented here are ones a JVM can parse bit-exactly from spec:
  * uncompressed 24-bit BMP). `StubCodec` remains the oracle-path
  * test double; `BmpCodec` is a REAL decoder — it parses genuine
  * header bytes and unpacks genuine pixels, so the decode stage's
  * partition lifecycle carries real media end to end.
  */
object Codecs {

  /** Parsed BMP dimensions + layout facts needed to unpack pixels. */
  final case class BmpHeader(width: Int, height: Int, bpp: Int,
      dataOffset: Int, topDown: Boolean)

  /** Uncompressed 24-bit Windows BMP (BITMAPINFOHEADER). Little-
    * endian fields; rows stored bottom-up (positive height) with
    * each row padded to a 4-byte boundary; pixels are BGR. */
  object BmpCodec extends Codec {

    private def u16(d: Array[Byte], off: Int): Int =
      (d(off) & 0xff) | ((d(off + 1) & 0xff) << 8)
    private def i32(d: Array[Byte], off: Int): Int =
      (d(off) & 0xff) | ((d(off + 1) & 0xff) << 8) |
        ((d(off + 2) & 0xff) << 16) | ((d(off + 3) & 0xff) << 24)

    def parseHeader(d: Array[Byte]): BmpHeader = {
      require(d.length >= 54, s"BMP too short: ${d.length} bytes")
      require(d(0) == 'B' && d(1) == 'M', "not a BMP: missing 'BM' magic")
      val dataOffset = i32(d, 10)
      val dibSize = i32(d, 14)
      require(dibSize >= 40, s"unsupported DIB header size $dibSize")
      val width = i32(d, 18)
      val rawHeight = i32(d, 22)
      val bpp = u16(d, 28)
      val compression = i32(d, 30)
      require(bpp == 24, s"only 24-bit BMP supported, got $bpp bpp")
      require(compression == 0, s"only uncompressed BMP supported")
      require(width > 0 && rawHeight != 0, s"bad dims ${width}x$rawHeight")
      BmpHeader(width, math.abs(rawHeight), bpp, dataOffset,
        topDown = rawHeight < 0)
    }

    /** Row stride padded to 4 bytes — the BMP spec's row layout. */
    def stride(width: Int): Int = (width * 3 + 3) & ~3

    /** Unpack to packed top-down RGB (the Frame/`video/x-raw,
      * format=RGB` contract of the engine, SURVEY §1.2): flips the
      * bottom-up row order and swaps BGR→RGB. */
    def decodeRgb(d: Array[Byte]): (Int, Int, Array[Byte]) = {
      val h = parseHeader(d)
      val rowBytes = stride(h.width)
      require(d.length >= h.dataOffset + rowBytes * h.height,
        "BMP pixel array truncated")
      val out = new Array[Byte](h.width * h.height * 3)
      var y = 0
      while (y < h.height) {
        val srcRow = if (h.topDown) y else h.height - 1 - y
        val src = h.dataOffset + srcRow * rowBytes
        var x = 0
        while (x < h.width) {
          val s = src + x * 3
          val t = (y * h.width + x) * 3
          out(t) = d(s + 2)     // R
          out(t + 1) = d(s + 1) // G
          out(t + 2) = d(s)     // B
          x += 1
        }
        y += 1
      }
      (h.width, h.height, out)
    }

    /** Encode packed top-down RGB to a spec-conformant 24-bit BMP —
      * the fixture generator for hermetic round-trip tests (and a
      * real writer: any BMP viewer opens its output). */
    def encodeRgb(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "rgb size mismatch")
      val rowBytes = stride(width)
      val dataSize = rowBytes * height
      val out = new Array[Byte](54 + dataSize)
      def w16(off: Int, v: Int): Unit = {
        out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      }
      def w32(off: Int, v: Int): Unit = {
        out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
        out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
      }
      out(0) = 'B'; out(1) = 'M'
      w32(2, 54 + dataSize); w32(10, 54)
      w32(14, 40); w32(18, width); w32(22, height)
      w16(26, 1); w16(28, 24); w32(30, 0); w32(34, dataSize)
      var y = 0
      while (y < height) {
        val dst = 54 + (height - 1 - y) * rowBytes
        var x = 0
        while (x < width) {
          val s = (y * width + x) * 3
          val t = dst + x * 3
          out(t) = rgb(s + 2); out(t + 1) = rgb(s + 1); out(t + 2) = rgb(s)
          x += 1
        }
        y += 1
      }
      out
    }

    override def decode(rec: MediaRecord): DecodedMedia = {
      val h = parseHeader(rec.data)
      DecodedMedia(rec.media_id, rec.kind, rec.data.length,
        PolyHash.hashBytes(rec.data), h.width, h.height,
        channels = 3, n_frames = 1)
    }
  }

  /** Kind-dispatching codec: real BMP bytes decode for real,
    * anything else falls back to the deterministic stub — the
    * `decodebin`-style auto-plugging seam, resolved once per
    * partition. */
  object AutoCodec extends Codec {
    override def decode(rec: MediaRecord): DecodedMedia =
      if (rec.data.length >= 2 && rec.data(0) == 'B' && rec.data(1) == 'M')
        BmpCodec.decode(rec)
      else Multimodal.StubCodec.decode(rec)
  }
}
