package graft.sources

import java.io.ByteArrayOutputStream

/** In-engine AVI video container codec (JDK-only, zero dependencies — the
  * same posture as [[Png]]/[[Gif]]/[[Wav]]): RIFF 'AVI ' per the Microsoft
  * spec — LIST hdrl (avih main header, LIST strl with a 'vids' strh +
  * BITMAPINFOHEADER strf), LIST movi holding one chunk per frame, and an
  * idx1 index. Two frame codecs:
  *
  *  - '00db' uncompressed 8-bit palettized DIB ('DIB ' handler,
  *    biCompression=0, 256-gray palette, bottom-up rows padded to 4-byte
  *    stride). The byte stream is a pure deterministic function of
  *    (width, height, fps, frames) — no encoder heuristic can change it —
  *    so planted video fixtures carry bit-exact pixel-sum oracles exactly
  *    the way planted [[Gif]] animations do.
  *  - '00dc' MJPEG ('MJPG' handler): each chunk is a complete JPEG,
  *    decoded on read via `javax.imageio`'s JDK JPEG reader — the
  *    Motion-JPEG shape real capture pipelines emit. JPEG is lossy, so
  *    MJPEG fixtures are spec-pinned for geometry/round-trip consistency
  *    rather than formula pixel sums.
  *
  * [[decodeGrayFrames]] walks the RIFF chunk list strictly-but-skipping
  * (unknown chunks skipped per the word-alignment rules, anything the
  * codec cannot faithfully represent → None): in a 100 TB corpus a
  * malformed payload must flag, not kill the pass — the same contract as
  * [[Wav.decodePcm16Mono]] and Multimodal.decodeImage.
  */
object Avi {

  final case class Video(
      width: Int,
      height: Int,
      fps: Int,
      handler: String,
      frames: Seq[Array[Int]]) // row-major top-down band-0 samples, 0..255

  private def ascii(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes("US-ASCII"); out.write(b, 0, b.length)
  }
  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }

  /** One RIFF chunk: fourcc, little-endian size, payload, pad byte when
    * the payload length is odd (RIFF chunks are word-aligned).
    */
  private def chunk(out: ByteArrayOutputStream, fourcc: String, payload: Array[Byte]): Unit = {
    ascii(out, fourcc); le32(out, payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0)
  }

  private def list(out: ByteArrayOutputStream, listType: String, body: Array[Byte]): Unit = {
    ascii(out, "LIST"); le32(out, 4 + body.length); ascii(out, listType)
    out.write(body, 0, body.length)
    if ((body.length & 1) == 1) out.write(0)
  }

  private def dibStride(width: Int): Int = (width + 3) & ~3

  /** Encode row-major top-down grayscale frames (values 0..255) as an
    * uncompressed palettized AVI. Deterministic byte-for-byte.
    */
  def encodeGray8Frames(width: Int, height: Int, fps: Int, frames: Seq[Array[Int]]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    frames.foreach(f => require(f.length == width * height,
      s"frame buffer ${f.length} != ${width}x$height"))
    val dibs = frames.map { px =>
      val stride = dibStride(width)
      val data = new Array[Byte](stride * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          // DIB rows are stored bottom-up
          data((height - 1 - y) * stride + x) = (px(y * width + x) & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      data
    }
    encode(width, height, fps, "DIB ", "00db", bitCount = 8, dibs)
  }

  /** Encode pre-compressed JPEG frames as a Motion-JPEG AVI: each '00dc'
    * chunk is one complete JPEG bitstream ('MJPG' handler).
    */
  def encodeMjpegFrames(width: Int, height: Int, fps: Int, jpegs: Seq[Array[Byte]]): Array[Byte] = {
    require(jpegs.nonEmpty, "need at least one frame")
    encode(width, height, fps, "MJPG", "00dc", bitCount = 24, jpegs)
  }

  private def encode(
      width: Int, height: Int, fps: Int,
      handler: String, frameFourcc: String, bitCount: Int,
      frameData: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad geometry: ${width}x$height")
    require(fps > 0, s"bad fps: $fps")
    val maxFrame = frameData.map(_.length).max

    val avih = new ByteArrayOutputStream(56)
    le32(avih, 1000000 / fps)      // dwMicroSecPerFrame
    le32(avih, maxFrame * fps)     // dwMaxBytesPerSec
    le32(avih, 0)                  // dwPaddingGranularity
    le32(avih, 0x10)               // dwFlags: AVIF_HASINDEX
    le32(avih, frameData.size)     // dwTotalFrames
    le32(avih, 0)                  // dwInitialFrames
    le32(avih, 1)                  // dwStreams
    le32(avih, maxFrame)           // dwSuggestedBufferSize
    le32(avih, width); le32(avih, height)
    (0 until 4).foreach(_ => le32(avih, 0)) // dwReserved

    val strh = new ByteArrayOutputStream(56)
    ascii(strh, "vids"); ascii(strh, handler)
    le32(strh, 0)                  // dwFlags
    le16(strh, 0); le16(strh, 0)   // wPriority, wLanguage
    le32(strh, 0)                  // dwInitialFrames
    le32(strh, 1); le32(strh, fps) // dwScale / dwRate = frame rate
    le32(strh, 0)                  // dwStart
    le32(strh, frameData.size)     // dwLength (frames)
    le32(strh, maxFrame)           // dwSuggestedBufferSize
    le32(strh, -1)                 // dwQuality: default
    le32(strh, 0)                  // dwSampleSize: 0 = varying
    le16(strh, 0); le16(strh, 0); le16(strh, width); le16(strh, height) // rcFrame

    val strf = new ByteArrayOutputStream(40 + (if (bitCount == 8) 1024 else 0))
    le32(strf, 40)                 // biSize
    le32(strf, width); le32(strf, height)
    le16(strf, 1)                  // biPlanes
    le16(strf, bitCount)
    le32(strf, if (handler == "MJPG") 0x47504A4D else 0) // biCompression ('MJPG' | BI_RGB)
    le32(strf, if (handler == "MJPG") 0 else dibStride(width) * height) // biSizeImage
    le32(strf, 0); le32(strf, 0)   // biXPelsPerMeter, biYPelsPerMeter
    le32(strf, if (bitCount == 8) 256 else 0) // biClrUsed
    le32(strf, 0)                  // biClrImportant
    if (bitCount == 8) {
      var i = 0
      while (i < 256) { // RGBQUAD gray palette: b, g, r, reserved
        strf.write(i); strf.write(i); strf.write(i); strf.write(0); i += 1
      }
    }

    val strl = new ByteArrayOutputStream()
    chunk(strl, "strh", strh.toByteArray)
    chunk(strl, "strf", strf.toByteArray)
    val hdrl = new ByteArrayOutputStream()
    chunk(hdrl, "avih", avih.toByteArray)
    list(hdrl, "strl", strl.toByteArray)

    val movi = new ByteArrayOutputStream()
    val offsets = frameData.map { f =>
      val off = 4 + movi.size() // offset of the chunk fourcc from 'movi'
      chunk(movi, frameFourcc, f)
      off
    }
    val idx1 = new ByteArrayOutputStream(16 * frameData.size)
    frameData.zip(offsets).foreach { case (f, off) =>
      ascii(idx1, frameFourcc)
      le32(idx1, 0x10)             // AVIIF_KEYFRAME
      le32(idx1, off)
      le32(idx1, f.length)
    }

    val body = new ByteArrayOutputStream()
    list(body, "hdrl", hdrl.toByteArray)
    list(body, "movi", movi.toByteArray)
    chunk(body, "idx1", idx1.toByteArray)

    val out = new ByteArrayOutputStream(12 + body.size())
    ascii(out, "RIFF"); le32(out, 4 + body.size()); ascii(out, "AVI ")
    out.write(body.toByteArray, 0, body.size())
    out.toByteArray
  }

  /** Parse an AVI written in either of this codec's shapes back to
    * per-frame band-0 samples; None for anything it cannot faithfully
    * represent (wrong magic, truncation, a non-'vids' stream, an unknown
    * handler, frame/header geometry mismatch, an undecodable JPEG chunk).
    * Unknown chunks and LISTs are skipped per the RIFF word-alignment
    * rules, so writers that insert JUNK padding or extra streams' headers
    * still parse.
    */
  def decodeGrayFrames(bytes: Array[Byte]): Option[Video] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le32At(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
      (u8(i + 3).toLong << 24)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (bytes.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None

    var width = -1
    var height = -1
    var fps = -1
    var handler: String = null
    var bitCount = -1
    var grayPalette = false
    var strlIdx = -1    // index of the strl list currently being walked
    var vidStream = -1  // stream number of the honored 'vids' stream
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]

    // the honored video stream's chunk prefix: '00db' etc. carry the
    // stream number as two ASCII digits — a second same-geometry video
    // stream's frames must NOT silently interleave into stream 0's
    def isOurChunk(c: String, suffix: String): Boolean =
      c.length == 4 && c.endsWith(suffix) &&
        c(0) >= '0' && c(0) <= '9' && c(1) >= '0' && c(1) <= '9' &&
        (c(0) - '0') * 10 + (c(1) - '0') == vidStream

    // walk a LIST body [from, until): returns false on a structural error
    def walk(from: Int, until: Int, inMovi: Boolean, inStrl: Boolean): Boolean = {
      var off = from
      while (off + 8 <= until) {
        val kind = tag(off)
        val size = le32At(off + 4)
        if (size < 0 || off + 8 + size > until) return false
        val payload = off + 8
        val end = payload + size.toInt
        kind match {
          case "LIST" =>
            if (size < 4) return false
            val listType = tag(payload)
            if (listType == "strl") strlIdx += 1
            // movi propagates INTO nested lists: interleaved AVIs group
            // frame chunks inside LIST 'rec ' lists within movi — those
            // must decode, not silently skip
            if (!walk(payload + 4, end, inMovi = inMovi || listType == "movi",
                inStrl = inStrl || listType == "strl")) return false
          case "avih" =>
            if (size < 40) return false
            width = le32At(payload + 32).toInt
            height = le32At(payload + 36).toInt
          case "strh" if inStrl && handler == null =>
            if (size < 56) return false
            if (tag(payload) == "vids") {
              handler = tag(payload + 4)
              vidStream = strlIdx
              val scale = le32At(payload + 20).toInt
              val rate = le32At(payload + 24).toInt
              if (scale > 0 && rate % scale == 0) fps = rate / scale
            }
          case "strf" if inStrl && strlIdx == vidStream && handler != null && bitCount < 0 =>
            if (size < 40) return false
            bitCount = u8(payload + 14) | (u8(payload + 15) << 8)
            if (bitCount == 8) {
              // a faithful gray decode needs the identity gray palette
              val clrUsed = le32At(payload + 32).toInt match {
                case 0 => 256
                case n => n
              }
              if (size >= 40 + 4L * clrUsed) {
                grayPalette = (0 until clrUsed).forall { i =>
                  val p = payload + 40 + 4 * i
                  u8(p) == i && u8(p + 1) == i && u8(p + 2) == i
                }
              }
            }
          case c if inMovi && isOurChunk(c, "db") =>
            if (width <= 0 || height <= 0 || bitCount != 8 || !grayPalette) return false
            val stride = dibStride(width)
            if (size != stride.toLong * height) return false
            val px = new Array[Int](width * height)
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) {
                px(y * width + x) = u8(payload + (height - 1 - y) * stride + x)
                x += 1
              }
              y += 1
            }
            frames += px
          case c if inMovi && isOurChunk(c, "dc") =>
            if (width <= 0 || height <= 0) return false
            val img =
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes, payload, size.toInt))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null || img.getWidth != width || img.getHeight != height) return false
            val raster = img.getRaster
            val px = new Array[Int](width * height)
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) { px(y * width + x) = raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            frames += px
          case _ => () // JUNK, idx1, non-video streams: skip
        }
        off = end + (size.toInt & 1) // RIFF word alignment
      }
      true
    }

    val riffEnd = math.min(bytes.length.toLong, 8 + le32At(4)).toInt
    if (!walk(12, riffEnd, inMovi = false, inStrl = false)) return None
    if (width <= 0 || height <= 0 || handler == null || frames.isEmpty) return None
    if (handler != "DIB " && handler != "MJPG") return None
    Some(Video(width, height, math.max(fps, 1), handler, frames.toSeq))
  }
}
