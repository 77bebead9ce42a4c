package graft.sources

import java.io.ByteArrayOutputStream

/** In-engine WAV codec (JDK-only, zero dependencies — the same posture as
  * [[Png]]/[[Xlsx]]/[[Rds]]/[[Avro]]/[[Tar]]): 16-bit PCM mono, RIFF/WAVE
  * container per the Microsoft/IBM spec (RIFF chunk, `fmt ` with
  * AudioFormat=1, one `data` chunk, everything little-endian).
  *
  * The byte stream is a pure deterministic function of (sampleRate,
  * samples) — no codec/version can change it — so planted audio carries
  * bit-exact oracles the same way planted [[Png]] rasters do, making the
  * whole encode→decode→feature path hash-verifiable against SQL.
  *
  * [[decodePcm16Mono]] is intentionally strict-but-skipping: it walks the
  * chunk list (so writers that insert LIST/fact chunks still parse),
  * accepts only the PCM16-mono `fmt ` it can represent, and returns None
  * for anything else — in a 100 TB corpus a malformed payload must flag,
  * not kill the pass (same contract as Multimodal.decodeImage).
  */
object Wav {

  final case class Pcm(sampleRate: Int, samples: Array[Int])

  /** Encode mono 16-bit PCM. Sample values outside [-32768, 32767] are an
    * error (silent clipping would corrupt planted oracles).
    */
  def encodePcm16Mono(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    var i = 0
    while (i < samples.length) {
      require(samples(i) >= Short.MinValue && samples(i) <= Short.MaxValue,
        s"sample $i out of int16 range: ${samples(i)}")
      i += 1
    }
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream(44 + dataLen)
    def ascii(s: String): Unit = { val b = s.getBytes("US-ASCII"); out.write(b, 0, b.length) }
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    ascii("RIFF"); le32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1)              // AudioFormat: PCM
    le16(1)              // channels: mono
    le32(sampleRate)
    le32(sampleRate * 2) // byte rate = rate * channels * bytesPerSample
    le16(2)              // block align
    le16(16)             // bits per sample
    ascii("data"); le32(dataLen)
    i = 0
    while (i < samples.length) { le16(samples(i) & 0xFFFF); i += 1 }
    out.toByteArray
  }

  /** Parse a PCM16-mono WAV; None for anything this codec cannot
    * faithfully represent (wrong magic, truncation, non-PCM, stereo,
    * other bit depths). Unknown chunks between `fmt ` and `data` are
    * skipped per the RIFF rules (chunks are word-aligned: odd sizes
    * carry a pad byte).
    */
  def decodePcm16Mono(bytes: Array[Byte]): Option[Pcm] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
      (u8(i + 3).toLong << 24)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var rate = -1
    var sampleBytesOff = -1
    var sampleCount = -1
    while (off + 8 <= bytes.length && (rate < 0 || sampleBytesOff < 0)) {
      val kind = tag(off)
      val size = le32(off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      if (kind == "fmt ") {
        if (size < 16) return None
        val fmt = le16(off + 8)
        val channels = le16(off + 10)
        val bits = le16(off + 22)
        if (fmt != 1 || channels != 1 || bits != 16) return None
        rate = le32(off + 12).toInt
        if (rate <= 0) return None
      } else if (kind == "data") {
        if (rate < 0) return None          // data before fmt: reject
        if (size % 2 != 0) return None
        sampleBytesOff = off + 8
        sampleCount = (size / 2).toInt
      }
      off += 8 + size.toInt + (size.toInt & 1) // RIFF word alignment
    }
    if (rate < 0 || sampleBytesOff < 0) return None
    val samples = new Array[Int](sampleCount)
    var i = 0
    while (i < sampleCount) {
      val v = le16(sampleBytesOff + 2 * i)
      samples(i) = if (v >= 0x8000) v - 0x10000 else v
      i += 1
    }
    Some(Pcm(rate, samples))
  }
}
