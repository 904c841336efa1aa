package graft.multimodal

/** Real audio codec for the multimodal pipeline: RIFF/WAVE, 16-bit PCM
  * mono, written and parsed BY HAND (the audio counterpart of
  * [[ImageCodec]]'s BMP path). Everything is byte arithmetic — RIFF
  * chunk framing, little-endian header fields, s16le sample packing —
  * so the DuckDB oracle can recompute both the container geometry
  * (44-byte canonical header + 2·n data bytes) and every decoded-sample
  * statistic in closed form. A parser bug (wrong chunk offset, byte
  * order, sign handling) breaks the hash.
  *
  * Scale shape: same as the image codecs — decode runs inside
  * `mapPartitions`, payloads never cross a shuffle, only the extracted
  * features do.
  */
object AudioCodec {

  final case class Pcm(sampleRate: Int, samples: Array[Short])

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def putShortLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
  }

  private def getIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def getShortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Canonical 44-byte-header mono s16le WAV. */
  def wavSize(nSamples: Int): Int = 44 + 2 * nSamples

  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = 2 * samples.length
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putIntLE(out, 4, 36 + dataLen) // RIFF payload size
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putIntLE(out, 16, 16) // fmt chunk size (PCM)
    putShortLE(out, 20, 1) // audio format 1 = PCM
    putShortLE(out, 22, 1) // mono
    putIntLE(out, 24, sampleRate)
    putIntLE(out, 28, sampleRate * 2) // byte rate
    putShortLE(out, 32, 2) // block align
    putShortLE(out, 34, 16) // bits/sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putIntLE(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      putShortLE(out, 44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Parse a mono s16le PCM WAV. Walks the RIFF chunk list (a real
    * producer may insert LIST/INFO chunks before `data`), so the
    * parser is not a fixed-offset cheat even though [[encodeWav]]
    * emits the canonical layout. */
  def decodeWav(bytes: Array[Byte]): Pcm = {
    require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "not a WAV")
    // The walk runs in LONG arithmetic: a chunk length near
    // Int.MaxValue would overflow `off + len` (or `dataOff + dataLen`)
    // back to a small/negative Int, evading both guards and crashing
    // uncontrolled instead of rejecting (caught in r10 review).
    var off = 12L
    var sampleRate = -1
    var dataOff = -1L
    var dataLen = -1L
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val o = off.toInt // off + 8 <= length, so the Int view is exact
      val id = tag(bytes, o)
      val len = getIntLE(bytes, o + 4).toLong
      // a crafted/corrupt negative chunk length would walk `off`
      // backwards and hang the chunk walk — reject, don't loop
      require(len >= 0, s"negative chunk length $len at offset $off")
      id match {
        case "fmt " =>
          require(off + 24 <= bytes.length, "truncated fmt chunk")
          val fmt = getShortLE(bytes, o + 8)
          val ch = getShortLE(bytes, o + 10)
          val bits = getShortLE(bytes, o + 22)
          require(fmt == 1 && ch == 1 && bits == 16,
            s"unsupported WAV: fmt=$fmt channels=$ch bits=$bits")
          sampleRate = getIntLE(bytes, o + 12)
        case "data" =>
          dataOff = off + 8; dataLen = len
        case _ => // skip unknown chunk
      }
      off += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    require(sampleRate > 0 && dataOff > 0, "missing fmt/data chunk")
    require(bytes.length >= dataOff + dataLen, "truncated WAV")
    val n = (dataLen / 2).toInt // bounded by bytes.length via the require
    val base = dataOff.toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = getShortLE(bytes, base + 2 * i).toShort
      i += 1
    }
    Pcm(sampleRate, samples)
  }

  /** The synthetic sample formula both the encoder and the oracle
    * evaluate: s(t) = ((31·id + 17·t) mod 65536) − 32768 — a full-range
    * integer sawtooth with sign flips, exact on any engine. */
  def synthSample(id: Long, t: Int): Short =
    (((31 * id + 17L * t) % 65536) - 32768).toShort

  /** Decoded-sample statistics: Σ|s|, Σs² (energy), and the
    * zero-crossing count (sign flip between neighbors, zeros count as
    * non-negative) — all integer-exact. */
  def pcmStats(p: Pcm): (Long, Long, Long) = {
    var sumAbs = 0L; var energy = 0L; var zc = 0L
    var i = 0
    while (i < p.samples.length) {
      val s = p.samples(i).toLong
      sumAbs += math.abs(s)
      energy += s * s
      if (i > 0) {
        val prev = p.samples(i - 1).toLong
        if ((prev >= 0) != (s >= 0)) zc += 1
      }
      i += 1
    }
    (sumAbs, energy, zc)
  }
}
