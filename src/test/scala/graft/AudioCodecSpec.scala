package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.AudioCodec

/** Unit gates for the hand-written WAV codec (query-level gate is the
  * DuckDB closed-form oracle on mm_decode_wav_*): golden header bytes,
  * round-trip, chunk-walk robustness, and stat exactness. */
class AudioCodecSpec extends AnyFunSuite {

  private def synth(id: Long, n: Int): Array[Short] =
    Array.tabulate(n)(t => AudioCodec.synthSample(id, t))

  test("WAV golden bytes: RIFF framing, fmt fields, s16le data") {
    val samples = Array[Short](0, 1, -1, 32767, -32768)
    val b = AudioCodec.encodeWav(16000, samples)
    assert(b.length == AudioCodec.wavSize(5))
    assert(new String(b.slice(0, 4)) == "RIFF")
    assert(new String(b.slice(8, 12)) == "WAVE")
    assert(new String(b.slice(12, 16)) == "fmt ")
    assert((b(20) & 0xff) == 1 && b(21) == 0) // PCM
    assert((b(22) & 0xff) == 1) // mono
    // sample rate 16000 = 0x3E80 LE
    assert((b(24) & 0xff) == 0x80 && (b(25) & 0xff) == 0x3e && b(26) == 0)
    assert((b(34) & 0xff) == 16) // bits
    assert(new String(b.slice(36, 40)) == "data")
    assert((b(40) & 0xff) == 10) // data length = 2*5
    // s16le packing: 1 -> 01 00; -1 -> FF FF; 32767 -> FF 7F; -32768 -> 00 80
    assert(b(44) == 0 && b(45) == 0)
    assert(b(46) == 1 && b(47) == 0)
    assert((b(48) & 0xff) == 0xff && (b(49) & 0xff) == 0xff)
    assert((b(50) & 0xff) == 0xff && (b(51) & 0xff) == 0x7f)
    assert((b(52) & 0xff) == 0x00 && (b(53) & 0xff) == 0x80)
  }

  test("round-trip: rate and samples survive exactly, all lengths") {
    for (n <- Seq(1, 2, 7, 1024); rate <- Seq(8000, 44100)) {
      val s = synth(n * 31 + rate, n)
      val p = AudioCodec.decodeWav(AudioCodec.encodeWav(rate, s))
      assert(p.sampleRate == rate)
      assert(p.samples.toSeq == s.toSeq)
    }
  }

  test("chunk walk: a LIST chunk before data is skipped, odd length word-aligned") {
    val s = synth(5, 16)
    val canon = AudioCodec.encodeWav(8000, s)
    // splice an odd-length LIST chunk between fmt and data
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 'I', 'N', 'F', 'O', 'x',
      0 /* pad to word boundary */ )
    val spliced = canon.slice(0, 36) ++ extra ++ canon.slice(36, canon.length)
    // fix RIFF payload size
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte
    spliced(5) = ((total >> 8) & 0xff).toByte
    val p = AudioCodec.decodeWav(spliced)
    assert(p.sampleRate == 8000 && p.samples.toSeq == s.toSeq)
  }

  test("stats: energy/sum_abs/zero-crossings match a direct fold") {
    val s = synth(99, 4096)
    val p = AudioCodec.Pcm(8000, s)
    val (sumAbs, energy, zc) = AudioCodec.pcmStats(p)
    assert(sumAbs == s.map(v => math.abs(v.toLong)).sum)
    assert(energy == s.map(v => v.toLong * v).sum)
    val zcRef = s.toSeq.sliding(2).count {
      case Seq(a, b) => (a >= 0) != (b >= 0); case _ => false
    }
    assert(zc == zcRef)
    assert(zc > 0, "sawtooth must cross zero")
  }

  test("malformed containers are rejected") {
    intercept[IllegalArgumentException](AudioCodec.decodeWav(Array[Byte](1, 2, 3)))
    val ok = AudioCodec.encodeWav(8000, synth(1, 8))
    val notWave = ok.clone(); notWave(8) = 'X'
    intercept[IllegalArgumentException](AudioCodec.decodeWav(notWave))
    val truncated = ok.slice(0, ok.length - 3)
    intercept[IllegalArgumentException](AudioCodec.decodeWav(truncated))
    // a negative chunk length must be rejected, not walk the offset
    // backwards into an infinite loop
    val negLen = ok.clone(); negLen(19) = 0x80.toByte // fmt chunk size -> negative
    intercept[IllegalArgumentException](AudioCodec.decodeWav(negLen))
  }
}
