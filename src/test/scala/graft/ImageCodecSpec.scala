package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.ImageCodec
import graft.multimodal.ImageCodec.Decoded

/** Unit gates for the real image codecs (the query-level gate is the
  * DuckDB closed-form oracle on mm_decode_*): byte-level golden checks
  * for the hand-written BMP writer/parser — endianness, padding,
  * bottom-up row order, BGR channel order — plus round-trip properties
  * across awkward dims and the BMP↔PNG cross-codec equality. */
class ImageCodecSpec extends AnyFunSuite {

  private def rngPix(seed: Long)(x: Int, y: Int): Int =
    ImageCodec.synthPixel(seed * 31 + 7, x, y)

  test("BMP golden bytes: header fields, padding, bottom-up BGR rows") {
    // 2x2 image with distinct channel values per pixel:
    //   (0,0)=0x010203 (0,1)=0x0A0B0C
    //   (1,0)=0x040506 (1,1)=0x0D0E0F
    val pix = Map((0, 0) -> 0x010203, (1, 0) -> 0x040506,
      (0, 1) -> 0x0A0B0C, (1, 1) -> 0x0D0E0F)
    val b = ImageCodec.encodeBmp(2, 2, (x, y) => pix((x, y)))
    // stride: 3*2=6 -> padded to 8; size = 54 + 8*2 = 70
    assert(b.length == 70)
    assert(b(0) == 'B' && b(1) == 'M')
    assert((b(2) & 0xff) == 70 && b(3) == 0 && b(4) == 0 && b(5) == 0) // size LE
    assert((b(10) & 0xff) == 54) // data offset
    assert((b(14) & 0xff) == 40) // info header size
    assert((b(18) & 0xff) == 2 && (b(22) & 0xff) == 2) // w, h LE
    assert((b(26) & 0xff) == 1 && (b(28) & 0xff) == 24) // planes, bpp
    assert((b(30) & 0xff) == 0) // BI_RGB
    // FIRST stored row is the BOTTOM image row (y=1), BGR order:
    //   (0,1)=0x0A0B0C -> bytes 0C 0B 0A; (1,1)=0x0D0E0F -> 0F 0E 0D
    assert((b(54) & 0xff) == 0x0C && (b(55) & 0xff) == 0x0B && (b(56) & 0xff) == 0x0A)
    assert((b(57) & 0xff) == 0x0F && (b(58) & 0xff) == 0x0E && (b(59) & 0xff) == 0x0D)
    assert(b(60) == 0 && b(61) == 0) // row padding
    // second stored row = top image row (y=0)
    assert((b(62) & 0xff) == 0x03 && (b(63) & 0xff) == 0x02 && (b(64) & 0xff) == 0x01)
  }

  test("BMP round-trip across awkward widths (every padding residue)") {
    for (w <- 1 to 9; h <- Seq(1, 2, 5)) {
      val enc = ImageCodec.encodeBmp(w, h, rngPix(w * 100 + h))
      assert(enc.length == ImageCodec.bmpSize(w, h))
      val d = ImageCodec.decodeBmp(enc)
      assert(d.width == w && d.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(d.rgb(y * w + x) == rngPix(w * 100 + h)(x, y),
          s"pixel ($x,$y) of ${w}x$h")
    }
  }

  test("PNG round-trip is lossless and matches the BMP decode exactly") {
    for (seed <- 1L to 5L) {
      val w = 13 + seed.toInt; val h = 7 + seed.toInt
      val pix = rngPix(seed) _
      val viaPng = ImageCodec.decodePng(ImageCodec.encodePng(w, h, pix))
      val viaBmp = ImageCodec.decodeBmp(ImageCodec.encodeBmp(w, h, pix))
      assert(viaPng.width == w && viaPng.height == h)
      assert(viaPng.rgb.toSeq == viaBmp.rgb.toSeq)
    }
  }

  test("PNG bytes are a real compressed container (signature + smaller than raw)") {
    val w = 256; val h = 128
    val png = ImageCodec.encodePng(w, h, (x, y) => 0x404040) // flat image
    // PNG signature
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    // deflate actually compresses the flat plane
    assert(png.length < 3 * w * h / 10, s"png ${png.length} vs raw ${3 * w * h}")
    // corrupting the stream breaks the decode (a fake codec wouldn't care)
    val corrupt = png.clone(); corrupt(png.length / 2) = (corrupt(png.length / 2) ^ 0x5a).toByte
    intercept[Exception] {
      val d = ImageCodec.decodePng(corrupt)
      // javax may silently return a partial image on some corruptions;
      // then the planes must differ — either way the corruption is seen
      if (d.rgb.toSeq == ImageCodec.decodePng(png).rgb.toSeq)
        throw new AssertionError("corruption not detected")
      else throw new RuntimeException("planes differ")
    }
  }

  test("planeStats checksum is position-sensitive (flipped row changes it)") {
    val w = 8; val h = 4
    val d = ImageCodec.decodeBmp(ImageCodec.encodeBmp(w, h, rngPix(42)))
    val flipped = Decoded(w, h,
      (0 until h).reverse.flatMap(y => d.rgb.slice(y * w, y * w + w)).toArray)
    val m = 1000000007L
    assert(ImageCodec.planeStats(d, m)._4 != ImageCodec.planeStats(flipped, m)._4)
    // but channel sums are order-independent
    assert(ImageCodec.planeStats(d, m)._1 == ImageCodec.planeStats(flipped, m)._1)
  }

  test("GVID container: indexed seek decodes exactly the requested frame") {
    val frames = (0 until 5).map(f =>
      ImageCodec.encodeBmp(6, 4, (x, y) => ImageCodec.synthPixel(1000 + f, x, y)))
    val clip = ImageCodec.encodeVideo(frames)
    assert(ImageCodec.videoFrameCount(clip) == 5)
    for (f <- 0 until 5) {
      val d = ImageCodec.decodeVideoFrame(clip, f)
      val ref = ImageCodec.decodeBmp(frames(f))
      assert(d.rgb.toSeq == ref.rgb.toSeq, s"frame $f")
    }
    // frames of different sizes round-trip too (the index carries offsets)
    val mixed = ImageCodec.encodeVideo(Seq(
      ImageCodec.encodeBmp(3, 3, rngPix(1)),
      ImageCodec.encodeBmp(7, 2, rngPix(2))))
    assert(ImageCodec.decodeVideoFrame(mixed, 1).width == 7)
    intercept[IllegalArgumentException](ImageCodec.decodeVideoFrame(mixed, 2))
  }

  test("aHash is container-invariant but pixel-sensitive") {
    val w = 64; val h = 48
    val pix = rngPix(7) _
    val hb = ImageCodec.aHash(ImageCodec.decodeBmp(ImageCodec.encodeBmp(w, h, pix)))
    val hp = ImageCodec.aHash(ImageCodec.decodePng(ImageCodec.encodePng(w, h, pix)))
    assert(hb == hp)
    // brightening one sampled region flips at least one bit
    val bright = (x: Int, y: Int) =>
      if (x < w / 8 && y < h / 8) 0xffffff else pix(x, y)
    val hb2 = ImageCodec.aHash(ImageCodec.decodeBmp(ImageCodec.encodeBmp(w, h, bright)))
    assert(hb2 != hb)
  }
}
