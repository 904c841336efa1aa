package graft.multimodal

import java.io.ByteArrayOutputStream

/** Real image codecs for the multimodal pipeline — the piece that
  * retires the round-≤9 "stubbed codec" caveat: encoded bytes go in,
  * decoded pixel planes come out, and every downstream feature is
  * computed from the DECODED pixels, not the container bytes.
  *
  * Two codecs, chosen for verifiability in a container with no native
  * image libraries:
  *
  *  - BMP (24-bit BI_RGB, bottom-up): written and parsed BY HAND here,
  *    byte arithmetic end-to-end. Every structural fact — header
  *    layout, little-endian fields, 4-byte row padding, bottom-up row
  *    order, BGR channel order — is oracle-checkable: the DuckDB side
  *    recomputes expected pixel statistics and the exact container
  *    size in closed form, so a parser bug (wrong stride, flipped
  *    rows, swapped channels) breaks the hash.
  *  - PNG via `javax.imageio` (JDK built-in): a REAL compressed format
  *    — zlib/deflate, filters, chunks — round-tripped through encode →
  *    decode. PNG is lossless, so the decoded planes must equal the
  *    same closed-form pixel truth; the byte stream itself is
  *    encoder-dependent and is deliberately NOT hashed.
  *
  * Scale note: codecs run inside `mapPartitions` over binary payload
  * columns — the decode is embarrassingly parallel, per-row, and the
  * shuffle boundary only ever carries the extracted features (a few
  * dozen bytes/row), never decoded planes. That is the 100 TB shape:
  * payload bytes stay in the scan partition where they were read.
  */
object ImageCodec {

  /** Decoded raster: row-major, packed 0xRRGGBB per pixel. */
  final case class Decoded(width: Int, height: Int, rgb: Array[Int])

  // ------------------------------------------------------------- BMP

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def getIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def getShortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Row stride: 3 bytes/px padded up to a 4-byte boundary. */
  def bmpStride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Exact container size of a [[encodeBmp]] output — the closed form
    * the oracle recomputes (54-byte header + stride·height). */
  def bmpSize(width: Int, height: Int): Int = 54 + bmpStride(width) * height

  /** 24-bit uncompressed bottom-up BMP. `pix(x, y)` returns packed
    * 0xRRGGBB with (0,0) the TOP-left corner (rows are written
    * bottom-up, BGR, as the format demands). */
  def encodeBmp(width: Int, height: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = bmpStride(width)
    val size = bmpSize(width, height)
    val out = new Array[Byte](size) // zero-filled ⇒ padding bytes are 0
    out(0) = 'B'; out(1) = 'M'
    putIntLE(out, 2, size)
    putIntLE(out, 10, 54) // pixel data offset
    putIntLE(out, 14, 40) // BITMAPINFOHEADER size
    putIntLE(out, 18, width)
    putIntLE(out, 22, height) // positive ⇒ bottom-up
    out(26) = 1 // planes
    out(28) = 24 // bpp
    putIntLE(out, 30, 0) // BI_RGB
    putIntLE(out, 34, stride * height)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        val p = pix(x, y)
        val o = rowOff + 3 * x
        out(o) = (p & 0xff).toByte // B
        out(o + 1) = ((p >>> 8) & 0xff).toByte // G
        out(o + 2) = ((p >>> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a 24-bit uncompressed BMP. Dimensions come from the HEADER
    * (not trusted metadata), so the caller's oracle check on
    * width/height gates the parse itself. */
  def decodeBmp(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP")
    val dataOff = getIntLE(bytes, 10)
    val width = getIntLE(bytes, 18)
    val height = getIntLE(bytes, 22)
    val bpp = getShortLE(bytes, 28)
    val compression = getIntLE(bytes, 30)
    require(bpp == 24 && compression == 0,
      s"unsupported BMP: bpp=$bpp compression=$compression")
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = bmpStride(width)
    // Long arithmetic: header-declared dims near Int.MaxValue overflow
    // stride*height / width*height back to small or negative Ints,
    // evading the truncation check and crashing in the allocation
    // instead of rejecting (caught in r10 review)
    require(bytes.length.toLong >= dataOff.toLong + stride.toLong * height,
      "truncated BMP")
    require(width.toLong * height <= Int.MaxValue, "implausible BMP dims")
    val rgb = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val rowOff = dataOff + (height - 1 - y) * stride
      var x = 0
      while (x < width) {
        val o = rowOff + 3 * x
        rgb(y * width + x) =
          ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) |
            (bytes(o) & 0xff)
        x += 1
      }
      y += 1
    }
    Decoded(width, height, rgb)
  }

  // ------------------------------------------------------------- PNG

  /** Per-thread PNG writer/reader: `ImageIO.write`/`ImageIO.read` walk
    * the synchronized IIORegistry on EVERY call — across 32 executor
    * threads the registry lock serializes the whole decode stage
    * (measured: ~20 s for 5000 images at sf0.1 through ImageIO.write,
    * ~1.3 s with per-thread cached plugins — PERF.md r10). Writers and
    * readers are stateful but single-threaded, so a ThreadLocal is the
    * correct cache. */
  private val pngWriter = ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
    javax.imageio.ImageIO.getImageWritersByFormatName("png").next())
  private val pngReader = ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
    javax.imageio.ImageIO.getImageReadersByFormatName("png").next())

  /** PNG encode via the JDK's ImageIO (real zlib/deflate pipeline).
    * `ImageIO.setUseCache(false)` keeps the writer off executor-local
    * temp files — pure in-memory streams. The raster is filled through
    * the TYPE_3BYTE_BGR data buffer directly: per-pixel setRGB routes
    * every pixel through ColorModel dispatch and measured ~10× slower
    * across a 5000-image sf0.1 run (PERF.md r10). */
  def encodePng(width: Int, height: Int, pix: (Int, Int) => Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val buf = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = pix(x, y)
        val o = (y * width + x) * 3
        buf(o) = (p & 0xff).toByte // B
        buf(o + 1) = ((p >>> 8) & 0xff).toByte // G
        buf(o + 2) = ((p >>> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    val w = pngWriter.get()
    w.setOutput(ios)
    w.write(img)
    ios.close()
    baos.toByteArray
  }

  /** PNG decode via ImageIO; lossless, so pixels equal the encoder's
    * input exactly. Fast path reads the TYPE_3BYTE_BGR raster buffer
    * directly (what ImageIO produces for 8-bit RGB PNGs); anything else
    * falls back to the general getRGB path. */
  def decodePng(bytes: Array[Byte]): Decoded = {
    javax.imageio.ImageIO.setUseCache(false)
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = pngReader.get()
    reader.setInput(iis, true, true)
    val img =
      try reader.read(0)
      finally { reader.setInput(null); iis.close() }
    require(img != null, "not a decodable image")
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Int](w * h)
    if (img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR) {
      val buf = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferByte].getData
      var i = 0
      while (i < w * h) {
        val o = i * 3
        rgb(i) = ((buf(o + 2) & 0xff) << 16) | ((buf(o + 1) & 0xff) << 8) |
          (buf(o) & 0xff)
        i += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { rgb(y * w + x) = img.getRGB(x, y) & 0xffffff; x += 1 }
        y += 1
      }
    }
    Decoded(w, h, rgb)
  }

  // ------------------------------------------- deterministic test image

  /** The synthetic pixel formula both the encoder AND the DuckDB
    * oracle evaluate: channel c(x, y) is an affine function of
    * (id, x, y) mod 256 — integer-exact on any engine.
    * r = (7·id + 3x + 5y) % 256, g = (11·id + 2x + 7y) % 256,
    * b = (13·id + 5x + 2y) % 256. */
  def synthPixel(id: Long, x: Int, y: Int): Int = {
    val r = ((7 * id + 3 * x + 5 * y) % 256).toInt
    val g = ((11 * id + 2 * x + 7 * y) % 256).toInt
    val b = ((13 * id + 5 * x + 2 * y) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  // --------------------------------------------- multi-frame container

  /** Minimal multi-frame video container ("GVID"): magic + frame count
    * + an offset index, then whole BMP frames back-to-back — the
    * moving-parts subset of an AVI/MP4-style layout (random access via
    * an index, codec payload per frame). [[decodeVideoFrame]] seeks
    * frame k THROUGH the index and hands the blob to [[decodeBmp]], so
    * frame-sampling a clip never decodes the frames it skips — the
    * property that makes video frame-sampling at 100 TB an index walk,
    * not a full decode. Layout (all LE):
    * bytes 0–3 'G','V','I','D'; 4–7 n_frames; 8–(8+4n) frame byte
    * offsets; frames follow. */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "empty clip")
    val headerLen = 8 + 4 * frames.length
    val total = headerLen + frames.map(_.length).sum
    val out = new Array[Byte](total)
    out(0) = 'G'; out(1) = 'V'; out(2) = 'I'; out(3) = 'D'
    putIntLE(out, 4, frames.length)
    var off = headerLen
    frames.zipWithIndex.foreach { case (f, i) =>
      putIntLE(out, 8 + 4 * i, off)
      System.arraycopy(f, 0, out, off, f.length)
      off += f.length
    }
    out
  }

  /** Number of frames in a GVID clip (header read only). */
  def videoFrameCount(bytes: Array[Byte]): Int = {
    require(bytes.length >= 8 && bytes(0) == 'G' && bytes(1) == 'V' &&
      bytes(2) == 'I' && bytes(3) == 'D', "not a GVID clip")
    getIntLE(bytes, 4)
  }

  /** Decode frame k via the offset index (frames ≠ k are never read). */
  def decodeVideoFrame(bytes: Array[Byte], k: Int): Decoded = {
    val n = videoFrameCount(bytes)
    require(k >= 0 && k < n, s"frame $k of $n")
    val start = getIntLE(bytes, 8 + 4 * k)
    val end = if (k + 1 < n) getIntLE(bytes, 8 + 4 * (k + 1)) else bytes.length
    decodeBmp(java.util.Arrays.copyOfRange(bytes, start, end))
  }

  // ------------------------------------------------------- features

  /** Channel sums + a position-weighted checksum over a decoded plane —
    * the pixel-level statistics pass. All integer: checksum =
    * (Σ_px (r + 2g + 3b)·(1 + x + y·w)) mod M, order-independent but
    * position-sensitive (a flipped row or swapped channel changes it). */
  def planeStats(d: Decoded, hashMod: Long): (Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
    var y = 0
    while (y < d.height) {
      var x = 0
      while (x < d.width) {
        val p = d.rgb(y * d.width + x)
        val r = (p >>> 16) & 0xff; val g = (p >>> 8) & 0xff; val b = p & 0xff
        sr += r; sg += g; sb += b
        ck += (r + 2L * g + 3L * b) * (1L + x + y.toLong * d.width)
        x += 1
      }
      y += 1
    }
    (sr, sg, sb, ck % hashMod)
  }

  /** 2×2 box-filter downsample statistics over a decoded plane — the
    * pixel-level RESIZE the payload-byte tier's mm_resize stands in
    * for. Pooled cell (x, y) carries the INTEGER SUM of the 12 channel
    * samples under it (4 pixels × r+g+b; sums, never means — no
    * division, so the oracle is exact); odd edge rows/columns are
    * cropped (floor semantics, the common libvips/PIL `size // 2`
    * behavior). Returns (w/2, h/2, Σ cells, position-weighted checksum
    * mod hashMod). */
  def boxPool2Stats(d: Decoded, hashMod: Long): (Int, Int, Long, Long) = {
    val w2 = d.width / 2; val h2 = d.height / 2
    var total = 0L; var ck = 0L
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        var s = 0L
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val p = d.rgb((2 * y + dy) * d.width + (2 * x + dx))
            s += ((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)
            dx += 1
          }
          dy += 1
        }
        total += s
        ck += s * (1L + x + y.toLong * w2)
        x += 1
      }
      y += 1
    }
    (w2, h2, total, ck % hashMod)
  }

  /** 64-bit average-hash over an 8×8 sample grid of the decoded plane:
    * sample (i, j) reads pixel (⌊i·w/8⌋, ⌊j·h/8⌋), gray = r+g+b;
    * bit(i,j) = 1 iff 64·gray > Σ grays (integer compare — no float
    * mean, so the bit is exact on both engines). Identical pixels ⇒
    * identical hash REGARDLESS of container bytes — the cross-codec
    * dedup invariant. */
  def aHash(d: Decoded): Long = {
    val grays = new Array[Long](64)
    var total = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val x = i * d.width / 8; val y = j * d.height / 8
        val p = d.rgb(y * d.width + x)
        val g = ((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)
        grays(j * 8 + i) = g
        total += g
        i += 1
      }
      j += 1
    }
    var h = 0L
    var s = 0
    while (s < 64) {
      if (grays(s) * 64 > total) h |= (1L << s)
      s += 1
    }
    h
  }
}
