package graft.corpus

import java.io.ByteArrayOutputStream

/** Deterministic image-container payloads for the multimodal surfaces: valid
  * headers (PNG IHDR / JPEG SOFn / GIF screen descriptor / BMP info header)
  * carrying authored dimensions, followed by deterministic filler bytes in
  * place of the pixel data (no codecs in this environment — the header IS
  * the tested contract; see functions/ImageHeaders.scala). */
object MediaFixtures {

  private def filler(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var z = seed
    var i = 0
    while (i < n) {
      z += 0x9e3779b97f4a7c15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      out(i) = (x ^ (x >>> 31)).toByte
      i += 1
    }
    out
  }

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** PNG signature + IHDR(w, h, 8-bit RGB) + filler "IDAT". */
  def png(w: Int, h: Int, extraBytes: Int = 256): Array[Byte] = {
    val out = new ByteArrayOutputStream(64 + extraBytes)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    out.write(be32(13), 0, 4) // IHDR length
    out.write("IHDR".getBytes("US-ASCII"), 0, 4)
    out.write(be32(w), 0, 4)
    out.write(be32(h), 0, 4)
    out.write(Array[Byte](8, 2, 0, 0, 0), 0, 5) // depth, color RGB, comp, filt, interlace
    out.write(be32(0), 0, 4) // CRC (not validated by header parse)
    out.write(filler(extraBytes, w.toLong << 32 | h), 0, extraBytes)
    out.toByteArray
  }

  /** JPEG SOI + APP0(JFIF) + COM + DHT (must be SKIPPED by the SOFn scan)
    * + SOF0(h, w) + filler + EOI. */
  def jpeg(w: Int, h: Int, extraBytes: Int = 256): Array[Byte] = {
    val out = new ByteArrayOutputStream(96 + extraBytes)
    def seg(marker: Int, body: Array[Byte]): Unit = {
      out.write(0xff); out.write(marker)
      out.write(be16(body.length + 2), 0, 2)
      out.write(body, 0, body.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xe0, "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xfe, "graft fixture".getBytes("US-ASCII")) // COM
    seg(0xc4, filler(16, 7L)) // DHT — a non-frame Cx marker the scan must skip
    seg(0xc0, Array[Byte](8) ++ be16(h) ++ be16(w) ++
      Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)) // SOF0
    out.write(filler(extraBytes, w.toLong * 31 + h), 0, extraBytes)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** GIF89a header + logical screen (w, h) + trailer. */
  def gif(w: Int, h: Int, extraBytes: Int = 64): Array[Byte] = {
    val out = new ByteArrayOutputStream(16 + extraBytes)
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    out.write(le16(w), 0, 2)
    out.write(le16(h), 0, 2)
    out.write(Array[Byte](0, 0, 0), 0, 3) // flags, bg, aspect
    out.write(filler(extraBytes, w.toLong * 17 + h), 0, extraBytes)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF whose logical screen declares `screenW x screenH` but whose image
    * descriptor declares `frameW x frameH` — the classic frame-descriptor
    * bomb: the decoder sizes the raster from the DESCRIPTOR, so a container
    * header check alone under-counts the allocation. Carries a global color
    * table and one LZW sub-block so readers parse up to the descriptor. */
  def gifFrameBomb(screenW: Int, screenH: Int,
                   frameW: Int, frameH: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    out.write(le16(screenW), 0, 2)
    out.write(le16(screenH), 0, 2)
    out.write(0x80) // GCT present, 2 entries
    out.write(0) // bg index
    out.write(0) // aspect
    out.write(Array[Byte](0, 0, 0, -1, -1, -1), 0, 6) // GCT: black, white
    out.write(0x2c) // image descriptor
    out.write(le16(0), 0, 2) // left
    out.write(le16(0), 0, 2) // top
    out.write(le16(frameW), 0, 2)
    out.write(le16(frameH), 0, 2)
    out.write(0) // no LCT, not interlaced
    out.write(2) // LZW min code size
    out.write(1) // one data sub-block
    out.write(0x4c)
    out.write(0) // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** REAL decodable image (PNG/JPEG/GIF/BMP via JDK ImageIO): a
    * deterministic RGB gradient pattern — pixel (x, y) =
    * (x·7+seed, y·13+seed, x+y+seed) mod 256 per channel — so decoded
    * per-image statistics are a pure function of (kind, w, h, seed).
    * Complements the header-only fixtures above: those exercise the
    * header-parse path, these exercise the full ImageIO pixel-decode path
    * (functions/MultimodalFunctions.decode). */
  def realImage(kind: String, w: Int, h: Int, seed: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h) // bulk setRGB: per-pixel calls are ~10× slower
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 7 + seed) & 0xff
        val g = (y * 13 + seed) & 0xff
        val b = (x + y + seed) & 0xff
        px(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val out = new ByteArrayOutputStream(w * h / 4 + 1024)
    val ok = javax.imageio.ImageIO.write(img, kind, out)
    require(ok, s"no ImageIO writer for $kind")
    out.toByteArray
  }

  /** REAL RIFF/WAVE file (PCM 16-bit little-endian), authored byte-by-byte
    * so every expected statistic is known from construction: `square` wave
    * of amplitude `amp` has RMS exactly `amp`, sine has RMS `amp/√2`. JDK
    * javax.sound decodes WAV natively — the audio analog of [[realImage]].
    * Sample k of the square wave = ±round(amp·32767); sine =
    * round(amp·32767·sin(2π·freq·k/rate)). */
  def wav(freqHz: Int, ms: Int, amp: Double, rate: Int = 8000,
          channels: Int = 1, square: Boolean = true): Array[Byte] = {
    val nFrames = rate * ms / 1000
    val data = new Array[Byte](nFrames * channels * 2)
    var k = 0
    while (k < nFrames) {
      val phase = freqHz.toDouble * k / rate
      val s =
        if (square) { if ((math.floor(phase * 2).toLong % 2) == 0) 1.0 else -1.0 }
        else math.sin(2 * math.Pi * phase)
      val v = math.round(amp * 32767 * s).toInt
      var c = 0
      while (c < channels) {
        val off = (k * channels + c) * 2
        data(off) = (v & 0xff).toByte
        data(off + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      k += 1
    }
    val out = new ByteArrayOutputStream(44 + data.length)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    ascii("RIFF"); out.write(le32(36 + data.length), 0, 4); ascii("WAVE")
    ascii("fmt "); out.write(le32(16), 0, 4)
    out.write(le16(1), 0, 2) // PCM
    out.write(le16(channels), 0, 2)
    out.write(le32(rate), 0, 4)
    out.write(le32(rate * channels * 2), 0, 4) // byte rate
    out.write(le16(channels * 2), 0, 2) // block align
    out.write(le16(16), 0, 2) // bits
    ascii("data"); out.write(le32(data.length), 0, 4)
    out.write(data, 0, data.length)
    out.toByteArray
  }

  /** BMP file header + BITMAPINFOHEADER(w, h). */
  def bmp(w: Int, h: Int, extraBytes: Int = 64): Array[Byte] = {
    val out = new ByteArrayOutputStream(64 + extraBytes)
    out.write('B'); out.write('M')
    out.write(le32(54 + extraBytes), 0, 4) // file size
    out.write(le32(0), 0, 4) // reserved
    out.write(le32(54), 0, 4) // pixel offset
    out.write(le32(40), 0, 4) // info header size
    out.write(le32(w), 0, 4)
    out.write(le32(h), 0, 4)
    out.write(le16(1), 0, 2) // planes
    out.write(le16(24), 0, 2) // bpp
    out.write(filler(24 + extraBytes, w.toLong * 13 + h), 0, 24 + extraBytes)
    out.toByteArray
  }

  /** Per-frame authored luma values for [[y4m]]: frame f's plane is split
    * top-half `a(f)` / bottom-half `b(f)`, so the decoded statistics are
    * exact closed forms — mean = (a+b)/2, population stddev = |a−b|/2, and
    * inter-frame motion (mean abs luma delta) = (|aΔ| + |bΔ|)/2. Specs
    * assert against THESE, not against re-running the decoder. */
  def y4mLuma(f: Int, seed: Int): (Int, Int) =
    ((32 + 24 * f + seed * 7) & 0xff, (96 + 40 * f + seed * 11) & 0xff)

  /** REAL YUV4MPEG2 (.y4m) stream — the uncompressed interchange format of
    * the ffmpeg/x264 toolchain; pure bytes, no codec needed, the video
    * analog of [[wav]]. Header `YUV4MPEG2 W.. H.. F<num>:<den> .. C420jpeg`,
    * then per frame a `FRAME\n` marker + planar 4:2:0 YCbCr. Luma planes are
    * authored by [[y4mLuma]] (exact statistics from construction); chroma
    * planes are constant 128 (neutral). `w`/`h` must be even. */
  def y4m(w: Int, h: Int, frames: Int, fpsNum: Int = 25, fpsDen: Int = 1,
          seed: Int = 0): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "4:2:0 needs even dims")
    val out = new ByteArrayOutputStream(64 + frames * (w * h * 3 / 2 + 8))
    def str(s: String): Unit = { val b = s.getBytes("US-ASCII"); out.write(b, 0, b.length) }
    str(s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n")
    val cSize = (w / 2) * (h / 2)
    var f = 0
    while (f < frames) {
      str("FRAME\n")
      val (a, b) = y4mLuma(f, seed)
      var y = 0
      while (y < h) {
        val v = (if (y < h / 2) a else b).toByte
        var x = 0
        while (x < w) { out.write(v); x += 1 }
        y += 1
      }
      var c = 0
      while (c < 2 * cSize) { out.write(128); c += 1 } // Cb then Cr, neutral
      f += 1
    }
    out.toByteArray
  }

  /** REAL RIFF/AVI container with Motion-JPEG frames ('00dc' chunks in the
    * 'movi' LIST, MainAVIHeader in 'hdrl') — each frame a genuine JPEG
    * authored by the [[realImage]] gradient (ImageIO encodes and decodes it;
    * no external codec). The container walk (RIFF chunks, like [[wav]]) and
    * the per-frame pixel decode are both real; specs pin structure exactly
    * and statistics self-consistently (JPEG is lossy, so expected pixel
    * stats come from decoding the same authored frame bytes). */
  def mjpegAvi(w: Int, h: Int, frames: Int, usPerFrame: Int = 40000,
               seed: Int = 0): Array[Byte] = {
    val jpegs = (0 until frames).map(f => realImage("jpg", w, h, seed + f * 17))
    val out = new ByteArrayOutputStream(256 + jpegs.map(_.length + 9).sum)
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    // MainAVIHeader: dwMicroSecPerFrame..dwReserved[4] = 14 DWORDs (56 bytes)
    val avih = new ByteArrayOutputStream(56)
    def a32(v: Int): Unit = avih.write(le32(v), 0, 4)
    a32(usPerFrame); a32(0); a32(0); a32(0)
    a32(frames); a32(0); a32(1); a32(0)
    a32(w); a32(h); a32(0); a32(0); a32(0); a32(0)
    val hdrl = 4 + 8 + avih.size() // "hdrl" + avih chunk header + body
    val movi = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    fourcc("RIFF"); out.write(le32(4 + 8 + hdrl + 8 + movi), 0, 4); fourcc("AVI ")
    fourcc("LIST"); out.write(le32(hdrl), 0, 4); fourcc("hdrl")
    fourcc("avih"); out.write(le32(avih.size()), 0, 4)
    out.write(avih.toByteArray, 0, avih.size())
    fourcc("LIST"); out.write(le32(movi), 0, 4); fourcc("movi")
    jpegs.foreach { j =>
      fourcc("00dc"); out.write(le32(j.length), 0, 4)
      out.write(j, 0, j.length)
      if ((j.length & 1) == 1) out.write(0) // RIFF chunks are word-aligned
    }
    out.toByteArray
  }
}
