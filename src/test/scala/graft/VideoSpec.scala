package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.MediaFixtures
import graft.functions.MultimodalFunctions
import graft.model.PageRow
import graft.pipeline.CorpusSource

/** Real video frame decode: Y4M statistics are EXACT closed forms from the
  * authored luma planes (MediaFixtures.y4mLuma); MJPEG-AVI structure is
  * exact and pixel stats are self-consistent with an independent ImageIO
  * decode of the same authored frame bytes (JPEG is lossy, so construction
  * can't predict them). Truncation keeps complete leading frames; fuzz
  * never throws; fallbacks are labeled. */
class VideoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pageDs(rows: Seq[(String, Array[Byte])]) = {
    import spark.implicits._
    rows.map { case (u, b) =>
      PageRow(u, new java.sql.Timestamp(1577836800000L), b, null, null)
    }.toDS()
  }

  // column order: url 0, n_bytes 1, md5 2, container 3, n_frames 4,
  // frame_idx 5, frame_ts_ms 6, width 7, height 8, luma_mean 9,
  // luma_std 10, motion 11, decoded 12

  test("y4m: per-frame luma stats match the closed forms exactly") {
    val payload = MediaFixtures.y4m(w = 16, h = 12, frames = 4,
      fpsNum = 25, fpsDen = 1, seed = 3)
    val rows = MultimodalFunctions.videoFrames(
      pageDs(Seq(("https://v.example.org/a.y4m", payload))))
      .collect().sortBy(_.getInt(5))
    assert(rows.length == 4)
    var prev: Option[(Int, Int)] = None
    for (r <- rows) {
      val f = r.getInt(5)
      val (a, b) = MediaFixtures.y4mLuma(f, 3)
      assert(r.getString(3) == "y4m" && r.getBoolean(12))
      assert(r.getLong(4) == 4L && r.getInt(7) == 16 && r.getInt(8) == 12)
      assert(r.getLong(6) == f * 40L, s"ts at 25fps: ${r.getLong(6)}")
      // top half a, bottom half b, h even => EXACT mean and population std
      assert(r.getDouble(9) == (a + b) / 2.0, s"f=$f mean=${r.getDouble(9)}")
      assert(r.getDouble(10) == math.abs(b - a) / 2.0, s"f=$f std")
      val wantMotion = prev match {
        case None => 0.0
        case Some((pa, pb)) => (math.abs(a - pa) + math.abs(b - pb)) / 2.0
      }
      assert(r.getDouble(11) == wantMotion, s"f=$f motion=${r.getDouble(11)}")
      prev = Some((a, b))
    }
  }

  test("y4m: even sampling across long streams; motion spans the gap") {
    val payload = MediaFixtures.y4m(w = 8, h = 6, frames = 20, seed = 0)
    val rows = MultimodalFunctions.videoFrames(
      pageDs(Seq(("https://v.example.org/long.y4m", payload))), maxFrames = 8)
      .collect().sortBy(_.getInt(5))
    assert(rows.map(_.getInt(5)).toSeq == Seq(0, 2, 5, 7, 10, 12, 15, 17),
      "k*n/maxFrames sampling")
    assert(rows.forall(_.getLong(4) == 20L))
    // motion of the 2nd SAMPLE is vs frame 0 (the previous sample), not f1
    val (a0, b0) = MediaFixtures.y4mLuma(0, 0)
    val (a2, b2) = MediaFixtures.y4mLuma(2, 0)
    assert(rows(1).getDouble(11) ==
      (math.abs(a2 - a0) + math.abs(b2 - b0)) / 2.0)
  }

  test("mjpeg avi: structure exact, pixel stats self-consistent with ImageIO") {
    val payload = MediaFixtures.mjpegAvi(w = 32, h = 24, frames = 3,
      usPerFrame = 40000, seed = 1)
    val rows = MultimodalFunctions.videoFrames(
      pageDs(Seq(("https://v.example.org/a.avi", payload))))
      .collect().sortBy(_.getInt(5))
    assert(rows.length == 3)
    for (r <- rows) {
      val f = r.getInt(5)
      assert(r.getString(3) == "avi" && r.getBoolean(12))
      assert(r.getLong(4) == 3L && r.getInt(7) == 32 && r.getInt(8) == 24)
      assert(r.getLong(6) == f * 40L)
      // independent decode of the SAME authored frame bytes
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        MediaFixtures.realImage("jpg", 32, 24, seed = 1 + f * 17)))
      val px = img.getRGB(0, 0, 32, 24, null, 0, 32)
      val lum = px.map { v =>
        (299 * ((v >> 16) & 0xff) + 587 * ((v >> 8) & 0xff) + 114 * (v & 0xff)) / 1000
      }
      val mean = lum.map(_.toLong).sum.toDouble / lum.length
      assert(math.abs(r.getDouble(9) - mean) < 1e-9, s"f=$f luma mean")
      assert(r.getDouble(10) > 0.0, "gradient frames are not flat")
    }
    assert(rows(0).getDouble(11) == 0.0 && rows(1).getDouble(11) > 0.0,
      "different seeds => nonzero inter-frame motion")
  }

  test("truncation keeps complete leading frames (both containers)") {
    val y = MediaFixtures.y4m(w = 16, h = 12, frames = 5, seed = 2)
    val yCut = java.util.Arrays.copyOf(y, y.length * 2 / 3)
    // complete frames in the cut payload, from the format arithmetic
    val headerLen = y.indexOf('\n'.toByte) + 1
    val perFrame = (y.length - headerLen) / 5
    val wantY = (yCut.length - headerLen) / perFrame
    val a = MediaFixtures.mjpegAvi(w = 24, h = 16, frames = 6, seed = 4)
    val aCut = java.util.Arrays.copyOf(a, a.length * 2 / 3)
    val rows = MultimodalFunctions.videoFrames(pageDs(Seq(
      ("https://v.example.org/cut.y4m", yCut),
      ("https://v.example.org/cut.avi", aCut))))
      .collect().groupBy(_.getString(0))
    val yr = rows("https://v.example.org/cut.y4m")
    assert(yr.length == wantY && yr.forall(_.getBoolean(12)))
    assert(yr.forall(_.getLong(4) == wantY.toLong) && wantY >= 1 && wantY < 5)
    val ar = rows("https://v.example.org/cut.avi")
    assert(ar.nonEmpty && ar.length < 6 && ar.forall(_.getBoolean(12)),
      s"AVI cut keeps ${ar.length} complete chunks")
  }

  test("non-video, empty, and fuzzed payloads: one labeled row, never a throw") {
    val valid = MediaFixtures.y4m(w = 8, h = 6, frames = 2, seed = 1)
    val validAvi = MediaFixtures.mjpegAvi(w = 16, h = 16, frames = 2, seed = 0)
    var z = 0x2545f4914f6cdd1dL
    def rnd(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        z = z * 6364136223846793005L + 1442695040888963407L
        out(i) = (z >>> 32).toByte
        i += 1
      }
      out
    }
    def flip(src: Array[Byte], k: Int): Array[Byte] = {
      val c = src.clone()
      var i = 0
      while (i < k) {
        z = z * 6364136223846793005L + 1442695040888963407L
        val pos = math.abs((z >>> 16).toInt) % c.length
        c(pos) = (c(pos) ^ (1 << math.abs(z.toInt % 8))).toByte
        i += 1
      }
      c
    }
    val fuzz = Seq(
      ("html", "<html><body>x</body></html>".getBytes("UTF-8")),
      ("empty", Array.emptyByteArray),
      ("junk-y4m-magic", "YUV4MPEG2 Wx Hy\nFRAMEgarbage".getBytes("UTF-8")),
      ("y4m-zero-dims", "YUV4MPEG2 W0 H0 F25:1\nFRAME\n".getBytes("UTF-8")),
      ("y4m-bomb", s"YUV4MPEG2 W90000 H90000 F25:1\nFRAME\n".getBytes("UTF-8")),
      ("avi-magic-only", "RIFF\u0000\u0000\u0000\u0000AVI ".getBytes("ISO-8859-1")),
      // 10-bit samples are 2 bytes each: reading them at the 8-bit frame
      // size would emit garbage stats labeled decoded=true. Same bytes as a
      // decodable 8-bit stream, only the colorspace tag differs ("C420p10 "
      // is the same length as "C420jpeg", so all frame offsets line up).
      ("y4m-c420p10", new String(valid, "ISO-8859-1")
        .replace("C420jpeg", "C420p10 ").getBytes("ISO-8859-1"))
    ) ++ (0 until 8).map(i => (s"rnd$i", rnd(64 + i * 97))) ++
      (0 until 8).map(i => (s"flipY$i", flip(valid, 1 + i))) ++
      (0 until 8).map(i => (s"flipA$i", flip(validAvi, 1 + i)))
    val rows = MultimodalFunctions.videoFrames(
      pageDs(fuzz.map { case (n, b) => (s"https://v.example.org/$n", b) }))
      .collect() // must not throw
    assert(rows.nonEmpty)
    val byUrl = rows.groupBy(_.getString(0))
    for (n <- Seq("html", "empty", "junk-y4m-magic", "y4m-zero-dims",
        "y4m-bomb", "avi-magic-only", "y4m-c420p10")) {
      val r = byUrl(s"https://v.example.org/$n")
      assert(r.length == 1 && !r.head.getBoolean(12), n)
      assert(r.head.getDouble(9) == 0.0 && r.head.getInt(7) == 0, n)
    }
  }

  test("avi: 10k-deep nested LIST bomb takes the fallback, never a crash") {
    // Each shell is LIST(size)("movi" + inner): 12 bytes per level. Without
    // the depth cap this recursion StackOverflowErrors (an Error — the
    // parse's `catch Exception` would NOT contain it) and kills the task.
    val depth = 10000
    def le32b(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val out = new java.io.ByteArrayOutputStream(32 + depth * 12)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32b(4 + depth * 12))
    out.write("AVI ".getBytes("US-ASCII"))
    var remaining = depth * 12 - 8
    var d = 0
    while (d < depth) {
      out.write("LIST".getBytes("US-ASCII")); out.write(le32b(remaining + 4))
      out.write("movi".getBytes("US-ASCII"))
      remaining -= 12
      d += 1
    }
    val rows = MultimodalFunctions.videoFrames(
      pageDs(Seq(("https://v.example.org/bomb.avi", out.toByteArray))))
      .collect() // must not throw (StackOverflowError included)
    assert(rows.length == 1 && !rows.head.getBoolean(12))
    // ...while a LEGITIMATELY nested movi (RIFF→LIST rec→LIST movi, depth 2,
    // the OpenDML shape) still decodes: the cap bounds depth, not semantics
    val inner = MediaFixtures.mjpegAvi(w = 16, h = 16, frames = 2, seed = 5)
    // splice the fixture's movi LIST inside an extra wrapper LIST
    val moviAt = {
      var i = 12; var found = -1
      while (found < 0 && i + 12 <= inner.length) {
        if (inner(i) == 'L' && inner(i + 8) == 'm' && inner(i + 9) == 'o' &&
            inner(i + 10) == 'v' && inner(i + 11) == 'i') found = i
        else i += 1
      }
      found
    }
    assert(moviAt > 0, "fixture has a movi LIST")
    val pre = java.util.Arrays.copyOfRange(inner, 0, moviAt)
    val moviChunk = java.util.Arrays.copyOfRange(inner, moviAt, inner.length)
    val wrapped = new java.io.ByteArrayOutputStream()
    wrapped.write(pre); wrapped.write("LIST".getBytes("US-ASCII"))
    wrapped.write(le32b(4 + moviChunk.length))
    wrapped.write("rec ".getBytes("US-ASCII")); wrapped.write(moviChunk)
    val w = wrapped.toByteArray
    // patch the RIFF size (offset 4) to the new payload length - 8
    System.arraycopy(le32b(w.length - 8), 0, w, 4, 4)
    val ok = MultimodalFunctions.videoFrames(
      pageDs(Seq(("https://v.example.org/nested.avi", w)))).collect()
    assert(ok.length == 2 && ok.forall(_.getBoolean(12)), "nested movi decodes")
  }

  test("avi: a 00dc size near Int.MaxValue never records a frame that throws") {
    // `body + size.toInt` wraps NEGATIVE for size ≈ 2^31, which passes a
    // `<= end` bounds check: the walk recorded a bogus frame, ran `pos`
    // negative, threw, and the catch-all demoted the WHOLE stream to one
    // fallback row — discarding its valid complete frames (verified: the
    // pre-fix read of this exact input returns decoded=false for ovf1).
    // Subtraction-form bounds skip the bogus chunk and keep the leading
    // frames instead, per the truncation discipline.
    def chunkOffsets(a: Array[Byte]): Seq[Int] = {
      var i = 12; val found = Seq.newBuilder[Int]
      while (i + 4 <= a.length) {
        if (a(i) == '0' && a(i + 1) == '0' && a(i + 2) == 'd' && a(i + 3) == 'c')
          found += i
        i += 1
      }
      found.result()
    }
    def patchSize(a: Array[Byte], chunkOff: Int): Unit = {
      val v = 0x7ffffff0
      a(chunkOff + 4) = (v & 0xff).toByte
      a(chunkOff + 5) = ((v >> 8) & 0xff).toByte
      a(chunkOff + 6) = ((v >> 16) & 0xff).toByte
      a(chunkOff + 7) = ((v >> 24) & 0xff).toByte
    }
    val first = MediaFixtures.mjpegAvi(w = 16, h = 16, frames = 2, seed = 7)
    val firstOffs = chunkOffsets(first)
    assert(firstOffs.length == 2, "fixture has two 00dc chunks")
    patchSize(first, firstOffs(0)) // frame 0 = the eager dims-probe decode
    val second = MediaFixtures.mjpegAvi(w = 16, h = 16, frames = 2, seed = 7)
    patchSize(second, chunkOffsets(second)(1)) // frame 1 = the lazy decode
    val rows = MultimodalFunctions.videoFrames(pageDs(Seq(
      ("https://v.example.org/ovf0.avi", first),
      ("https://v.example.org/ovf1.avi", second))))
      .collect().groupBy(_.getString(0)) // must not throw
    // frame 0 poisoned: no decodable frame 0 → labeled fallback row
    val r0 = rows("https://v.example.org/ovf0.avi")
    assert(r0.length == 1 && !r0.head.getBoolean(12))
    // frame 1 poisoned: the complete leading frame survives, decoded
    val r1 = rows("https://v.example.org/ovf1.avi")
    assert(r1.length == 1 && r1.head.getBoolean(12) && r1.head.getLong(4) == 1L)
  }

  test("videoPages fixture set decodes per its index rule; deterministic") {
    val pages = CorpusSource.videoPages(spark, 64)
    val df = MultimodalFunctions.videoFrames(pages)
    val rows = df.collect()
    val byUrl = rows.groupBy(_.getString(0))
    assert(byUrl.size == 64)
    for ((url, rs) <- byUrl) {
      val idx = url.drop(url.length - 4).toInt
      val authored = 3 + idx % 8
      if (idx % 6 < 4 && idx % 7 == 6) {
        assert(rs.length == 1 && !rs.head.getBoolean(12), s"$url: html fallback")
      } else if (idx % 6 >= 4) {
        // truncated: complete leading frames survive, strictly fewer
        assert(rs.forall(_.getBoolean(12)) && rs.nonEmpty, url)
        assert(rs.head.getLong(4) < authored.toLong, s"$url truncated count")
      } else {
        assert(rs.forall(_.getBoolean(12)), url)
        assert(rs.head.getLong(4) == authored.toLong, s"$url full count")
        assert(rs.head.getString(3) == (if (idx % 2 == 0) "y4m" else "avi"))
      }
    }
    // deterministic across runs (the x-surface contract)
    val again = MultimodalFunctions.videoFrames(pages)
      .collect().map(_.toString).sorted.toSeq
    assert(again == rows.map(_.toString).sorted.toSeq)
  }
}
