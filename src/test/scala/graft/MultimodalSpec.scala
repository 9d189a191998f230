package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MultimodalFunctions
import graft.pipeline.CorpusSource

/** Multimodal plumbing: resize arithmetic (exact vs the reference's
  * DetResizeForTest type-0 semantics), frame-sample explode shape, and
  * determinism of the stubbed decodes. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("resizePlan matches the reference arithmetic exactly") {
    import spark.implicits._
    // expected values computed with the reference's formula
    // (limit 960, int() truncation, banker's round to 32, floor 32)
    val cases = Seq(
      (640, 480) -> (640, 480),
      (1920, 1080) -> (960, 544),
      (2048, 2048) -> (960, 960),
      (100, 3000) -> (32, 960),
      (31, 31) -> (32, 32),
      (960, 960) -> (960, 960),
      (1000, 500) -> (960, 480),
      (1008, 504) -> (960, 480))
    val in = cases.map { case ((w, h), _) => (s"u${w}x$h", w, h) }
      .toDF("url", "width", "height")
    val got = MultimodalFunctions.resizePlan(in)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> (r.getInt(3), r.getInt(4))).toMap
    for ((in2, want) <- cases)
      assert(got(in2) == want, s"$in2: got ${got(in2)}, reference says $want")
  }

  test("image headers: hand-authored PNG/JPEG/GIF/BMP dims parse exactly") {
    import graft.corpus.MediaFixtures
    import graft.functions.ImageHeaders
    // hand-authored header bytes (not via MediaFixtures): PNG 800x600
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x03, 0x20, /* 800 */ 0, 0, 0x02, 0x58, /* 600 */
      8, 2, 0, 0, 0).map(_.toByte)
    assert(ImageHeaders.dims(png).contains(ImageHeaders.Dims(800, 600)))
    // GIF 320x200 little-endian
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Int](0x40, 0x01, 0xc8, 0x00, 0, 0, 0).map(_.toByte)
    assert(ImageHeaders.dims(gif).contains(ImageHeaders.Dims(320, 200)))
    // builder round-trips, incl. the JPEG DHT-before-SOF skip
    for ((w, h) <- Seq((1, 1), (960, 540), (4096, 2160), (65535, 3))) {
      assert(ImageHeaders.dims(MediaFixtures.png(w, h)).contains(ImageHeaders.Dims(w, h)))
      assert(ImageHeaders.dims(MediaFixtures.jpeg(w, h)).contains(ImageHeaders.Dims(w, h)))
      assert(ImageHeaders.dims(MediaFixtures.gif(math.min(w, 65535), h))
        .contains(ImageHeaders.Dims(math.min(w, 65535), h)))
      assert(ImageHeaders.dims(MediaFixtures.bmp(w, h)).contains(ImageHeaders.Dims(w, h)))
    }
    // truncation / corruption → None (stub fallback), never a wrong parse
    assert(ImageHeaders.dims(png.take(20)).isEmpty)
    assert(ImageHeaders.dims(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageHeaders.dims(MediaFixtures.jpeg(640, 480).take(10)).isEmpty)
    assert(ImageHeaders.dims(null).isEmpty)
  }

  test("mediaMeta reports real header dims for image rows, stub for the rest") {
    import graft.pipeline.CorpusSource
    val pages = CorpusSource.pages(spark, 32).union(CorpusSource.mediaPages(spark, 24))
    val metas = MultimodalFunctions.mediaMeta(pages).collect()
      .map(r => r.getString(0) -> ((r.getString(2), r.getInt(4), r.getInt(5)))).toMap
    var imgRows = 0
    for ((url, (kind, w, h)) <- metas if url.startsWith("https://img.")) {
      imgRows += 1
      val idx = url.drop(url.length - 4).toInt
      val (ew, eh) = CorpusSource.mediaDims(idx)
      assert((w, h) == ((ew, eh)), s"$url: got ${(w, h)}, authored ${(ew, eh)}")
      val expectKind = Seq("png", "jpeg", "gif", "bmp")(idx % 4)
      assert(kind == expectKind, s"$url sniffed $kind")
    }
    assert(imgRows == 24)
    // non-image payloads keep their sniff kinds and stub dims
    assert(metas.exists { case (u, (k, _, _)) => !u.startsWith("https://img.") && k == "html" })
  }

  test("mediaMeta: real pixel decode — features match hand-computed statistics") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    def bytesOf(img: BufferedImage, fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no writer for $fmt")
      out.toByteArray
    }
    // 2x1 black|white: meanR=G=B=127.5/255=0.5; grays {0,255} -> mean 0.5,
    // stddev 127.5/255=0.5, entropy 1 bit -> 1/8; aspect min/max = 1/2
    val bw = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    bw.setRGB(0, 0, 0x000000); bw.setRGB(1, 0, 0xffffff)
    // 3x3 solid (10,20,30): gray = (299*10+587*20+114*30)/1000 = 18 (int div)
    val solid = new BufferedImage(3, 3, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 3; y <- 0 until 3) solid.setRGB(x, y, (10 << 16) | (20 << 8) | 30)
    // 16x16 solid mid-gray JPEG: lossy, but a uniform block round-trips close
    val gray = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 16; y <- 0 until 16) gray.setRGB(x, y, 0x808080)
    val pages = Seq(
      ("https://px.example.org/bw.png", bytesOf(bw, "png")),
      ("https://px.example.org/bw.gif", bytesOf(bw, "gif")), // 2 colors: exact palette
      ("https://px.example.org/solid.bmp", bytesOf(solid, "bmp")),
      ("https://px.example.org/gray.jpg", bytesOf(gray, "jpeg")),
      // header-only fixture: ImageIO cannot decode -> labeled fallback
      ("https://px.example.org/hdr.png", graft.corpus.MediaFixtures.png(800, 600))
    ).map { case (u, b) =>
      graft.model.PageRow(u, new java.sql.Timestamp(1577836800000L), b, null, null)
    }.toDS()
    val rows = MultimodalFunctions.mediaMeta(pages).collect()
      .map(r => r.getString(0) ->
        ((r.getString(2), r.getInt(4), r.getInt(5),
          r.getSeq[Float](6).toArray, r.getBoolean(7)))).toMap
    def close(got: Array[Float], want: Array[Double], tol: Double): Unit =
      for (i <- want.indices)
        assert(math.abs(got(i) - want(i)) <= tol,
          s"feature[$i]: got ${got(i)}, want ${want(i)} (tol $tol): ${got.mkString(",")}")
    val (kBw, wBw, hBw, fBw, dBw) = rows("https://px.example.org/bw.png")
    assert((kBw, wBw, hBw, dBw) == (("png", 2, 1, true)))
    close(fBw, Array(0.5, 0.5, 0.5, 0.5, 0.5, 1.0 / 8, 0.5, 1.0), 1e-6)
    val (kG, wG, hG, fG, dG) = rows("https://px.example.org/bw.gif")
    assert((kG, wG, hG, dG) == (("gif", 2, 1, true)))
    close(fG, Array(0.5, 0.5, 0.5, 0.5, 0.5, 1.0 / 8, 0.5, 1.0), 1e-6)
    val (kS, wS, hS, fS, dS) = rows("https://px.example.org/solid.bmp")
    assert((kS, wS, hS, dS) == (("bmp", 3, 3, true)))
    close(fS, Array(10.0 / 255, 20.0 / 255, 30.0 / 255, 18.0 / 255, 0, 0, 1.0, 1.0), 1e-6)
    val (kJ, wJ, hJ, fJ, dJ) = rows("https://px.example.org/gray.jpg")
    assert((kJ, wJ, hJ, dJ) == (("jpeg", 16, 16, true)))
    close(fJ, Array(128.0 / 255, 128.0 / 255, 128.0 / 255, 128.0 / 255,
      0, 0, 1.0, 1.0), 0.02) // DCT tolerance: uniform block, near-lossless
    // undecodable: header dims recovered, digest feature, decoded=false
    val (kH, wH, hH, fH, dH) = rows("https://px.example.org/hdr.png")
    assert((kH, wH, hH, dH) == (("png", 800, 600, false)))
    assert(fH.forall(f => f >= 0.0f && f <= 1.0f))
    // determinism: same inputs -> bit-identical features
    val again = MultimodalFunctions.mediaMeta(pages).collect()
      .map(r => r.getString(0) -> r.getSeq[Float](6)).toMap
    for ((u, (_, _, _, f, _)) <- rows)
      assert(again(u).toArray.toSeq == f.toSeq, s"$u features not deterministic")
    // a REAL image truncated mid-stream: decode fails, but the intact IHDR
    // still yields header dims via the labeled fallback — never a crash,
    // never a fabricated decode
    val realPng = bytesOf(bw, "png")
    val cutPages = Seq(graft.model.PageRow("https://px.example.org/cut.png",
      new java.sql.Timestamp(1577836800000L),
      java.util.Arrays.copyOf(realPng, 40), null, null)).toDS()
    val cut = MultimodalFunctions.mediaMeta(cutPages).collect().head
    assert(cut.getString(2) == "png" && !cut.getBoolean(7))
    assert((cut.getInt(4), cut.getInt(5)) == ((2, 1)), "IHDR dims recovered")
  }

  test("mediaMeta: mediaPages real-image rounds decode with authored dims") {
    val pages = CorpusSource.mediaPages(spark, 24)
    val rows = MultimodalFunctions.mediaMeta(pages).collect()
      .map(r => r.getString(0) -> ((r.getInt(4), r.getInt(5), r.getBoolean(7)))).toMap
    for ((url, (w, h, dec)) <- rows) {
      val idx = url.drop(url.length - 4).toInt
      assert((w, h) == CorpusSource.mediaDims(idx), url)
      assert(dec == ((idx / 4) % 2 == 1), s"$url decoded=$dec") // real rounds decode
    }
    assert(rows.count(_._2._3) == 12)
  }

  test("frameSample: per-frame rows, bounded, deterministic") {
    val pages = CorpusSource.pages(spark, 48)
    val frames = MultimodalFunctions.frameSample(pages, strideBytes = 1024, maxFrames = 5)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    val byUrl = rows.groupBy(_.getString(0))
    assert(byUrl.size == 48) // every page yields at least one frame
    byUrl.values.foreach { fs =>
      val idxs = fs.map(_.getInt(1)).sorted
      assert(idxs.head == 0 && idxs.length <= 5)
      assert(idxs.toSeq == (0 until idxs.length)) // contiguous frame indices
      // 25fps spacing
      fs.foreach(r => assert(r.getLong(2) == r.getInt(1) * 40L))
    }
    // deterministic across runs
    val again = MultimodalFunctions.frameSample(pages, 1024, 5)
      .collect().map(_.toString).sorted.toSeq
    assert(again == rows.map(_.toString).sorted.toSeq)
    // larger payloads yield more frames (up to the cap)
    val counts = byUrl.map { case (u, fs) => u -> fs.length }
    assert(counts.values.exists(_ == 5) && counts.values.exists(_ < 5))
  }
}
