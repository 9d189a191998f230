package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.{MediaFixtures, RealPdfGen}
import graft.functions.{ImageHeaders, PdfImages}
import graft.pdf.RealPdf
import graft.pipeline.CorpusSource

/** Embedded-image mining: XObject discovery, CTM placement, header
  * cross-check, caption pairing — all against authored fixtures whose
  * payloads/dims/placements/captions come from construction, never from the
  * parser under test. */
class PdfImagesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixture(idx: Int): Array[Byte] = {
    val (w0, h0) = CorpusSource.pdfImageDims(idx)
    val jpeg = MediaFixtures.jpeg(w0, h0, 256 + idx)
    val gray = Array.tabulate(16 * 12)(j => ((j * 31 + idx) & 0xff).toByte)
    val page = RealPdfGen.PageSpec(612, 792, Seq(
      RealPdfGen.Placed(50, 40, 12, Seq("Body paragraph above the figures.")),
      RealPdfGen.Placed(50, 360, 10, Seq(CorpusSource.pdfImageCaption(idx, 0))),
      RealPdfGen.Placed(50, 570, 10, Seq(CorpusSource.pdfImageCaption(idx, 1)))),
      compress = true)
    RealPdfGen.buildWithImages(Seq((page, Seq(
      RealPdfGen.PlacedImage(50, 200, 200, 150, w0, h0, jpeg, dct = true),
      RealPdfGen.PlacedImage(50, 470, 120, 90, 16, 12, gray, dct = false)))))
  }

  test("parse discovers both image XObjects with dict metadata and CTM placement") {
    val parsed = RealPdf.parse(fixture(3), maxPages = 50).get
    assert(parsed.decodeFailures == 0)
    val (w0, h0) = CorpusSource.pdfImageDims(3)
    assert(parsed.images.length == 2)
    val im0 = parsed.images.find(_.name == "Im0").get
    val im1 = parsed.images.find(_.name == "Im1").get
    assert(im0.width == w0 && im0.height == h0)
    assert(im0.filter == "DCTDecode" && im0.colorSpace == "DeviceRGB")
    assert(im0.placed && im0.x == 50.0 && im0.yTop == 200.0 &&
      im0.drawW == 200.0 && im0.drawH == 150.0)
    // the raw /DCTDecode stream IS the authored JPEG file
    assert(ImageHeaders.isJpeg(im0.data))
    assert(ImageHeaders.dims(im0.data).contains(ImageHeaders.Dims(w0, h0)))
    assert(im1.width == 16 && im1.height == 12 && im1.filter == "FlateDecode")
    assert(im1.placed && im1.x == 50.0 && im1.yTop == 470.0 &&
      im1.drawW == 120.0 && im1.drawH == 90.0)
    // text extraction is unaffected by the image operators
    assert(parsed.pages.head.blocks.map(_.text).head.startsWith("Body paragraph"))
  }

  test("rotated placement still yields the correct bbox") {
    // 90°-rotation matrix [0 150 -200 0 300 400]: the unit square's corners
    // map to (300,400) (300,550) (100,400) (100,550) → bbox 100..300 × 400..550
    val content = "q\n0 150 -200 0 300 400 cm\n/Im0 Do\nQ\n"
    val scan = RealPdf.extractChunks(content.getBytes("ISO-8859-1"))
    assert(scan.places.length == 1)
    val p = scan.places.head
    assert(p.x0 == 100.0 && p.x1 == 300.0 && p.y0 == 400.0 && p.y1 == 550.0)
  }

  test("an image present in /XObject but never drawn surfaces with placed=false") {
    val jpeg = MediaFixtures.jpeg(20, 10, 7)
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    put("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    put("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    put("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /XObject << /Im0 5 0 R >> >> >>\nendobj\n")
    put("4 0 obj\n<< /Length 1 >>\nstream\n \nendstream\nendobj\n")
    put(s"5 0 obj\n<< /Type /XObject /Subtype /Image /Width 20 /Height 10 " +
      s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode " +
      s"/Length ${jpeg.length} >>\nstream\n")
    out.write(jpeg)
    put("\nendstream\nendobj\n%%EOF\n")
    val parsed = RealPdf.parse(out.toByteArray, maxPages = 50).get
    assert(parsed.images.length == 1)
    val im = parsed.images.head
    assert(!im.placed && im.drawW == 0.0 && im.drawH == 0.0)
    assert(im.width == 20 && im.height == 10)
    assert(ImageHeaders.isJpeg(im.data))
  }

  test("q/Q restore the CTM: a translated draw inside q..Q does not leak to the next Do") {
    val content = "q\n10 0 0 10 500 600 cm\n/Im0 Do\nQ\nq\n20 0 0 20 30 40 cm\n/Im1 Do\nQ\n"
    val scan = RealPdf.extractChunks(content.getBytes("ISO-8859-1"))
    assert(scan.places == Vector(
      RealPdf.ImagePlace("Im0", 500.0, 600.0, 510.0, 610.0),
      RealPdf.ImagePlace("Im1", 30.0, 40.0, 50.0, 60.0)))
  }

  test("imageTable: header cross-check, caption pairing, md5 determinism") {
    val rows = PdfImages.imageTable(CorpusSource.pdfImagePages(spark, 6))
      .collect().sortBy(r => (r.url, r.img_name))
    assert(rows.length == 12)
    for (idx <- 0 until 6) {
      val (w0, h0) = CorpusSource.pdfImageDims(idx)
      val r0 = rows(2 * idx); val r1 = rows(2 * idx + 1)
      assert(r0.img_name == "Im0" && r0.format == "jpeg")
      assert(r0.dict_w == w0 && r0.dict_h == h0)
      assert(r0.header_w == w0 && r0.header_h == h0 && r0.dims_agree)
      assert(r0.caption == CorpusSource.pdfImageCaption(idx, 0))
      assert(r0.img.length.toLong == r0.n_bytes)
      assert(r1.img_name == "Im1" && r1.format == "raw")
      assert(r1.header_w == -1 && !r1.dims_agree)
      assert(r1.caption == CorpusSource.pdfImageCaption(idx, 1))
    }
    // determinism: a second run yields identical md5s (payload bytes stable)
    val again = PdfImages.imageTable(CorpusSource.pdfImagePages(spark, 6))
      .collect().sortBy(r => (r.url, r.img_name))
    assert(rows.map(_.img_md5).toSeq == again.map(_.img_md5).toSeq)
  }

  test("graphics state spans a page's multiple content streams (ISO 32000 §7.8.2)") {
    // writers routinely split `cm` and the `Do` it governs across streams in
    // a /Contents array — the page must parse as ONE concatenated stream
    val jpeg = MediaFixtures.jpeg(20, 10, 7)
    val a = "q\n200 0 0 150 50 400 cm\n"
    val b = "/Im0 Do\nQ\n"
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    put("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    put("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    put("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents [4 0 R 5 0 R] /Resources << /XObject << /Im0 6 0 R >> >> >>\nendobj\n")
    put(s"4 0 obj\n<< /Length ${a.length} >>\nstream\n$a\nendstream\nendobj\n")
    put(s"5 0 obj\n<< /Length ${b.length} >>\nstream\n$b\nendstream\nendobj\n")
    put(s"6 0 obj\n<< /Type /XObject /Subtype /Image /Width 20 /Height 10 " +
      s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode " +
      s"/Length ${jpeg.length} >>\nstream\n")
    out.write(jpeg)
    put("\nendstream\nendobj\n%%EOF\n")
    val parsed = RealPdf.parse(out.toByteArray, maxPages = 50).get
    assert(parsed.images.length == 1)
    val im = parsed.images.head
    assert(im.placed, "Do in the second stream lost the first stream's CTM")
    assert(im.x == 50.0 && im.drawW == 200.0 && im.drawH == 150.0,
      s"(${im.x}, ${im.yTop}, ${im.drawW}, ${im.drawH})")
  }

  test("fuzz: mutated and random payloads never crash image mining, and are deterministic") {
    // crash-safety at 10^12 docs: hostile/corrupt PDFs must yield rows or
    // nothing — never a throw, and identically on every run
    val rng = new java.util.Random(20260817L)
    val base = fixture(5)
    val payloads = (0 until 150).map { i =>
      if (i % 3 == 0) { // byte-flip mutations of a valid image PDF
        val b = base.clone()
        (0 until 1 + rng.nextInt(8)).foreach { _ =>
          b(rng.nextInt(b.length)) = (rng.nextInt(256) - 128).toByte
        }
        b
      } else if (i % 3 == 1) { // truncations
        java.util.Arrays.copyOf(base, 1 + rng.nextInt(base.length))
      } else { // random bytes with a %PDF magic prefix
        val b = new Array[Byte](64 + rng.nextInt(2048))
        rng.nextBytes(b)
        System.arraycopy("%PDF-1.4\n".getBytes("ISO-8859-1"), 0, b, 0, 9)
        b
      }
    }
    def mine(): Seq[(Int, String)] = payloads.zipWithIndex.flatMap { case (p, i) =>
      graft.pdf.RealPdf.parse(p, 50).toSeq.flatMap(_.images).map(im =>
        (i, s"${im.name}:${im.width}x${im.height}:${im.filter}:${im.data.length}"))
    }
    val a = mine()
    val b = mine()
    assert(a == b, "image mining is not deterministic under corruption")
    // the valid-base mutations should still surface SOME images overall
    assert(a.nonEmpty)
  }

  test("body text above a figure is never stolen as its caption") {
    val page = CorpusSource.pdfImagePages(spark, 1).collect().head
    val parsed = RealPdf.parse(page.html, maxPages = 50).get
    assert(parsed.pages.head.blocks.exists(_.text.startsWith("Document 0")))
    val rows = PdfImages.imageTable(CorpusSource.pdfImagePages(spark, 1)).collect()
    assert(rows.length == 2 && rows.forall(r => !r.caption.startsWith("Document")))
  }
}
