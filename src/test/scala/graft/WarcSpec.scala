package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.{Corpus, Warc}
import graft.pipeline.{CorpusSource, Extract}

/** WARC/1.0 ingestion contract: Content-Length framing, non-response
  * skipping, gzip members, truncation tolerance — and byte-identity of the
  * parsed pages (and their extractions) against the golden corpus.
  */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val N = 48

  test("plain WARC round-trips url/ts/html byte-identically; skips non-response") {
    val bytes = Warc.sampleFile(42L, N, gzip = false)
    val all = Warc.parseRecords(bytes)
    // warcinfo + (request + response) per page, all framed correctly
    assert(all.length == 1 + 2 * N)
    assert(all.head.warcType == "warcinfo")
    val rows = Warc.pageRows(bytes).toVector
    assert(rows.length == N, "exactly the response records survive")
    val golden = (0 until N).map(i => Corpus.page(42L, i).row)
    rows.zip(golden).foreach { case (got, want) =>
      assert(got.url == want.url)
      assert(got.warc_ts == want.warc_ts, s"ts must survive WARC-Date round-trip (${want.url})")
      assert(java.util.Arrays.equals(got.html, want.html),
        s"html must be byte-identical through HTTP framing (${want.url})")
    }
  }

  test("per-record gzip members parse identically to the plain file") {
    val plain = Warc.pageRows(Warc.sampleFile(42L, N, gzip = false)).toVector
    val gz = Warc.pageRows(Warc.sampleFile(42L, N, gzip = true)).toVector
    assert(gz.length == plain.length)
    gz.zip(plain).foreach { case (a, b) =>
      assert(a.url == b.url && a.warc_ts == b.warc_ts)
      assert(java.util.Arrays.equals(a.html, b.html))
    }
  }

  test("truncated tail drops the partial record, keeps complete ones") {
    val bytes = Warc.sampleFile(42L, 8, gzip = false)
    val whole = Warc.parseRecords(bytes)
    // cut mid-way through the LAST record's block
    val lastLen = whole.last.block.length
    val cut = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - lastLen / 2 - 4)
    val got = Warc.parseRecords(cut)
    assert(got.length == whole.length - 1, "partial final record must be dropped")
    got.zip(whole).foreach { case (a, b) => assert(a.targetUri == b.targetUri) }
  }

  test("a Content-Length near Long.MaxValue is a truncated block, not a bomb") {
    // `blockStart + clen` wraps negative for clen ≈ 2^63 and passed the old
    // addition-form check; copyOfRange then received an attacker-chosen
    // low-32-bit `to` — and copyOfRange ZERO-PADS past the source end, so a
    // chosen `to` ≈ 2^31 allocates ~2 GB from one crafted header line.
    // Subtraction-form bounds reject it as a truncated block instead.
    val good = Warc.sampleFile(42L, 2, gzip = false)
    val before = Warc.parseRecords(good)
    assert(before.length == 5) // warcinfo + 2 × (request + response)
    for (clen <- Seq(Long.MaxValue, Long.MaxValue - 42, 4294967296L + 1024)) {
      val poison = ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: https://w.example.org/poison\r\n" +
        "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
        s"Content-Length: $clen\r\n\r\n").getBytes("UTF-8") ++
        Array.fill[Byte](64)('A')
      val got = Warc.parseRecords(good ++ poison) // must not throw or blow up
      assert(got.length == before.length,
        s"clen=$clen: complete leading records survive, poisoned one dropped")
      got.zip(before).foreach { case (a, b) => assert(a.targetUri == b.targetUri) }
    }
  }

  test("a gzip bomb member caps retention, recovers the boundary, keeps later members") {
    // one member inflating to 280 MiB (zeros: deflate ~1000:1, so the
    // crafted payload is ~300 KB) followed by a VALID member: the walk must
    // retain at most the 256 MiB ceiling for the bomb, still recover the
    // member boundary, and parse the trailing member — the bomb's record is
    // dropped as a truncated block, never an unbounded allocation
    val bomb = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bomb, 1 << 16)
    val zeros = new Array[Byte](1 << 16)
    var written = 0L
    while (written < (280L << 20)) { gz.write(zeros); written += zeros.length }
    gz.finish(); gz.close()
    val tail = Warc.sampleFile(7L, 1, gzip = true) // valid member(s) after it
    val members = Warc.gzipMembers(bomb.toByteArray ++ tail)
    assert(members.length >= 2, "boundary recovered: trailing members parse")
    assert(members.head.bytes.length == (1 << 28), "bomb retained only to the ceiling")
    val cdx = Warc.cdxRows(bomb.toByteArray ++ tail)
    assert(cdx.length == 1, "the valid response indexes; the bomb yields no row")
  }

  test("truncated/corrupt .warc.gz degrades to the readable prefix, never throws") {
    val gz = Warc.sampleFile(42L, 8, gzip = true)
    val whole = Warc.parseRecords(gz)
    // cut mid-stream: every record fully inside the inflated prefix survives
    val cut = java.util.Arrays.copyOfRange(gz, 0, gz.length / 2)
    val got = Warc.parseRecords(cut) // must not throw
    assert(got.length < whole.length)
    got.zip(whole).foreach { case (a, b) => assert(a.targetUri == b.targetUri) }
    // deflate-body corruption mid-file: no throw (content at the damage
    // point may legitimately differ — corrupted bytes are emitted before the
    // member-end CRC rejects the stream, so only the no-throw framing
    // contract holds, not content equality)
    val flipped = gz.clone()
    flipped(gz.length / 2) = (flipped(gz.length / 2) ^ 0x5a).toByte
    Warc.parseRecords(flipped)
    // pinned fuzz: single-byte mutations anywhere never throw
    val rnd = new scala.util.Random(0x0a5cL)
    for (_ <- 0 until 200) {
      val b = gz.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Warc.parseRecords(b)
      Warc.cdxRows(b)
    }
    val plain = Warc.sampleFile(42L, 8, gzip = false)
    for (_ <- 0 until 200) {
      val b = plain.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Warc.parseRecords(b)
    }
  }

  test("header names are case-insensitive; bare payload block tolerated") {
    val body = "<html><body><p>Case test page body here.</p></body></html>"
    // correct version line (case-sensitive by spec) but lowercase header names
    val manual = ("WARC/1.0\r\n" +
      "warc-type: response\r\n" +
      "warc-target-uri: http://x.example/a\r\n" +
      "warc-date: 2024-01-02T03:04:05.000000Z\r\n" +
      s"content-length: ${body.length}\r\n" +
      "\r\n" + body + "\r\n\r\n").getBytes("UTF-8")
    val rows = Warc.pageRows(manual).toVector
    assert(rows.length == 1)
    assert(rows.head.url == "http://x.example/a")
    // block has no CRLF CRLF header/body split → the whole block is the page
    assert(new String(rows.head.html, "UTF-8") == body)
  }

  test("gzip member walk: offsets/lengths slice back to exactly one record each") {
    val raw = Warc.sampleFile(7L, N, gzip = true)
    val members = Warc.gzipMembers(raw)
    // the fixture writes 1 warcinfo + N requests + N responses, one per member
    assert(members.size == 1 + 2 * N, s"members: ${members.size}")
    // THE CDX contract: re-inflating the sliced [offset, offset+length)
    // bytes alone must reproduce the member's record — and the members
    // must tile the file exactly (no gaps, no overlap)
    var expectedOff = 0L
    members.foreach { m =>
      assert(m.offset == expectedOff, s"gap/overlap at ${m.offset}")
      expectedOff = m.offset + m.length
      val slice = java.util.Arrays.copyOfRange(raw, m.offset.toInt, (m.offset + m.length).toInt)
      assert(java.util.Arrays.equals(Warc.inflate(slice), m.bytes),
        s"slice at ${m.offset} does not re-inflate to the member")
      assert(Warc.parseRecords(m.bytes).size == 1, "one record per member (CC convention)")
    }
    assert(expectedOff == raw.length.toLong, "members must cover the whole segment")
  }

  test("cdxRows: response-only, digest matches the page bytes, SURT key shape") {
    val raw = Warc.sampleFile(7L, N, gzip = true)
    val rows = Warc.cdxRows(raw)
    assert(rows.size == N, s"one CDX row per response: ${rows.size}")
    val pages = (0 until N).map(i => graft.corpus.Corpus.page(7L, i).row)
    val byUrl = rows.map(r => r.url -> r).toMap
    pages.foreach { p =>
      val r = byUrl(p.url)
      assert(r.ts == p.warc_ts, s"capture ts round-trip (${p.url})")
      val md = java.security.MessageDigest.getInstance("MD5").digest(p.html)
      assert(r.digest == md.map(b => f"${b & 0xff}%02x").mkString, "body digest")
      assert(r.urlkey.contains(")") && !r.urlkey.contains("://"), r.urlkey)
    }
  }

  test("surtKey: host reversed and lowercased, port/fragment dropped") {
    assert(Warc.surtKey("http://www.Example.com/A/b?x=1") == "com,example,www)/a/b?x=1")
    assert(Warc.surtKey("https://sub.host.org:8080/p#frag") == "org,host,sub)/p")
    assert(Warc.surtKey("http://example.com") == "com,example)/")
    assert(Warc.surtKey("not a url") == "not a url")
  }

  test("extraction over WARC ingestion equals extraction over direct rows") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempFile("graft_warcspec", ".warc.gz")
    p.toFile.deleteOnExit()
    java.nio.file.Files.write(p, Warc.sampleFile(42L, N, gzip = true))
    val viaWarc = Extract.run(Warc.pages(spark, p.toString))
      .map(d => (d.url, d.text)).collect().toMap
    val direct = Extract.run(CorpusSource.pages(spark, N))
      .map(d => (d.url, d.text)).collect().toMap
    assert(viaWarc.keySet == direct.keySet)
    direct.foreach { case (url, text) =>
      assert(viaWarc(url) == text, s"extracted text must be byte-identical ($url)")
    }
  }

  test("wetExport: WET round-trips url/ts/extracted-text byte-identically") {
    import spark.implicits._
    val segs = Warc.wetExport(CorpusSource.pages(spark, N)).collect()
    assert(segs.nonEmpty && segs.forall(_.nonEmpty))
    val rows = segs.flatMap(Warc.wetRows).map(d => d.url -> d).toMap
    val direct = Extract.run(CorpusSource.pages(spark, N))
      .map(d => (d.url, d.text)).collect().toMap
    assert(rows.keySet == direct.keySet, "one conversion record per page")
    val ts = (0 until N).map(i => Corpus.page(42L, i).row).map(p => p.url -> p.warc_ts).toMap
    rows.foreach { case (url, d) =>
      assert(d.text == direct(url), s"WET text must be byte-identical ($url)")
      assert(d.ts == ts(url), s"capture ts must round-trip ($url)")
    }
    // the CC member convention holds for WET too: each segment tiles into
    // per-record gzip members a CDX-style index could seek into
    segs.foreach { seg =>
      val members = Warc.gzipMembers(seg)
      assert(members.map(_.length).sum == seg.length, "members tile the segment")
      members.foreach(m => assert(Warc.parseRecords(m.bytes).size == 1))
    }
    // warcinfo leader is present but wetRows filters to conversion records
    assert(segs.map(s => Warc.parseRecords(s).size).sum == N + segs.length)
  }

  // ---- r5 review hardening ----

  test("LF-only HTTP message: status/header lines do not leak into page bytes") {
    val body = "<html><body>LF body.</body></html>"
    val http = s"HTTP/1.1 200 OK\nContent-Type: text/html\n\n$body"
    val manual = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: http://x.example/lf\r\n" +
      "WARC-Date: 2024-01-02T03:04:05.000000Z\r\n" +
      s"Content-Length: ${http.length}\r\n" +
      "\r\n" + http + "\r\n\r\n").getBytes("UTF-8")
    val rows = Warc.pageRows(manual).toVector
    assert(rows.length == 1)
    assert(new String(rows.head.html, "UTF-8") == body)
    // a bare payload that CONTAINS \n\n but is not an HTTP message stays whole
    val bare = "first para\n\nsecond para".getBytes("UTF-8")
    assert(Warc.httpBody(bare).sameElements(bare))
  }

  test("mixed-case WARC-Type values classify identically in pages, cdx, and wet") {
    val body = "<html><body>Cased.</body></html>"
    def rec(t: String) = ("WARC/1.0\r\n" +
      s"WARC-Type: $t\r\n" +
      "WARC-Target-URI: http://x.example/c\r\n" +
      "WARC-Date: 2024-01-02T03:04:05.000000Z\r\n" +
      s"Content-Length: ${body.length}\r\n" +
      "\r\n" + body + "\r\n\r\n").getBytes("UTF-8")
    assert(Warc.pageRows(rec("Response")).size == 1)
    val gz = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(rec("Response")); g.close(); out.toByteArray
    }
    assert(Warc.cdxRows(gz).size == 1, "cdx must index what pages processes")
  }

  test("malformed WARC-Date in a conversion record keeps the record with epoch ts") {
    val text = "wet text"
    val manual = ("WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      "WARC-Target-URI: http://x.example/w\r\n" +
      "WARC-Date: not-a-date\r\n" +
      s"Content-Length: ${text.length}\r\n" +
      "\r\n" + text + "\r\n\r\n").getBytes("UTF-8")
    val rows = Warc.wetRows(manual)
    assert(rows.length == 1)
    assert(rows.head.ts.getTime == 0L)
    assert(rows.head.text == text)
  }

  test("emitted records declare WARC/1.1 (microsecond WARC-Date needs 1.1)") {
    val f = Warc.sampleFile(7L, 2, gzip = false)
    val head = new String(f, 0, 10, "UTF-8")
    assert(head.startsWith("WARC/1.1"), head)
  }
}
