package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.corpus.Corpus
import graft.extract.{ExtractConfig, Extractor, ExtractorState}
import graft.model.{ExtractedDoc, PageRow}

/** Distributed synthetic corpus source. Pure function of (seed, index), so the
  * corpus parallelizes embarrassingly via spark.range → mapPartitions with no
  * shuffle and no driver-side materialization (scales to any row count — the
  * sandbox proxy for reading the 10^12-row Iceberg pages table).
  */
object CorpusSource {
  /** spark.range index → fixture index. The synthetic generators are
    * Int-indexed (Corpus.page takes Int); a silent `i.toInt` past 2^31
    * wrapped NEGATIVE and re-emitted earlier fixtures as duplicates while
    * claiming to extend the corpus. Honest contract: the synthetic corpus
    * is a test/bench artifact bounded at 2^31 rows — the 10^12-row design
    * path reads REAL tables — so fail loudly at the boundary instead of
    * fabricating a corpus that silently repeats. */
  private def fixtureIdx(i: Long): Int = {
    require(i <= Int.MaxValue, s"synthetic corpus index $i exceeds the Int fixture space")
    i.toInt
  }

  def pages(spark: SparkSession, n: Long, seed: Long = 42L,
            partitions: Int = 0): Dataset[PageRow] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    base.mapPartitions(_.map(i => Corpus.page(seed, fixtureIdx(i)).row))
  }

  def goldenExpected(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[(String, String)] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val g = Corpus.page(seed, fixtureIdx(i))
      (g.row.url, g.expectedText)
    })
  }

  def goldenLabels(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[(String, Seq[String])] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val g = Corpus.page(seed, fixtureIdx(i))
      (g.row.url, g.expectedLabels: Seq[String])
    })
  }

  /** Deterministic image-container pages (PNG/JPEG/GIF/BMP headers with
    * authored dimensions + filler bytes — corpus/MediaFixtures): the
    * multimodal fixture set whose width/height the media pipeline must
    * recover by REAL header parsing (functions/ImageHeaders). Authored dims
    * are a pure function of the index, so specs can assert them exactly. */
  def mediaPages(spark: SparkSession, n: Long): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val idx = fixtureIdx(i)
      val (w, h) = mediaDims(idx)
      // alternate rounds: header-only payloads (exercise the header-parse
      // fallback) vs REAL ImageIO-decodable images (exercise pixel decode)
      val kinds = Seq("png", "jpeg", "gif", "bmp")
      val payload =
        if ((idx / 4) % 2 == 1)
          graft.corpus.MediaFixtures.realImage(kinds(idx % 4), w, h, seed = idx)
        else (idx % 4) match {
          case 0 => graft.corpus.MediaFixtures.png(w, h, 256 + idx)
          case 1 => graft.corpus.MediaFixtures.jpeg(w, h, 256 + idx)
          case 2 => graft.corpus.MediaFixtures.gif(w, h, 64 + idx)
          case _ => graft.corpus.MediaFixtures.bmp(w, h, 64 + idx)
        }
      val url = String.format(java.util.Locale.ROOT,
        "https://img.example.org/m%04d", Integer.valueOf(idx))
      PageRow(url, new java.sql.Timestamp(1577836800000L + idx.toLong * 3600000L),
        payload, null, null)
    })
  }

  /** Deterministic audio-payload pages (REAL PCM-16 RIFF/WAVE bytes authored
    * by `MediaFixtures.wav` — square or sine waves whose RMS/peak/zcr are
    * known from construction) plus labeled non-decodable rows: every 6th
    * payload is a truncated WAV (header intact, data cut), every 7th an
    * HTML payload (not audio at all) — the audioMeta fallback set. */
  def audioPages(spark: SparkSession, n: Long): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val idx = fixtureIdx(i)
      val full = graft.corpus.MediaFixtures.wav(
        freqHz = 220 * (1 + idx % 4), ms = 40 + (idx % 5) * 20,
        amp = 0.25 * (1 + idx % 3), rate = 8000,
        channels = 1 + (idx % 2), square = idx % 2 == 0)
      val payload =
        if (idx % 6 == 5) java.util.Arrays.copyOf(full, 30) // truncated
        else if (idx % 7 == 6) s"<html><body>not audio $idx</body></html>".getBytes("UTF-8")
        else full
      val url = String.format(java.util.Locale.ROOT,
        "https://audio.example.org/a%04d", Integer.valueOf(idx))
      PageRow(url, new java.sql.Timestamp(1577836800000L + idx.toLong * 3600000L),
        payload, null, null)
    })
  }

  /** Deterministic video-payload pages: REAL YUV4MPEG2 streams
    * (`MediaFixtures.y4m` — authored luma planes with closed-form
    * statistics) and REAL Motion-JPEG AVI containers
    * (`MediaFixtures.mjpegAvi` — genuine ImageIO-decoded JPEG frames),
    * plus the truncated set (idx%6 ∈ {4,5} — one parity each, so BOTH
    * containers get cut mid-frame coverage; complete leading frames must
    * survive) and every 7th an HTML payload (not video at all — the
    * labeled fallback). Frame counts 3–10, dims and fps vary with index —
    * all a pure function of (idx), so VideoSpec asserts exact values. */
  def videoPages(spark: SparkSession, n: Long): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val idx = fixtureIdx(i)
      val frames = 3 + idx % 8
      val full =
        if (idx % 2 == 0)
          graft.corpus.MediaFixtures.y4m(
            w = 16 + (idx % 3) * 8, h = 12 + (idx % 2) * 4, frames = frames,
            fpsNum = if (idx % 4 == 0) 25 else 30, fpsDen = 1, seed = idx)
        else
          graft.corpus.MediaFixtures.mjpegAvi(
            w = 24 + (idx % 3) * 8, h = 16 + (idx % 2) * 8, frames = frames,
            usPerFrame = 40000 - (idx % 3) * 6000, seed = idx)
      val payload =
        if (idx % 6 >= 4) java.util.Arrays.copyOf(full, full.length * 2 / 3)
        else if (idx % 7 == 6) s"<html><body>not video $idx</body></html>".getBytes("UTF-8")
        else full
      val url = String.format(java.util.Locale.ROOT,
        "https://video.example.org/v%04d", Integer.valueOf(idx))
      PageRow(url, new java.sql.Timestamp(1577836800000L + idx.toLong * 3600000L),
        payload, null, null)
    })
  }

  /** Deterministic MathML pages (formula branch, the graft of the
    * reference's `equation` regions → LaTeX contract,
    * ppstructure/predict_system.py:171-174): a pure function of the index
    * cycling six shapes — (0) display math with a TeX annotation (the
    * Wikipedia/MathJax shape: presentation suppressed, raw TeX kept),
    * (1) inline presentation-only math inside a sentence, (2) a formula in a
    * table cell, (3) two inline formulas in one paragraph, (4) an
    * annotation-xml distractor that must never surface, (5) math inside
    * <nav> boilerplate (dropped whole), (6) a plain-webtext `$$…$$` source
    * block (the MathJax convention), (7) a plain-webtext `\[…\]` block.
    * Expected formula sources are closed-form per index (FormulaSpec pins
    * the per-shape semantics). */
  def mathPages(spark: SparkSession, n: Long): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val idx = fixtureIdx(i)
      val a = 1 + idx % 7
      val b = 2 + idx % 5
      val body = (idx % 8) match {
        case 0 =>
          s"""<p>Identity number $idx for the record books.</p>
             |<p><math display="block"><semantics><mrow><mi>x</mi><mo>=</mo><mn>$a</mn></mrow>
             |<annotation encoding="application/x-tex">x_{$idx} = \\frac{$a}{$b}</annotation></semantics></math></p>""".stripMargin
        case 1 =>
          s"""<p>Setting <math><mi>k</mi><mo>=</mo><mn>$a</mn></math> gives the bound used in section $idx of the text.</p>"""
        case 2 =>
          s"""<table><tr><td>row $idx label cell</td><td><math><semantics><mrow><mi>E</mi></mrow><annotation encoding="application/x-tex">E_{$idx}=m c^{$b}</annotation></semantics></math></td></tr></table>"""
        case 3 =>
          s"""<p>Given <math><mi>a</mi><mo>=</mo><mn>$a</mn></math> and <math><mi>b</mi><mo>=</mo><mn>$b</mn></math> the sum follows for case $idx.</p>"""
        case 4 =>
          s"""<p>Content sum <math><mrow><mi>s</mi><mo>=</mo><mn>$a</mn></mrow><annotation-xml encoding="MathML-Content"><apply><eq/><ci>s</ci><cn>$a</cn></apply></annotation-xml></math> holds in document $idx.</p>"""
        case 5 =>
          s"""<nav><math><mi>z</mi><mo>=</mo><mn>$a</mn></math></nav><p>Only this paragraph of document $idx survives extraction.</p>"""
        case 6 =>
          s"""<p>Lead-in sentence number $idx before the display block.</p>
             |<p>$$$$\\int_0^$a x^$b\\,dx$$$$</p>""".stripMargin
        case _ =>
          s"""<p>\\[ e^{i\\pi} + $a = ${a + 1} \\]</p><p>Trailing prose for document $idx to keep.</p>"""
      }
      val html = s"<html><head><title>math $idx</title></head><body>$body</body></html>"
      val url = String.format(java.util.Locale.ROOT,
        "https://math.example.org/m%04d", Integer.valueOf(idx))
      PageRow(url, new java.sql.Timestamp(1577836800000L + idx.toLong * 3600000L),
        html.getBytes(java.nio.charset.StandardCharsets.UTF_8), null, null)
    })
  }

  /** Deterministic link-graph corpus: page `i` lives on host `w{i%5}` and
    * carries an authored anchor set — one relative link (self-host edge),
    * one absolute cross-host link to `w{(i+1)%5}`, one protocol-relative
    * link to `partner{i%3}.example.net` whose query string carries `&amp;`
    * (entity decode exercised), plus every 7th page a hub link — and a
    * <script> body containing a FAKE anchor that a naive regex would match
    * but the tokenizer must skip. Pure function of the index: the expected
    * host-graph edge counts are derivable in closed form (LinkGraphSpec). */
  def linkPages(spark: SparkSession, n: Long): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val idx = fixtureIdx(i)
      val url = s"https://w${idx % 5}.example.org/doc$idx"
      val hub = if (idx % 7 == 0)
        """<p><a href="https://hub.example.org/">hub</a></p>""" else ""
      val body =
        s"""<h1>Page $idx</h1><p>Body text for page $idx with enough words.</p>""" +
        s"""<p><a href="/about">about</a></p>""" +
        s"""<p><a href="https://w${(idx + 1) % 5}.example.org/doc${idx + 7}">next</a></p>""" +
        s"""<p><a href="//partner${idx % 3}.example.net/p?a=1&amp;b=2">partner</a></p>""" +
        hub +
        """<script>var s = '<a href="https://evil.example/x">phantom</a>';</script>"""
      val html = s"<html><head><title>t</title></head><body>$body</body></html>"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      PageRow(url, new java.sql.Timestamp(1577836800000L + idx.toLong * 60000L),
        html, null, "en")
    })
  }

  /** Deterministic site-template corpus: page `i` lives on host
    * `t{i%5}.example.org` and carries (a) a sitewide NAV paragraph and a
    * sitewide FOOTER paragraph whose text is identical on every page of the
    * host — written as plain content-like `<p>`s with zero links and normal
    * text density, so the SINGLE-PAGE rule cascade provably keeps them and
    * only the cross-page frequency pass can identify them; (b) a unique
    * article (`<h1>` + body) per page; (c) on every 4th page a PROMO
    * paragraph shared within the host but under the 1/2 frequency
    * threshold, which must survive removal. Pure function of the index —
    * TemplateSpec derives the expected clean text in closed form. */
  def templatePages(spark: SparkSession, n: Long): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val idx = fixtureIdx(i)
      val host = s"t${idx % 5}.example.org"
      val url = s"https://$host/article$idx"
      val promo = if (idx % 4 == 0)
        s"<p>${templatePromo(idx % 5)}</p>" else ""
      val body =
        s"<p>${templateNav(idx % 5)}</p>" +
        s"<h1>Article $idx</h1>" +
        s"<p>${templateArticle(idx)}</p>" +
        promo +
        s"<p>${templateFooter(idx % 5)}</p>"
      val html = s"<html><head><title>t</title></head><body>$body</body></html>"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      PageRow(url, new java.sql.Timestamp(1577836800000L + idx.toLong * 60000L),
        html, null, "en")
    })
  }

  /** Deterministic head-metadata corpus: page `i` carries an authored
    * `<title>` (with an entity and collapsible whitespace), a meta
    * description (entity in the content value), robots on every 3rd page,
    * a rel=canonical link on every 2nd (uppercase `REL` value on every 4th
    * — case-insensitive match), og:title/og:description except every 5th,
    * and `<html lang>` except every 7th — plus ADVERSARIAL duplicates that
    * must lose under first-wins (a second title, a second description) and
    * a phantom `<meta name=description>` inside a script body that the
    * tokenizer must never see. Pure function of the index (HeadMetaSpec
    * derives every field in closed form). */
  def metaPages(spark: SparkSession, n: Long): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val idx = fixtureIdx(i)
      val host = s"m${idx % 5}.example.org"
      val url = s"https://$host/page$idx"
      val canonical = if (idx % 2 == 0) {
        val rel = if (idx % 4 == 0) "CANONICAL" else "canonical"
        s"""<link rel="$rel" href="https://$host/canon/$idx">"""
      } else ""
      val robots = if (idx % 3 == 0)
        """<meta name="robots" content="noindex, follow">""" else ""
      val og = if (idx % 5 != 0)
        s"""<meta property="og:title" content="OG Article $idx">""" +
        s"""<meta property="og:description" content="og summary $idx">"""
      else ""
      val langAttr = if (idx % 7 != 0) s""" lang="${metaLang(idx)}"""" else ""
      val head =
        s"""<title>Site ${idx % 5} &amp;  Review $idx</title>""" +
        s"""<meta name="description" content="Summary of article $idx &amp; context">""" +
        robots + canonical + og +
        s"""<title>WRONG title</title>""" +
        s"""<meta name="description" content="WRONG description">"""
      val body =
        s"""<h1>Article $idx</h1><p>Body of article $idx with enough words.</p>""" +
        """<script>var m = '<meta name="description" content="phantom">';</script>"""
      val html = s"""<html$langAttr><head>$head</head><body>$body</body></html>"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      PageRow(url, new java.sql.Timestamp(1577836800000L + idx.toLong * 60000L),
        html, null, "en")
    })
  }

  /** Authored lang attribute of meta-corpus page `idx` (when present). */
  def metaLang(idx: Int): String = Seq("en", "de", "fr", "en-US")(idx % 4)

  /** Authored robots.txt body for frontier host `h` — exercises comments,
    * a non-`*` group that must be ignored, consecutive-User-agent group
    * formation, an empty Disallow (no rule), an unknown directive, and the
    * RFC-required `*` wildcard / `$` anchor rules. Discovery records (x30):
    * a Sitemap INSIDE the non-`*` group (group-independent per
    * sitemaps.org), a trailing duplicate Sitemap (first wins), an even-host
    * second sitemap, and two Crawl-delays in the `*` group (first wins;
    * odd hosts get a fractional-seconds value). Deterministic text. */
  def robotsTxt(h: Int): String =
    s"""# robots for host $h
       |User-agent: googlebot
       |Disallow: /
       |Sitemap: https://h$h.example.org/sitemap.xml
       |
       |User-Agent: *
       |Disallow: /private/
       |Allow: /private/archive/
       |Disallow: /*.json$$
       |Disallow: /tmp*
       |Disallow:
       |Crawl-delay: ${if (h % 2 == 0) "5" else "2.5"}
       |Crawl-delay: 99
       |
       |User-agent: ignored-agent
       |Disallow: /data/
       |${if (h % 2 == 0) s"Sitemap: https://h$h.example.org/sitemap-news.xml" else ""}
       |Sitemap: https://h$h.example.org/sitemap.xml
       |""".stripMargin

  /** Authored frontier URL `i` (host h{i%5}.example.org) — the six path
    * shapes cover allow-by-default, plain-prefix disallow, longest-match
    * allow-back, `$`-anchored wildcard disallow, `*`-suffix disallow, and
    * the near-miss of the anchored rule. Expected verdicts are closed-form
    * (RobotsSpec). */
  def frontierUrl(i: Int): String = {
    val path = (i % 6) match {
      case 0 => s"/home/page$i.html"
      case 1 => s"/private/doc$i"
      case 2 => s"/private/archive/doc$i"
      case 3 => s"/data/file$i.json"
      case 4 => s"/tmp/cache$i"
      case _ => s"/data/file$i.jsonl"
    }
    s"https://h${i % 5}.example.org$path"
  }

  /** Expected robots verdict for [[frontierUrl]] `i` (closed form). */
  def frontierAllowed(i: Int): Boolean = (i % 6) match {
    case 1 | 3 | 4 => false
    case _         => true
  }

  /** Deterministic `<base href>`-resolution corpus: page `i` lives at
    * `https://b{i%4}.example.org/sec/sub/page{i}.html`; every 3rd page
    * declares `<base href="https://cdn{i%2}.example.net/assets/">` (all
    * links then resolve against the CDN base, the trap a host-only
    * resolver falls into), plus a SECOND base tag that must be ignored
    * (first wins, per HTML). The eight authored hrefs cover the RFC 3986
    * reference classes: same-segment relative, `./`, `../`, rooted,
    * query-only, protocol-relative, absolute, and fragment-only. */
  def basePages(spark: SparkSession, n: Long): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val idx = fixtureIdx(i)
      val url = s"https://b${idx % 4}.example.org/sec/sub/page$idx.html"
      val base = if (idx % 3 == 0)
        s"""<base href="https://cdn${idx % 2}.example.net/assets/">""" +
          """<base href="https://WRONG.example/ignored/">"""
      else ""
      val body =
        s"""<p><a href="g$idx.html">rel</a>""" +
        s"""<a href="./same$idx.html">dot</a>""" +
        s"""<a href="../up$idx.html">up</a>""" +
        s"""<a href="/rooted$idx">root</a>""" +
        s"""<a href="?q=$idx">query</a>""" +
        s"""<a href="//peer.example.org/p$idx">proto</a>""" +
        s"""<a href="https://abs.example.org/x$idx">abs</a>""" +
        s"""<a href="#frag$idx">frag</a></p>"""
      val html = s"""<html><head><title>t</title>$base</head><body>$body</body></html>"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      PageRow(url, new java.sql.Timestamp(1577836800000L + idx.toLong * 60000L),
        html, null, "en")
    })
  }

  /** The frontier hosts' robots rules, parsed once (O(hosts) control-plane
    * state — shared by the x25 gate and the x26 sitemap frontier so the two
    * surfaces can never diverge on host naming or rule content). */
  def frontierRuleMap: Map[String, Vector[graft.functions.Robots.Rule]] =
    (0 until 5).map(h =>
      s"h$h.example.org" -> graft.functions.Robots.parse(robotsTxt(h))).toMap

  /** Authored sitemap XML for document `i` (host h{i%5}.example.org): every
    * 8th document is a `<sitemapindex>` pointing at two further shards; the
    * rest are `<urlset>`s whose six locs exercise plain text, a missing
    * lastmod, a CDATA-wrapped loc, an entity-encoded query, ws padding, and
    * an uppercase scheme+host that url canonicalization must fold. */
  def sitemapXml(i: Int): String = {
    val host = s"h${i % 5}.example.org"
    if (i % 8 == 7)
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
         |  <sitemap><loc>https://$host/sitemap${i}_a.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
         |  <sitemap><loc>https://$host/sitemap${i}_b.xml</loc></sitemap>
         |</sitemapindex>""".stripMargin
    else
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
         |  <url><loc>https://$host/home/page$i.html</loc><lastmod>2024-01-15</lastmod></url>
         |  <url><loc>https://$host/private/doc$i</loc></url>
         |  <url><loc><![CDATA[https://$host/data/file$i.json]]></loc><lastmod>2024-01-16</lastmod></url>
         |  <url><loc> HTTPS://${host.toUpperCase(java.util.Locale.ROOT)}/s$i?a=1&amp;b=2 </loc></url>
         |  <url><loc>https://$host/tmp/cache$i</loc></url>
         |  <url><loc>https://$host/data/file$i.jsonl</loc></url>
         |</urlset>""".stripMargin
  }

  /** Sitemap documents as corpus rows (payload = the XML bytes). */
  def sitemapPages(spark: SparkSession, n: Long): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val idx = fixtureIdx(i)
      PageRow(s"https://h${idx % 5}.example.org/sitemap$idx.xml",
        new java.sql.Timestamp(1577836800000L + idx.toLong * 60000L),
        sitemapXml(idx).getBytes(java.nio.charset.StandardCharsets.UTF_8),
        null, null)
    })
  }

  /** Authored template-corpus text pieces (shared with TemplateSpec). */
  def templateNav(h: Int): String =
    s"Latest headlines and section navigation for tribune $h readers every morning"
  def templateFooter(h: Int): String =
    s"All material on tribune $h is provided for general information purposes only"
  def templatePromo(h: Int): String =
    s"Subscribe to the tribune $h weekend edition and save twenty percent today"
  def templateArticle(idx: Int): String =
    s"Unique report number $idx covering the district assembly vote with " +
      s"detailed quotes from delegate ${idx % 23} and margin ${idx % 17}"

  /** Authored (width, height) for media fixture `idx` — spans both sides of
    * the resize planner's 960px long-side limit. */
  def mediaDims(idx: Int): (Int, Int) =
    (320 + (idx % 7) * 160, 200 + (idx % 5) * 230)

  /** Authored pixel dims of the DCT figure embedded in pdf-image fixture
    * `idx` (pure function of the index, so specs assert them exactly). */
  def pdfImageDims(idx: Int): (Int, Int) = (64 + (idx % 32), 48 + (idx % 24))

  /** Authored caption line for figure `k` of pdf-image fixture `idx`. */
  def pdfImageCaption(idx: Int, k: Int): String =
    s"Figure ${2 * idx + k}: authored deterministic caption ${idx * 31 + k}"

  /** Deterministic image-bearing REAL PDFs (corpus/RealPdfGen.buildWithImages):
    * each page carries a body paragraph plus two embedded image XObjects —
    * a /DCTDecode JPEG (MediaFixtures.jpeg, authored dims) and a /FlateDecode
    * raw-gray bitmap — each drawn via `q … cm /ImN Do Q` with an authored
    * caption line placed directly below its rect. The figure-mining fixture
    * set: payload bytes, dims, placements and captions are all pure functions
    * of the index, never derived from the extractor. */
  def pdfImagePages(spark: SparkSession, n: Long): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val idx = fixtureIdx(i)
      val (w0, h0) = pdfImageDims(idx)
      val jpeg = graft.corpus.MediaFixtures.jpeg(w0, h0, 256 + idx)
      val gray = Array.tabulate(16 * 12)(j => ((j * 31 + idx) & 0xff).toByte)
      val body = graft.corpus.RealPdfGen.Placed(50, 40, 12,
        graft.corpus.RealPdfGen.wrap(
          s"Document $idx discusses the embedded figures below in detail. " +
            "The body text flows above both figures on the page.", 70))
      val cap0 = graft.corpus.RealPdfGen.Placed(50, 360, 10, Seq(pdfImageCaption(idx, 0)))
      val cap1 = graft.corpus.RealPdfGen.Placed(50, 570, 10, Seq(pdfImageCaption(idx, 1)))
      val page = graft.corpus.RealPdfGen.PageSpec(612, 792,
        Seq(body, cap0, cap1), compress = true)
      val imgs = Seq(
        graft.corpus.RealPdfGen.PlacedImage(50, 200, 200, 150, w0, h0, jpeg, dct = true),
        graft.corpus.RealPdfGen.PlacedImage(50, 470, 120, 90, 16, 12, gray, dct = false))
      val payload = graft.corpus.RealPdfGen.buildWithImages(Seq((page, imgs)))
      val url = String.format(java.util.Locale.ROOT,
        "https://pdf-img.example.org/d%04d.pdf", Integer.valueOf(idx))
      PageRow(url, new java.sql.Timestamp(1577836800000L + idx.toLong * 3600000L),
        payload, null, null)
    })
  }
}

/** The extraction stage: one narrow mapPartitions over pages — no shuffle
  * (SURVEY.md §3.1 recast: read → extract → write is a single Spark stage).
  * Arena state is constructed once per partition and reused across documents
  * (≡ the reference building its predictors once per process,
  * tools/infer/predict_system.py:47-75).
  */
object Extract {
  def run(pages: Dataset[PageRow], cfg: ExtractConfig = ExtractConfig()): Dataset[ExtractedDoc] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions { it =>
      val state = new ExtractorState()
      it.map(p => Extractor.extract(p.url, p.html, cfg, state))
    }
  }
}
