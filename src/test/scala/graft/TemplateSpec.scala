package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.pipeline.{CorpusSource, Extract}

/** Site-level template/boilerplate removal (templateFilter / templateLines /
  * the x23 engine surface): cross-page block-frequency removal with an
  * integer-exact rational threshold, minPages small-site guard, and
  * closed-form expectations over the deterministic template corpus.
  */
class TemplateSpec extends AnyFunSuite {

  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def units(rows: (String, String, Int, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("id", "grp", "idx", "unit")
  }

  private def result(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, String)] =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("templateFilter: threshold is integer-exact at the boundary") {
    // 4 pages; unit "nav" on ALL 4 (4/4 >= 1/2 → removed); unit "half" on
    // exactly 2 of 4 (2*2 >= 4*1 — EQUALITY at num/den=1/2 → removed);
    // unit "quarter" on 1 of 4 (1*2 < 4 → kept).
    val u = units(
      ("p1", "h", 0, "nav"), ("p1", "h", 1, "a1"), ("p1", "h", 2, "half"),
      ("p2", "h", 0, "nav"), ("p2", "h", 1, "a2"), ("p2", "h", 2, "half"),
      ("p3", "h", 0, "nav"), ("p3", "h", 1, "a3"), ("p3", "h", 2, "quarter"),
      ("p4", "h", 0, "nav"), ("p4", "h", 1, "a4"))
    val r = result(TextFunctions.templateFilter(u, 1, 2, 2))
    assert(r("p1") == ((3L, 2L, "a1")))
    assert(r("p2") == ((3L, 2L, "a2")))
    assert(r("p3") == ((3L, 1L, "a3\nquarter")), "below threshold stays")
    assert(r("p4") == ((2L, 1L, "a4")))
  }

  test("templateFilter: minPages guards small sites; groups are independent") {
    // Site "small" has 2 pages sharing a unit — with minPages=3 nothing is
    // removed there; site "big" with 3 pages still gets its chrome dropped.
    // The same unit TEXT on different sites is judged per site.
    val u = units(
      ("s1", "small", 0, "chrome"), ("s1", "small", 1, "u1"),
      ("s2", "small", 0, "chrome"), ("s2", "small", 1, "u2"),
      ("b1", "big", 0, "chrome"), ("b1", "big", 1, "v1"),
      ("b2", "big", 0, "chrome"), ("b2", "big", 1, "v2"),
      ("b3", "big", 0, "chrome"), ("b3", "big", 1, "v3"))
    val r = result(TextFunctions.templateFilter(u, 1, 2, 3))
    assert(r("s1") == ((2L, 0L, "chrome\nu1")), "small site untouched")
    assert(r("s2") == ((2L, 0L, "chrome\nu2")))
    assert(r("b1") == ((2L, 1L, "v1")), "big site chrome removed")
    assert(r("b2") == ((2L, 1L, "v2")))
    assert(r("b3") == ((2L, 1L, "v3")))
  }

  test("templateFilter: all-removed page yields empty clean_text; order by idx") {
    val u = units(
      ("p1", "h", 0, "nav"), ("p1", "h", 1, "foot"),
      ("p2", "h", 0, "nav"), ("p2", "h", 1, "foot"),
      ("p3", "h", 5, "zz"), ("p3", "h", 2, "nav"), ("p3", "h", 3, "aa"))
    val r = result(TextFunctions.templateFilter(u, 1, 2, 2))
    assert(r("p1") == ((2L, 2L, "")))
    assert(r("p3") == ((3L, 1L, "aa\nzz")), "kept units rejoin in idx order")
  }

  test("x23 engine surface: closed-form clean text over the template corpus") {
    val n = 60
    val blocks = Extract.run(CorpusSource.templatePages(spark, n)).toDF()
      .select(col("url"), explode(col("spans")).as("sp"))
      .select(col("url").as("id"),
        graft.expressions.GraftExpressions.urlHost(col("url")).as("grp"),
        col("sp.blockIdx").as("idx"), col("sp.text").as("unit"))
    // Premise: the SINGLE-PAGE cascade keeps the content-like nav/footer —
    // every page must surface all its blocks (4, or 5 with the promo).
    val perPage = blocks.groupBy("id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cleaned = TextFunctions.templateFilter(blocks, 1, 2, 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    (0 until n).foreach { i =>
      val url = s"https://t${i % 5}.example.org/article$i"
      val promo = i % 4 == 0
      assert(perPage(url) == (if (promo) 5L else 4L),
        s"single-page cascade must keep the chrome blocks of $url")
      val expected = s"Article $i\n${CorpusSource.templateArticle(i)}" +
        (if (promo) s"\n${CorpusSource.templatePromo(i % 5)}" else "")
      val (nb, nboil, clean) = cleaned(url)
      assert(nb == perPage(url))
      assert(nboil == 2L, s"exactly nav+footer removed for $url")
      assert(clean == expected, s"clean text of $url")
    }
  }

  test("templateLines: '\\n' splitting and per-source grouping") {
    val s = spark; import s.implicits._
    // NB a 2-page site puts every unique line exactly ON the 1/2 boundary
    // (1·2 >= 2·1) — sA needs 3 docs for unique lines to stay below it.
    val docs = Seq(
      (0L, "alpha body zero\nshared nav line", "sA"),
      (1L, "alpha body one\nshared nav line", "sA"),
      (3L, "alpha body three\nshared nav line", "sA"),
      (2L, "beta body two\nshared nav line", "sB"))
      .toDF("doc_id", "text", "source")
    val r = TextFunctions.templateLines(docs, 1, 2, 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(0L) == ((2L, 1L, "alpha body zero")))
    assert(r(1L) == ((2L, 1L, "alpha body one")))
    assert(r(3L) == ((2L, 1L, "alpha body three")))
    // sB has one page < minPages → untouched even though its line text is
    // sitewide chrome on sA
    assert(r(2L) == ((2L, 0L, "beta body two\nshared nav line")))
  }
}
