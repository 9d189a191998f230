package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.PubTab

/** PubTabNet-style label-file source (PubTabDataSet analog): the jsonl scan,
  * the annotation→HTML rebuild, and the byte-exact row-major text contract
  * through the engine's own table-assembly path. */
class PubTabSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("label jsonl → table text is byte-identical to the authored expectation") {
    val n = 24
    val samples = PubTab.samples(n)
    assert(samples.exists(_.line.contains("colspan")), "span variant must occur")
    val path = java.nio.file.Files.createTempFile("graft-pubtab", ".jsonl")
    java.nio.file.Files.write(path, PubTab.sampleJsonl(n).getBytes("UTF-8"))
    val got = PubTab.tableText(spark, path.toString)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == n)
    samples.foreach { s =>
      assert(got(s.filename) == s.expectedText,
        s"${s.filename}:\n--- got:\n${got(s.filename)}\n--- want:\n${s.expectedText}")
    }
    java.nio.file.Files.deleteIfExists(path)
  }

  test("toHtml splices cells at </td> including the attribute token form") {
    val html = PubTab.toHtml(
      Seq("<tr>", "<td", " colspan=\"2\"", ">", "</td>", "<td>", "</td>", "</tr>"),
      Seq("wide cell", "thin cell"))
    assert(html ==
      "<table><tr><td colspan=\"2\">wide cell</td><td>thin cell</td></tr></table>")
  }

  test("read projects (filename, structure, cells) from the native json scan") {
    val path = java.nio.file.Files.createTempFile("graft-pubtab-read", ".jsonl")
    java.nio.file.Files.write(path, PubTab.sampleJsonl(6).getBytes("UTF-8"))
    val rows = PubTab.read(spark, path.toString).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getString(0).startsWith("table_")))
    assert(rows.forall(!_.isNullAt(1)))
    java.nio.file.Files.deleteIfExists(path)
  }
}
