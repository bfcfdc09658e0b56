package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Source-surface tests for the readers with no registered query
  * (SURVEY.md §2.1 S1 text, S2 sep-CSV, S4 comment-TSV). */
class TablesSpec extends SparkSpec {

  private def write(name: String, content: String): String = {
    val d = Files.createTempDirectory("graft_src")
    val f = d.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("text scan: one row per line, single value column (S1)") {
    val p = write("t.txt", "first line\nsecond line\n")
    val df = Tables.text(spark, p)
    assert(df.columns.toSeq == Seq("value"))
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("first line", "second line"))
  }

  test("csv with separator + header (S2/S3)") {
    val p = write("t.tsv", "a\tb\n1\tx\n2\ty\n")
    val df = Tables.csvHeader(spark, p, sep = "\t")
    assert(df.columns.toSeq == Seq("a", "b"))
    assert(df.count() == 2)
  }

  test("tsv with # comment filtering (S4, ref Epinions ingestion)") {
    val p = write("e.tsv", "# comment header\n1\t2\n# mid comment\n3\t4\n")
    val df = Tables.tsvComments(spark, p)
    assert(df.count() == 2)
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("1", "3"))
  }
}
