package graft

import graft.functions.Formatting
import org.scalatest.funsuite.AnyFunSuite

/** Golden-output vectors for the TOON formatter — the tabular-array shape the
  * reference's `format_object(obj, 'toon')` emits via the public `toons`
  * library (reference: main/utils/formatting.py:5-15): a `label[N]{cols}:`
  * header, then one comma-joined line per row, CSV-style quoting only when a
  * cell needs it. Pinning exact strings here keeps the CLI/MCP `--format toon`
  * surface byte-stable.
  */
class FormattingSpec extends AnyFunSuite with SparkSuite {

  test("toon golden: nested doc-result table with quoting rules") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("guides/spark.md", 0.9, "plain snippet"),
      ("a,b.md", 0.75, "has \"quotes\" and, commas"),
      ("multi.md", 0.5, "line one\nline two"))
      .toDF("doc", "score", "snippet")
    val got = Formatting.toon(df, "documents")
    val want =
      "documents[3]{doc,score,snippet}:\n" +
        "  guides/spark.md,0.9,plain snippet\n" +
        "  \"a,b.md\",0.75,\"has \"\"quotes\"\" and, commas\"\n" +
        "  multi.md,0.5,\"line one\nline two\""
    assert(got === want)
  }

  test("toon golden: empty result is a bare zero-count header") {
    val s = spark
    import s.implicits._
    val df = Seq(("x", 1L)).toDF("doc", "n").where("n < 0")
    assert(Formatting.toon(df, "documents") === "documents[0]{doc,n}:")
  }

  test("toon golden: unicode passes through unescaped; nulls are empty cells") {
    val s = spark
    import s.implicits._
    val df = Seq(("ünïcode ✓ 日本語", Option.empty[String]))
      .toDF("title", "note")
    assert(Formatting.toon(df, "rows") ===
      "rows[1]{title,note}:\n  ünïcode ✓ 日本語,")
  }
}
