package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity of the native [[graft.plans.SimHash16]] / [[graft.plans.WinnowFingerprint]]
  * expressions against the declarative Spark-SQL formulations they replaced
  * (which in turn are the DuckDB oracle's shape). Inputs cover multi-byte UTF-8,
  * short texts, empty/no-token rows, and ScalaCheck-ish varied lengths.
  */
class TextHashSpec extends AnyFunSuite with SparkSuite {

  private val toks = "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"

  /** The original interpreted simhash expression (16× md5 recompute). */
  private val declarativeSimhash =
    s"""aggregate(sequence(1, 16), 0L, (acc, j) -> acc + IF(
       |  aggregate(transform($toks, t -> md5(t)), 0, (s, m) ->
       |    s + IF(instr('0123456789abcdef', substring(m, j, 1)) >= 9, 1, -1)) > 0,
       |  shiftleft(1L, j - 1), 0L))""".stripMargin

  /** The original interpreted winnowing pipeline (k=7, w=5). */
  private def declarativeFingerprints(k: Int = 7, w: Int = 5): String = {
    val hashes =
      s"""CASE WHEN length(text) < $k THEN array(substring(md5(text), 1, 8))
         |ELSE transform(sequence(1, length(text) - ${k - 1}),
         |       i -> substring(md5(substring(text, i, $k)), 1, 8)) END""".stripMargin
    s"""array_distinct(CASE WHEN size(_h) <= $w THEN array(array_min(_h))
       |ELSE transform(sequence(1, size(_h) - ${w - 1}),
       |       i -> array_min(slice(_h, i, $w))) END)""".stripMargin
      .replace("_h", s"($hashes)")
  }

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a",
    "",
    "   ",
    "short",
    "exactly", // length == k
    "Spärk über alles — 日本語 テスト text with multi-byte",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // degenerate repeats
    "123 456 789 abc ABC!@# def-ghi_jkl",
    ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod " * 8).trim,
    "éèêë", // all multi-byte, shorter than k codepoints
    "🌍🚀 emoji 🎉 four-byte codepoints 🌟 in the stream",
    "tab\tsep\nnewline\rmix  double  space")

  private def df = {
    import spark.implicits._
    samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("sorted intersect size stops at the null tail (array_sort puts nulls LAST)") {
    import spark.implicits._
    import graft.plans.TextHashFunctions.sortedIntersectSize
    // inputs are array_sort-shaped: ascending, distinct, nulls at the END —
    // a null reached mid-walk must terminate the merge, not NPE
    val rows = Seq(
      (Seq[String]("a", "b", null), Seq[String]("b", "c", null)),
      (Seq[String]("a", null, null), Seq[String]("a", "b", null)),
      (Seq[String](null), Seq[String]("a")),
      (Seq[String]("x", "y"), Seq[String]("x", "y"))).toDF("a", "b")
    val got = rows.select(sortedIntersectSize(col("a"), col("b")).as("n"))
      .as[Long].collect().toSeq
    assert(got === Seq(1L, 1L, 0L, 2L))
  }

  test("native minhash signatures match the explode+groupBy formulation") {
    import graft.operators.Dedup
    val shinglesOf = {
      // the declarative shingle builder (withShingles semantics, n=3)
      val parts = (0 until 3).map(j => s"element_at(_t, CAST(i + $j AS INT))").mkString(", ")
      s"""CASE WHEN size(_t) < 3 THEN array(array_join(_t, ' '))
         |ELSE transform(sequence(1, size(_t) - 2), i -> concat_ws(' ', $parts)) END""".stripMargin
    }
    val declarative = df
      .select(col("id"), expr(s"($toks)").as("_t"))
      .select(col("id"), expr(shinglesOf).as("sh"))
      .select(col("id"), explode(col("sh")).as("_s"))
      .select(col("id"), md5(col("_s")).as("_m"))
      .groupBy("id")
      .agg(
        min(substring(col("_m"), 1, 8)).as("sig0"),
        min(substring(col("_m"), 9, 8)).as("sig1"),
        min(substring(col("_m"), 17, 8)).as("sig2"),
        min(substring(col("_m"), 25, 8)).as("sig3"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val native = Dedup.minhashSignatures(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(native.keySet === declarative.keySet)
    native.keySet.foreach { id =>
      assert(native(id) === declarative(id), s"minhash mismatch for id=$id")
    }
  }

  test("native simhash16 matches the declarative formulation") {
    val got = df.select(col("id"),
      graft.operators.Dedup.simhash16("text").as("native"),
      expr(declarativeSimhash).as("declarative"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"simhash mismatch for id=${r.getLong(0)}")
    }
  }

  test("native winnowing fingerprints match the declarative formulation as sets") {
    val got = graft.operators.TextAnalysis.fingerprintDf(df, "text")
      .withColumn("declarative", expr(declarativeFingerprints()))
      .select(col("id"),
        array_sort(col("fingerprints")).as("a"), array_sort(col("declarative")).as("b"),
        size(col("fingerprints")).as("na"), size(col("declarative")).as("nb"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"fingerprint mismatch for id=${r.getLong(0)}")
    }
  }

  test("EngineTokenize matches the declarative lower+regex-split form bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(91)
    val alphabet = "abcXYZ019 ,.-_()/\"'\t\néÉİΣßK中文😀"
    val gen = (1 to 400).map(i =>
      (i.toLong, List.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString))
    val edge = Seq(
      (1001L, ""), (1002L, "   "), (1003L, "---"), (1004L, "Hash-JOIN beats SORT"),
      (1005L, "İstanbul KELVINK sign"), (1006L, "a"), (1007L, "9to5"),
      (1008L, "é mixed ascii-and-ünïcode tail"), (1009L, "İ"))
    val df2 = (gen ++ edge).toDF("id", "text")
      .withColumn("fast", graft.operators.Search.tokensCol(col("text")))
      .withColumn("slow", filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= ""))
      .collect()
    df2.foreach { r =>
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"tokenize mismatch for id=${r.getLong(0)} text='${r.getString(1)}'")
    }
  }

  test("winnowing first-occurrence order matches array_distinct of window mins") {
    val got = graft.operators.TextAnalysis.fingerprintDf(df, "text")
      .withColumn("declarative", expr(declarativeFingerprints()))
      .select("id", "fingerprints", "declarative")
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"fingerprint order mismatch for id=${r.getLong(0)}")
    }
  }
}
