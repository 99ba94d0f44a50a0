package graft

import graft.api.Cli
import graft.operators.Export
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Sharded gzip-JSONL training export: deterministic membership, clean
  * read-back, exact manifest, CLI surface.
  */
class ExportSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map(i => (i.toLong, s"document body $i", if (i % 3 == 0) "de" else "en"))
      .toDF("doc_id", "text", "lang")

  test("jsonlShards: gzip shard dirs round-trip through spark.read.json") {
    val out = Files.createTempDirectory("graft-export").toString
    val manifest = Export.jsonlShards(corpus(200), "doc_id", out, nShards = 4).collect()

    // every shard dir holds gzip part files
    val shardDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard_id="))
    assert(shardDirs.length === 4)
    assert(shardDirs.forall(_.listFiles().exists(_.getName.endsWith(".txt.gz"))))

    // _manifest is input-discovery-hidden: read-back sees only the shards
    val back = spark.read.json(out)
    assert(back.count() === 200)
    assert(back.columns.toSet === Set("doc_id", "text", "lang", "shard_id"))
    assert(back.filter(col("doc_id") === 17).head().getAs[String]("text")
      === "document body 17")

    // manifest is exact: per-shard docs match the read-back grouping
    val fromData = back.groupBy("shard_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("shard_id") -> r.getAs[Long]("n")).toMap
    assert(manifest.map(r => r.getAs[Long]("shard_id") -> r.getAs[Long]("n_docs")).toMap
      === fromData)
    assert(manifest.map(_.getAs[Long]("n_docs")).sum === 200L)
    assert(manifest.forall(_.getAs[Long]("n_bytes") > 0L))
  }

  test("jsonlShards: membership is content-keyed — identical across reruns") {
    val a = Files.createTempDirectory("graft-export-a").toString
    val b = Files.createTempDirectory("graft-export-b").toString
    // different parallelism, same corpus → same shard per doc
    Export.jsonlShards(corpus(150).repartition(7), "doc_id", a, nShards = 5)
    Export.jsonlShards(corpus(150).repartition(2), "doc_id", b, nShards = 5)
    val ra = spark.read.json(a).select("doc_id", "shard_id")
    val rb = spark.read.json(b).select(col("doc_id"), col("shard_id").as("shard_b"))
    val moved = ra.join(rb, "doc_id").filter(col("shard_id") =!= col("shard_b")).count()
    assert(moved === 0L)
  }

  test("jsonlShards: cols selects and orders the JSON fields") {
    val out = Files.createTempDirectory("graft-export-cols").toString
    Export.jsonlShards(corpus(10), "doc_id", out, nShards = 2,
      cols = Seq("doc_id", "text"))
    val back = spark.read.json(out)
    assert(back.columns.toSet === Set("doc_id", "text", "shard_id")) // no lang
  }

  test("manifest n_bytes counts UTF-8 octets, not characters") {
    val out = Files.createTempDirectory("graft-export-utf8").toString
    val df = Seq((1L, "héllo wörld — ünïcode ✓")).toDF("doc_id", "text")
    val manifest = Export.jsonlShards(df, "doc_id", out, nShards = 1).collect()
    val line = spark.read.text(out).collect().head.getString(0)
    assert(line.getBytes("UTF-8").length > line.length, "fixture must be multi-byte")
    assert(manifest.head.getAs[Long]("n_bytes")
      === line.getBytes("UTF-8").length + 1L)
  }

  test("CLI export: parquet in → shards + one-line JSON summary") {
    val in = Files.createTempDirectory("graft-export-in").toString
    val out = Paths.get(Files.createTempDirectory("graft-export-cli").toString, "sh").toString
    corpus(60).write.mode("overwrite").parquet(in)

    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
      Cli.run(Array("export", "--in", in, "--out", out, "--shards", "3"), spark)
    }
    val summary = bos.toString("UTF-8").trim
    assert(summary.contains("\"shards\":3") && summary.contains("\"docs\":60"))
    assert(spark.read.json(out).count() === 60)
    assert(spark.read.parquet(s"$out/_manifest").count() === 3)
  }
}
