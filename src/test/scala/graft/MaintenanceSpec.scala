package graft

import graft.operators.Maintenance
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class MaintenanceSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("compact rewrites a fragmented table into few files, data intact") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    // 32 tiny files
    (1 to 3200).map(i => (i.toLong, s"row $i")).toDF("id", "v")
      .repartition(32).write.parquet(dir)
    val (nBefore, bytes, avg) = Maintenance.fileStats(spark, dir)
    assert(nBefore === 32 && avg < 64 * 1024)

    val nAfter = Maintenance.compact(spark, dir,
      targetBytes = bytes, minAvgBytes = 64 * 1024)
    assert(nAfter === 1L)
    // identical content after the swap
    val back = spark.read.parquet(dir)
    assert(back.count() === 3200)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
      === (1L to 3200L).sum)
    // no leftover staging/backup dirs
    assert(!new java.io.File(dir + "__compact").exists)
    assert(!new java.io.File(dir + "__old").exists)
  }

  test("compact refuses partitioned tables instead of flattening their layout") {
    val dir = Files.createTempDirectory("graft-compact3").toString + "/t"
    (1 to 100).map(i => (i.toLong, i % 4, s"row $i")).toDF("id", "part", "v")
      .write.partitionBy("part").parquet(dir)
    val e = intercept[IllegalArgumentException](
      Maintenance.compact(spark, dir, targetBytes = 1 << 20, minAvgBytes = 1 << 20))
    assert(e.getMessage.contains("partition directories"))
    // per-partition compaction still works and keeps the layout
    val n = Maintenance.compact(spark, s"$dir/part=0",
      targetBytes = 1 << 20, minAvgBytes = 1 << 20)
    assert(n === 1L)
    assert(spark.read.parquet(dir).count() === 100)
  }

  test("compact skips healthy tables (no gratuitous rewrite)") {
    val dir = Files.createTempDirectory("graft-compact2").toString + "/t"
    (1 to 100).map(i => (i.toLong, s"row $i")).toDF("id", "v")
      .coalesce(2).write.parquet(dir)
    val (n0, _, _) = Maintenance.fileStats(spark, dir)
    val n = Maintenance.compact(spark, dir, targetBytes = 1 << 20, minAvgBytes = 1)
    assert(n === n0) // avg >= 1 byte → healthy → untouched
  }
}
