package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazy). */
trait SparkSuite { self: AnyFunSuite =>
  lazy val spark: SparkSession = SparkSuite.session
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // same local-mode setting as SparkEntry.configure: no `.crc` sidecars —
    // this container's tmp filesystem pays ~10-25 ms per file op, and the
    // sidecars double every collection table's file count
    val localFs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create("file:///"), s.sparkContext.hadoopConfiguration)
    localFs.setWriteChecksum(false)
    localFs.setVerifyChecksum(false)
    s
  }
}
