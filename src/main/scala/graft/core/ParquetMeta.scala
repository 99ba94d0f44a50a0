package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import scala.collection.parallel.CollectionConverters._

/** Metadata-only parquet statistics — answers "how many rows" from file
  * FOOTERS, without launching a Spark job or touching a data page.
  *
  * An `Indexer.size` backed by `spark.read.parquet(path).count()` schedules a
  * full scan stage per call; harmless at test scale, wasteful at 100 TB when
  * a search session asks for index sizes. Every parquet footer already
  * carries the exact row count per row group, so the truth is a pure
  * metadata read: list the files, read each footer, sum. Footer reads are a
  * few KiB each and parallelize across files from the driver (no executors
  * needed — this is the same listing the scan planner itself performs).
  *
  * Reference contract: `get_size` on BaseIndexer
  * (/root/reference/main/indexes/indexers/base_indexer.py:24-25).
  */
object ParquetMeta {

  /** Exact total row count of every `*.parquet` file under `dir`
    * (recursive — partitioned layouts like `listId=N/` subdirs included).
    * Returns 0 for an empty or not-yet-written directory rather than
    * throwing: an index with no artifact has size 0.
    *
    * Files under `_`- or `.`-prefixed path segments (e.g. an in-flight
    * write's `_temporary/`) are skipped, matching what `spark.read.parquet`
    * would load — otherwise a crashed write would over-count forever.
    */
  def rowCount(conf: Configuration, dir: String): Long = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return 0L
    val qualifiedRoot = fs.getFileStatus(root).getPath
    def hidden(p: Path): Boolean = {
      var cur = p
      while (cur != null && cur != qualifiedRoot) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    val files = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet") && !hidden(f.getPath))
        files += f
    }
    // footer reads are independent metadata fetches — parallelize across files
    files.toVector.par.map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
      try reader.getRecordCount finally reader.close()
    }.sum
  }

  def rowCount(spark: org.apache.spark.sql.SparkSession, dir: String): Long =
    rowCount(spark.sessionState.newHadoopConf(), dir)

  /** Maximum value of an int64 column across every `*.parquet` file under
    * `dir`, from ROW-GROUP STATISTICS alone — the same footer-only discipline
    * as [[rowCount]], for monotone counters (revision numbers, high-water
    * marks) whose max would otherwise cost a full-column scan job per read.
    *
    * Returns None when the answer can't be proven from metadata — no files,
    * a row group without recorded stats, or the column missing from a file's
    * schema — so callers fall back to the scan instead of trusting a lie.
    * (Parquet writers record min/max per column chunk by default; the None
    * path exists for foreign files, not ours.)
    */
  def columnMaxLong(conf: Configuration, dir: String, column: String): Option[Long] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return None
    val qualifiedRoot = fs.getFileStatus(root).getPath
    def hidden(p: Path): Boolean = {
      var cur = p
      while (cur != null && cur != qualifiedRoot) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    val files = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet") && !hidden(f.getPath))
        files += f
    }
    if (files.isEmpty) return None
    import scala.jdk.CollectionConverters._
    val perFile = files.toVector.par.map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.filter(_.getRowCount > 0)
        val maxes = blocks.map { b =>
          b.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .map(_.getStatistics) match {
            case Some(s: org.apache.parquet.column.statistics.LongStatistics)
              if s != null && !s.isEmpty && s.hasNonNullValue => Some(s.getMax)
            case _ => None // missing column, no stats, or not int64 → unprovable
          }
        }
        if (maxes.exists(_.isEmpty)) None
        else if (maxes.isEmpty) Some(Long.MinValue) // 0-row file contributes nothing
        else Some(maxes.flatten.max)
      } finally reader.close()
    }.toVector
    if (perFile.exists(_.isEmpty)) None
    else perFile.flatten.filter(_ != Long.MinValue) match {
      case Vector() => None // only empty files — no value exists
      case vs       => Some(vs.max)
    }
  }
}
