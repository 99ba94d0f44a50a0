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
}
