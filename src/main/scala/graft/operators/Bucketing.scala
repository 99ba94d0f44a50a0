package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: the Spark-native answer to "this join runs
  * every day on the same key — stop shuffling the big table for it".
  *
  * `bucketBy(n, key)` + `sortBy(key)` at WRITE time gives every reader a
  * hash-partitioned, sorted-on-disk layout; any equi-join or aggregation on
  * `key` between tables bucketed the same way then plans with ZERO exchanges
  * and ZERO sorts — the shuffle is paid once at ingest, not per query. At
  * 100 TB this is the difference between a nightly pipeline that reshuffles
  * the corpus for every chunk↔document join and one that never moves it
  * (reference pairing: the chunk↔document payload joins of
  * `main/core/documents_collection_searcher.py:51-63` become co-located).
  *
  * Bucket count guidance: corpus_bytes / (nExecutors × ~256 MB), rounded to a
  * power of two so a re-bucket to n/2 or 2n stays cheap. BucketingSpec locks
  * the no-exchange property on the executed plan.
  */
object Bucketing {

  /** Write as a bucketed+sorted managed table (bucketing metadata lives in the
    * session catalog; plain parquet files underneath).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    // repartition on the bucket key first: one writer task per bucket → one
    // file per bucket, which is what lets the scan TRUST the sortBy order and
    // drop the join-side Sort (multi-file buckets only guarantee per-file
    // order, so Spark would re-sort)
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Read a bucketed table back (catalog lookup, bucket metadata intact). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
