package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite with SparkSuite {

  test("co-bucketed tables join with zero exchanges and zero sorts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")
    val meta = docs.select(col("doc_id"), length(col("text")).as("n_chars"))
    Bucketing.writeBucketed(docs, "b_docs", "doc_id", 4)
    Bucketing.writeBucketed(meta, "b_meta", "doc_id", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the plan must exploit the bucket layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // sorted-scan ordering is opt-in since Spark 3 (planning lists files to
      // prove one-file-per-bucket); writeBucketed guarantees that layout
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val joined = Bucketing.readBucketed(spark, "b_docs")
        .join(Bucketing.readBucketed(spark, "b_meta"), "doc_id")
      assert(joined.count() === docs.count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, plan:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle, plan:\n$plan")
      assert(!plan.contains("Sort ["),
        s"sortBy at write time must spare the join sort, plan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_meta")
    }
  }

  test("aggregation on the bucket key needs no exchange either") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    Bucketing.writeBucketed(docs, "b_agg", "doc_id", 4)
    try {
      val agg = Bucketing.readBucketed(spark, "b_agg")
        .groupBy("doc_id").agg(sum(length(col("text"))).as("n"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed groupBy must not shuffle, plan:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS b_agg")
  }
}
