package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-corpus export: the handoff from this engine to a tokenizer /
  * trainer. Parquet is the engine's durable format (SURVEY §2.9), but
  * training loaders consume line-delimited JSON shards — so the sink writes
  * `shard=K/part-*.txt.gz` gzip JSONL directories with DETERMINISTIC shard
  * membership, plus a metadata manifest.
  *
  * Scale shape: shard assignment is content-keyed (`xxhash64(id) mod n`),
  * not partition-keyed — membership is identical at any parallelism and on
  * any rerun, so an incremental re-export reproduces the same shards and a
  * downstream loader can cache per-shard state. The write is one
  * `repartition(n, shard)` exchange followed by a partitioned text write;
  * nothing funnels through the driver and no shard needs to fit in memory
  * (the text writer streams). JSON serialization is Spark's codegen'd
  * `to_json`, not a UDF.
  */
object Export {

  /** Write `df` as `nShards` gzip JSONL shard directories under `outDir`
    * and a `_manifest` parquet next to them; returns the manifest
    * (shard_id, n_docs, n_bytes — bytes of uncompressed JSON incl. the
    * newline). `cols` selects/orders the JSON fields (default: all columns);
    * `idCol` drives shard assignment and must be non-null.
    *
    * The underscore prefix hides `_manifest` from input discovery (like
    * `_SUCCESS`), so `spark.read.json(outDir)` reads the shards back cleanly
    * with `shard_id` as a partition column. The manifest is a second
    * aggregate pass over the source — map-side partial counts, only
    * `nShards` rows cross the wire; at export scale the extra source scan is
    * the price of exact per-shard stats without buffering the write.
    */
  def jsonlShards(df: DataFrame, idCol: String, outDir: String, nShards: Int,
                  cols: Seq[String] = Nil): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val fields = if (cols.nonEmpty) cols else df.columns.toSeq
    val lines = df
      .withColumn("shard_id", pmod(xxhash64(col(idCol).cast("string")), lit(nShards.toLong)))
      .withColumn("line", to_json(struct(fields.map(col): _*)))
      .select("line", "shard_id")
    lines
      .repartition(nShards, col("shard_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard_id")
      .option("compression", "gzip")
      .text(outDir)
    val manifest = lines
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        // octet_length, not length: multi-byte UTF-8 must count as bytes
        sum(octet_length(col("line")).cast("long") + 1L).as("n_bytes"))
      .orderBy("shard_id")
    manifest.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/_manifest")
    manifest
  }
}
