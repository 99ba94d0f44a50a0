package graft.core

import org.apache.spark.sql.types._

/** Core data model of the engine.
  *
  * Mirrors the reference's document/chunk shapes (see
  * /root/reference/main/sources/files/files_document_converter.py:16-27 and
  * /root/reference/main/core/documents_collection_creator.py:162-190) re-expressed as
  * Spark schemas: a `documents` table and a columnar `chunks` index table replace the
  * reference's per-document JSON files + index_mapping/reverse_index_mapping JSONs.
  */
object Model {

  /** One chunk of a document — the unit of indexing and retrieval. */
  case class Chunk(indexedData: String, metadata: Map[String, String] = Map.empty)

  /** Canonical converted document record (converter output). */
  case class DocumentRecord(
      id: String,
      url: String,
      metadata: Map[String, String],
      text: String,
      chunks: Seq[Chunk])

  /** One row of the columnar chunk index (replaces index_mapping + engine payloads). */
  case class ChunkRow(
      chunkId: Long,
      documentId: String,
      documentUrl: String,
      chunkNumber: Int,
      indexedData: String,
      metadata: Map[String, String],
      embedding: Array[Float])

  val chunkType: StructType = StructType(Seq(
    StructField("indexedData", StringType, nullable = false),
    StructField("metadata", MapType(StringType, StringType), nullable = true)))

  val documentSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("url", StringType, nullable = true),
    StructField("metadata", MapType(StringType, StringType), nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("chunks", ArrayType(chunkType), nullable = true)))

  val chunkRowSchema: StructType = StructType(Seq(
    StructField("chunkId", LongType, nullable = false),
    StructField("documentId", StringType, nullable = false),
    StructField("documentUrl", StringType, nullable = true),
    StructField("chunkNumber", IntegerType, nullable = false),
    StructField("indexedData", StringType, nullable = true),
    StructField("metadata", MapType(StringType, StringType), nullable = true),
    StructField("embedding", ArrayType(FloatType), nullable = true)))

  /** Collection manifest (reference: documents_collection_creator.py:255-279).
    * `reader` carries the source configuration (`get_reader_details` in the
    * reference, e.g. base_document_reader.py contract) so `update` can re-drive
    * the source from the collection name alone — secrets excluded.
    */
  case class Manifest(
      collectionName: String,
      updatedTime: String,
      lastModifiedDocumentTime: String,
      numberOfDocuments: Long,
      numberOfChunks: Long,
      lastIndexItemId: Long,
      indexers: Seq[String],
      chunkSize: Int,
      chunkOverlap: Int,
      reader: Map[String, String] = Map.empty,
      embedder: String = "",
      // > 0: docs and chunks live under bucket=K partition dirs, K =
      // pmod(hash(docId), bucketCount) — incremental update/delete rewrite
      // only dirty buckets. 0 = flat single-directory layout (the default).
      bucketCount: Int = 0,
      // Monotone mutation counter: every create/update/delete writes
      // version = prior + 1 under the writer lock, so the serialized history
      // is observable (N racing updates land as N distinct versions) and a
      // lost update would show as a skipped number. Absent = legacy = 0.
      version: Long = 0L)
}
