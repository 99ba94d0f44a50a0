package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample stages
  * shaped for a real decoder.
  *
  * The reference is text-only (its files reader blacklists binary extensions —
  * /root/reference/main/sources/files/files_document_reader.py:10-108); this is the
  * training-data-pipeline extension. No image/audio libraries exist in this
  * container, so the DECODE STEP IS A DETERMINISTIC STUB (clearly marked below):
  * it derives fake dimensions/durations from the content hash. Everything around
  * it — the media schema, the per-partition batched map (the Scala analogue of a
  * Pandas-UDF `mapInPandas` batch), the feature vector shape, partitioning-safe
  * signatures — is real and tested, so swapping in a JNI/ONNX decoder changes one
  * function.
  *
  * Scale: media rows are large (MBs); `mapPartitions` keeps decode zero-copy per
  * partition, and `spark.sql.files.maxPartitionBytes` bounds partition memory.
  * Feature extraction emits fixed-dim float arrays that flow into the same ANN
  * operators as text embeddings ([[Ann]], [[Search.vectorTopK]]).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("mediaId", StringType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  val decodedSchema: StructType = mediaSchema
    .add("width", IntegerType).add("height", IntegerType)
    .add("channels", IntegerType).add("durationMs", LongType)

  /** ??? STUB DECODER ??? — stands in for libjpeg/ffmpeg, which aren't in this
    * container. Deterministic: dimensions derive from the first bytes of
    * md5(content), so tests and oracle runs are stable. Replace `decodeOne` with a
    * real decoder to productionize; the batching shape stays.
    */
  private def decodeOne(kind: String, bytes: Array[Byte]): (Int, Int, Int, Long) = {
    if (bytes == null || bytes.isEmpty) return (0, 0, 0, 0L)
    val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    def u(i: Int) = h(i) & 0xff
    kind match {
      case "image" => (64 + u(0) * 8, 64 + u(1) * 8, 3, 0L)
      case "audio" => (0, 0, if (u(2) % 2 == 0) 1 else 2, 1000L + u(3) * 500L)
      case "video" => (320 + u(0) * 4, 240 + u(1) * 4, 3, 5000L + u(3) * 1000L)
      case _       => (0, 0, 0, 0L)
    }
  }

  /** Decode a media DataFrame (mediaSchema) → decodedSchema. Per-partition batch
    * map — the executor-side batching a real decoder needs (model/codec loaded
    * once per partition, rows streamed through it).
    */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(mediaSchema.fieldNames.map(col): _*).rdd.mapPartitions { it =>
      // A real decoder initializes its codec/session HERE, once per partition.
      it.map { r =>
        val (w, hgt, c, d) = decodeOne(r.getAs[String]("kind"), r.getAs[Array[Byte]]("bytes"))
        // Seq[Any] keeps the Ints as Ints (a plain Seq would numerically widen
        // them to Long next to the Long duration, breaking the Int schema fields).
        Row.fromSeq(r.toSeq ++ Seq[Any](w, hgt, c, d))
      }
    }
    spark.createDataFrame(out, decodedSchema)
  }

  /** Feature extraction: binary content → fixed-dim float vector (deterministic
    * byte-hash features standing in for a vision/audio encoder; L2-normalized so
    * it composes with cosine ANN search).
    */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val featUdf = udf { (bytes: Array[Byte]) =>
      val v = new Array[Float](dim)
      if (bytes != null && bytes.nonEmpty) {
        var i = 0
        while (i < bytes.length) {
          val idx = math.floorMod(scala.util.hashing.MurmurHash3
            .productHash((i / 16, bytes(i))), dim)
          v(idx) += (bytes(i) & 0xff) / 255.0f
          i += 1
        }
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        if (n > 0) { var j = 0; while (j < dim) { v(j) = (v(j) / n).toFloat; j += 1 } }
      }
      v
    }
    media.withColumn("features", featUdf(col("bytes")))
  }

  /** Frame sampling for "video" rows: the byte stream splits into fixed-size
    * pseudo-frames, keep every n-th (a real impl samples keyframes via the codec;
    * the exploded output shape — one row per sampled frame — is what matters).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 1024, everyNth: Int = 2): DataFrame = {
    val framesUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null) Seq.empty[Array[Byte]]
      else bytes.grouped(frameBytes).zipWithIndex
        .collect { case (f, i) if i % everyNth == 0 => f }.toSeq
    }
    media.filter(col("kind") === "video")
      .select(col("mediaId"), posexplode(framesUdf(col("bytes"))).as(Seq("frameNo", "frame")))
  }

  /** "Resize": byte-range crop standing in for pixel resize — keeps the
    * binary-in/binary-out contract of the real operation.
    */
  def resizeStub(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("bytes",
      when(length(col("bytes")) > maxBytes,
        expr(s"substring(bytes, 1, $maxBytes)").cast(BinaryType))
      .otherwise(col("bytes")))
}
