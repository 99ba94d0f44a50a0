package graft.sources

import java.util.zip.GZIPInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Importer for the reference engine's legacy serialized index artifacts
  * (SURVEY §2.9 M7; reference: main/indexes/indexers/chroma_indexer.py:159-204
  * `__migrate_legacy_data`). Two wire forms, mirrored exactly:
  *
  *  1. **Pickle form** — `pickle.dumps({"ids": [str], "embeddings": [[float]],
  *     "metadatas": [dict]})` (the shape the reference's own migration test
  *     builds, tests/indexes/indexers/test_chroma_indexer.py:138-149). Parsed
  *     by the from-scratch [[Pickle]] codec and turned into a searchable
  *     DataFrame — this is the real migration path, and [[exportPickled]]
  *     provides the reverse direction (our rows → bytes the reference's
  *     `pickle.loads` accepts).
  *  2. **Archive form** — `b"CHROMA_ARCHIVE_V1\0"` + tar.gz of a ChromaDB
  *     persist directory (chroma_indexer.py:162-171). The payload is Chroma's
  *     internal state (sqlite3 + HNSW blobs), which only Chroma itself can
  *     rebuild an index from — the reference likewise hands it back to
  *     `chromadb.PersistentClient` rather than parsing it. Here the archive is
  *     safely LISTED and EXTRACTED (same path-traversal guard as
  *     `__extract_archive_safely`, chroma_indexer.py:197-204) so its contents
  *     are inspectable and movable; converting one to a live index requires
  *     re-exporting from the reference in pickle form.
  *
  * Scale note: a legacy artifact is one driver-side byte array by construction
  * (the reference pickles the whole collection in memory), so parse is
  * driver-side; the parsed rows immediately become a distributed DataFrame and
  * everything downstream (search, re-index, dedup) is ordinary Spark.
  */
object LegacyChroma {

  /** b"CHROMA_ARCHIVE_V1\\0" (chroma_indexer.py:17). */
  val ArchiveMagic: Array[Byte] =
    "CHROMA_ARCHIVE_V1".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) :+ 0.toByte

  def isArchive(bytes: Array[Byte]): Boolean =
    bytes.length >= ArchiveMagic.length &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, ArchiveMagic.length), ArchiveMagic)

  /** One imported index entry: id, embedding, stringified metadata (the
    * reference stringifies None and epoch-converts timestamps on the way in —
    * chroma_indexer.py:82-96 — so values here are scalars rendered to string:
    * integers without a decimal point, floats via toString, booleans
    * true/false).
    */
  final case class LegacyEntry(id: String, embedding: Array[Float],
                               metadata: Map[String, String])

  /** Decode the pickle form. Fails loudly on the archive form or a payload
    * that is not the expected dict shape.
    */
  def decodePickled(bytes: Array[Byte]): Seq[LegacyEntry] = {
    require(!isArchive(bytes),
      "archive-form artifact: ChromaDB internal state is not convertible — " +
        "re-export from the reference in pickle form (see listArchive/extractArchive)")
    val root = Pickle.load(bytes) match {
      case m: mutable.LinkedHashMap[_, _] => m.asInstanceOf[mutable.LinkedHashMap[Any, Any]]
      case other => throw new IllegalArgumentException(
        s"legacy payload must be a dict, got ${if (other == null) "None" else other.getClass.getSimpleName}")
    }
    def seqOf(key: String): mutable.ArrayBuffer[Any] = root.get(key) match {
      case Some(b: mutable.ArrayBuffer[_]) => b.asInstanceOf[mutable.ArrayBuffer[Any]]
      case _ => throw new IllegalArgumentException(s"legacy payload missing list field '$key'")
    }
    val ids = seqOf("ids"); val embs = seqOf("embeddings"); val metas = seqOf("metadatas")
    require(ids.length == embs.length && ids.length == metas.length,
      s"ragged legacy payload: ${ids.length} ids, ${embs.length} embeddings, ${metas.length} metadatas")
    def render(v: Any): String = v match {
      case null => "None" // the reference's None→"None" normalization
      case d: java.lang.Double => d.toString
      case other => other.toString // Long, Boolean, String
    }
    ids.indices.map { i =>
      val emb = embs(i) match {
        case b: mutable.ArrayBuffer[_] => b.map {
          case d: java.lang.Double => d.floatValue()
          case l: java.lang.Long => l.floatValue()
          case x => throw new IllegalArgumentException(s"non-numeric embedding component: $x")
        }.toArray
        case x => throw new IllegalArgumentException(s"embedding $i is not a list: $x")
      }
      val meta = metas(i) match {
        case m: mutable.LinkedHashMap[_, _] =>
          m.asInstanceOf[mutable.LinkedHashMap[Any, Any]]
            .map { case (k, v) => k.toString -> render(v) }.toMap
        case null => Map.empty[String, String]
        case x => throw new IllegalArgumentException(s"metadata $i is not a dict: $x")
      }
      LegacyEntry(ids(i).toString, emb, meta)
    }.toSeq
  }

  /** Pickle-form artifact → DataFrame (id, embedding Array[Float], metadata
    * Map[String, String]) — directly searchable with
    * [[graft.operators.Search.vectorTopK]] (idCol = "id") or writable as a
    * chunks table for a full collection rebuild.
    */
  def importPickled(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    import spark.implicits._
    decodePickled(bytes).toDF("id", "embedding", "metadata")
  }

  /** Our rows → the reference's legacy pickle form (`pickle.loads`-compatible
    * protocol-2 stream): the reverse migration. Input frame needs the same
    * three columns [[importPickled]] produces.
    */
  def exportPickled(df: DataFrame): Array[Byte] = {
    val rows = df.select("id", "embedding", "metadata").collect()
    val ids = mutable.ArrayBuffer.empty[Any]
    val embs = mutable.ArrayBuffer.empty[Any]
    val metas = mutable.ArrayBuffer.empty[Any]
    rows.foreach { r =>
      ids += r.getAs[String]("id")
      embs += r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(f => java.lang.Double.valueOf(f.toDouble)).toSeq
      metas += r.getAs[scala.collection.Map[String, String]]("metadata").toMap
    }
    Pickle.dump(mutable.LinkedHashMap[Any, Any](
      "ids" -> ids, "embeddings" -> embs, "metadatas" -> metas))
  }

  /** One archive member: path, size, regular-file flag. */
  final case class ArchiveEntry(name: String, size: Long, isFile: Boolean)

  /** List the members of an archive-form artifact without extracting — a
    * from-scratch ustar reader (512-byte headers, octal size at offset 124,
    * typeflag at 156, ustar prefix at 345; pax extended-header members 'x'/'g'
    * carry metadata only and are skipped with their payload; GNU 'L' longname
    * members rename the next member, 'K' long-linknames are consumed unused).
    */
  def listArchive(bytes: Array[Byte]): Seq[ArchiveEntry] = {
    require(isArchive(bytes), "not an archive-form artifact (magic prefix missing)")
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(
      bytes, ArchiveMagic.length, bytes.length - ArchiveMagic.length))
    val entries = mutable.ArrayBuffer.empty[ArchiveEntry]
    val header = new Array[Byte](512)
    def readFully(buf: Array[Byte]): Boolean = {
      var off = 0
      while (off < buf.length) {
        val n = in.read(buf, off, buf.length - off)
        if (n < 0) return off > 0 // truncated tail block
        off += n
      }
      true
    }
    def str(off: Int, len: Int): String = {
      var end = off
      while (end < off + len && header(end) != 0) end += 1
      new String(header, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
    }
    def octal(off: Int, len: Int): Long = {
      val s = str(off, len).trim
      if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
    }
    var done = false
    // GNU longname support: a typeflag-'L' member ("././@LongLink") carries the
    // REAL name of the next member as its payload. Both passes (list here,
    // extract below) resolve it identically — the extract-time traversal guard
    // validates the names THIS pass produces, so a divergence would be a
    // guard bypass. 'K' (long linkname) is consumed as metadata like pax.
    var pendingLongName: Option[String] = None
    while (!done && readFully(header)) {
      if (header.forall(_ == 0)) done = true // end-of-archive zero block
      else {
        val name = str(0, 100)
        val prefix = str(345, 155)
        val size = octal(124, 12)
        val typeflag = header(156).toChar
        if (typeflag == 'L') {
          require(size <= 4096, s"unreasonable GNU longname length: $size")
          val padded = (((size + 511) / 512) * 512).toInt
          val data = new Array[Byte](padded)
          readFully(data)
          var e = 0
          while (e < size && data(e) != 0) e += 1
          pendingLongName = Some(new String(data, 0, e,
            java.nio.charset.StandardCharsets.UTF_8))
        } else {
          // pax 'x'/'g' and GNU 'K' members between an 'L' and its target are
          // metadata-only: they must NOT consume the pending longname (GNU tar
          // applies 'L' to the next REAL member, skipping interleaved metadata)
          val isMetadata = typeflag == 'x' || typeflag == 'g' || typeflag == 'K'
          val full = pendingLongName.getOrElse(
            if (prefix.nonEmpty) s"$prefix/$name" else name)
          if (!isMetadata) pendingLongName = None
          val isFile = typeflag == '0' || typeflag == 0.toChar // NUL = old-style regular file
          if (!isMetadata)
            entries += ArchiveEntry(full, size, isFile)
          var toSkip = ((size + 511) / 512) * 512
          val skipBuf = new Array[Byte](512)
          while (toSkip > 0) {
            if (!readFully(skipBuf)) toSkip = 0 else toSkip -= 512
          }
        }
      }
    }
    in.close()
    entries.toSeq
  }

  /** Extract an archive-form artifact under `destDir`, refusing any member
    * whose resolved path escapes it — the same guard as the reference's
    * `__extract_archive_safely` (chroma_indexer.py:197-204).
    */
  def extractArchive(bytes: Array[Byte], destDir: String): Seq[ArchiveEntry] = {
    val root = new java.io.File(destDir).getCanonicalFile
    root.mkdirs()
    val entries = listArchive(bytes) // validates magic + structure first
    entries.foreach { e =>
      val target = new java.io.File(root, e.name).getCanonicalFile
      if (!target.getPath.startsWith(root.getPath + java.io.File.separator))
        throw new IllegalArgumentException(s"Invalid archive entry path: ${e.name}")
    }
    // second pass streams the data now that every path is known-safe
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(
      bytes, ArchiveMagic.length, bytes.length - ArchiveMagic.length))
    val header = new Array[Byte](512)
    def readFully(buf: Array[Byte], len: Int): Boolean = {
      var off = 0
      while (off < len) {
        val n = in.read(buf, off, len - off)
        if (n < 0) return false
        off += n
      }
      true
    }
    var done = false
    var pendingLongName: Option[String] = None // GNU 'L' — same rule as listArchive
    while (!done && readFully(header, 512)) {
      if (header.forall(_ == 0)) done = true
      else {
        var end = 0
        while (end < 100 && header(end) != 0) end += 1
        val name = new String(header, 0, end, java.nio.charset.StandardCharsets.UTF_8)
        var pEnd = 345
        while (pEnd < 500 && header(pEnd) != 0) pEnd += 1
        val prefix = new String(header, 345, pEnd - 345, java.nio.charset.StandardCharsets.UTF_8)
        val sizeStr = new String(header, 124, 12, java.nio.charset.StandardCharsets.UTF_8)
          .takeWhile(c => c != 0 && c != ' ').trim
        val size = if (sizeStr.isEmpty) 0L else java.lang.Long.parseLong(sizeStr, 8)
        val typeflag = header(156).toChar
        val padded = ((size + 511) / 512) * 512
        val data = new Array[Byte](padded.toInt)
        readFully(data, padded.toInt)
        if (typeflag == 'L') {
          require(size <= 4096, s"unreasonable GNU longname length: $size") // mirror listArchive
          var e = 0
          while (e < size && data(e) != 0) e += 1
          pendingLongName = Some(new String(data, 0, e,
            java.nio.charset.StandardCharsets.UTF_8))
        } else {
          val isMetadata = typeflag == 'x' || typeflag == 'g' || typeflag == 'K'
          val full = pendingLongName.getOrElse(
            if (prefix.nonEmpty) s"$prefix/$name" else name)
          if (!isMetadata) pendingLongName = None
          if (typeflag == '0' || typeflag == 0.toChar) { // NUL = old-style regular file
            val target = new java.io.File(root, full)
            target.getParentFile.mkdirs()
            java.nio.file.Files.write(target.toPath,
              java.util.Arrays.copyOfRange(data, 0, size.toInt))
          } else if (typeflag == '5') new java.io.File(root, full).mkdirs()
          // pax 'x'/'g', 'K', and anything else: payload consumed, nothing written
        }
      }
    }
    in.close()
    entries
  }
}
