package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** File-backed word-vector embedder: the "real model" slot of the [[Embedder]]
  * contract (the reference wires sentence-transformers here,
  * /root/reference/main/indexes/embeddings/all_mini_lm_l6_v2_embedder.py:6-15;
  * this is the same plug point fed from an external artifact instead of a
  * bundled torch model). Loads a GloVe/word2vec-style text table — one
  * `token v1 v2 … vd` row per line — and embeds text as the L2-normalized
  * mean of its tokens' vectors, the standard bag-of-word-vectors sentence
  * encoder. Out-of-vocabulary tokens are skipped; an all-OOV text embeds to
  * the zero vector (cosine 0 against everything, so it never ranks).
  *
  * The manifest identity ([[name]]) includes a content digest of the model
  * file: two collections built from different artifacts — even same-named
  * files — are distinct, so the CollectionManager's embedder guard catches a
  * swapped model the same way it catches a changed hashing seed.
  *
  * Scale note: the table is loaded once on the driver and ships to executors
  * inside the task closure (it is a plain `Map` on a Serializable class).
  * Word tables are MBs, not GBs — for a genuinely large vocabulary, wrap the
  * map in a `SparkContext.broadcast` at the call site; the embed math is
  * unchanged.
  */
final class WordVectorEmbedder private (
    val dim: Int,
    digest: String,
    label: String,
    vectors: Map[String, Array[Float]]) extends Embedder {

  override def name: String = s"wordvec-$label-$dim-$digest"

  private def tokens(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  def vocabularySize: Int = vectors.size

  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null) {
      var n = 0
      tokens(text).foreach { t =>
        vectors.get(t) match {
          case Some(w) =>
            var i = 0
            while (i < dim) { v(i) += w(i); i += 1 }
            n += 1
          case None => ()
        }
      }
      if (n > 0) {
        var s = 0.0
        var i = 0
        while (i < dim) { s += v(i).toDouble * v(i); i += 1 }
        if (s > 0) {
          val inv = 1.0 / math.sqrt(s)
          i = 0
          while (i < dim) { v(i) = (v(i) * inv).toFloat; i += 1 }
        }
      }
    }
    v
  }
}

object WordVectorEmbedder {

  /** Load a text word-vector table. Lines that don't parse (headers, wrong
    * arity) are skipped — word2vec text exports start with a `count dim`
    * header line, GloVe files don't; both load with the same call.
    */
  def fromFile(path: String): WordVectorEmbedder = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val digest = MessageDigest.getInstance("SHA-256").digest(bytes)
      .take(6).map("%02x".format(_)).mkString
    val rows = new String(bytes, StandardCharsets.UTF_8).linesIterator
      .flatMap { line =>
        val parts = line.trim.split("\\s+")
        if (parts.length < 3) None
        else try Some(parts(0).toLowerCase -> parts.tail.map(_.toFloat))
        catch { case _: NumberFormatException => None }
      }.toSeq
    require(rows.nonEmpty, s"no parseable vector rows in $path")
    val dim = rows.head._2.length
    val sameDim = rows.filter(_._2.length == dim)
    val fileLabel = Paths.get(path).getFileName.toString.replaceAll("\\W+", "_")
    new WordVectorEmbedder(dim, digest, fileLabel, sameDim.toMap)
  }
}
