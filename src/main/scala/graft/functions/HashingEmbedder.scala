package graft.functions

import scala.util.hashing.MurmurHash3

/** Pluggable embedder contract (reference: /root/reference/main/indexes/embeddings/
  * base_embedder.py:5-10 — `embed(texts) -> ndarray`, `get_number_of_dimensions`).
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Stable identity (model + config) recorded in collection manifests so a
    * search with a different embedder fails loudly instead of returning garbage
    * distances — the reference encodes the same thing in its
    * `type__embeddingModel` index names (indexer_factory.py:29-35).
    */
  def name: String = s"${getClass.getSimpleName}-$dim"
  def embed(text: String): Array[Float]
  def embedAll(texts: Iterator[String]): Iterator[Array[Float]] = texts.map(embed)
}

/** Deterministic feature-hashing embedder.
  *
  * sentence-transformers is not available on the JVM (offline env), so — following the
  * FakeEmbedder pattern of the reference's own tests
  * (/root/reference/tests/indexes/indexers/test_chroma_indexer.py:15-25) but seeded and
  * deterministic — we hash token uni+bigrams into a fixed-dim bag-of-features vector
  * (HashingTF-style), signed by a second hash bit, then L2-normalize. Deterministic ⇒
  * golden search outputs and oracle parity are possible; kNN-over-unit-vectors
  * capability is identical to a real model's. A real model slots in via [[Embedder]].
  */
final class HashingEmbedder(val dim: Int = 64, seed: Int = 42) extends Embedder {

  override def name: String = s"hashing-$dim-$seed"

  private def tokens(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null) {
      val ts = tokens(text)
      var i = 0
      while (i < ts.length) {
        addFeature(v, ts(i))
        if (i + 1 < ts.length) addFeature(v, ts(i) + " " + ts(i + 1))
        i += 1
      }
    }
    l2Normalize(v)
    v
  }

  private def addFeature(v: Array[Float], feature: String): Unit = {
    val h = MurmurHash3.stringHash(feature, seed)
    val idx = math.floorMod(h, dim)
    val sign = if (((h >>> 31) & 1) == 0) 1f else -1f
    v(idx) += sign
  }

  private def l2Normalize(v: Array[Float]): Unit = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    if (s > 0) {
      val inv = 1.0 / math.sqrt(s)
      i = 0
      while (i < v.length) { v(i) = (v(i) * inv).toFloat; i += 1 }
    }
  }
}

object HashingEmbedder {
  val default = new HashingEmbedder()
}
