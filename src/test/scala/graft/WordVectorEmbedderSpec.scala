package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.CollectionManager
import graft.functions.{HashingEmbedder, TextSplitter, WordVectorEmbedder}

/** The real-embedder slot: an external word-vector artifact loaded from disk
  * drives collection build + search through the same [[graft.functions.Embedder]]
  * plug point as the hashing default, and the manifest identity guard tells
  * two different artifacts apart.
  */
class WordVectorEmbedderSpec extends AnyFunSuite with SparkSuite {

  /** 4-d toy table: two tight clusters (animals vs infra) so cosine ranking is
    * predictable. A word2vec-style `count dim` header exercises the skip path.
    */
  private def writeVectors(extraScale: Float = 1f): String = {
    val f = Files.createTempFile("graft-wordvec", ".txt")
    val rows = Seq(
      "6 4",
      s"cat ${0.9f * extraScale} 0.1 0.0 0.0",
      s"dog ${0.8f * extraScale} 0.2 0.0 0.0",
      "kitten 0.85 0.15 0.0 0.0",
      "server 0.0 0.0 0.9 0.1",
      "deploy 0.0 0.0 0.8 0.2",
      "cluster 0.0 0.1 0.85 0.15")
    Files.writeString(f, rows.mkString("\n"))
    f.toString
  }

  test("fromFile: header skipped, dim inferred, OOV → zero vector") {
    val e = WordVectorEmbedder.fromFile(writeVectors())
    assert(e.dim === 4)
    assert(e.vocabularySize === 6)
    val cat = e.embed("cat")
    val norm = math.sqrt(cat.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5) // L2-normalized
    assert(e.embed("completely unknown words").forall(_ == 0f))
    // mean-of-vectors: "cat dog" sits between the two, still animal-side
    assert(e.embed("cat dog")(0) > 0.9f)
  }

  test("identity digest distinguishes two different artifacts") {
    val a = WordVectorEmbedder.fromFile(writeVectors())
    val b = WordVectorEmbedder.fromFile(writeVectors(extraScale = 0.5f))
    assert(a.name !== b.name)
    assert(a.name.startsWith("wordvec-") && a.name.contains("-4-"))
  }

  test("collection build + search through the file-backed embedder") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-wv-coll").toString
    val embedder = WordVectorEmbedder.fromFile(writeVectors())
    val cm = new CollectionManager(spark, tmp, embedder, new TextSplitter(50, 0))

    val docs = Seq(
      ("pets", "file://pets", Map("k" -> "v"), "the cat and the dog and the kitten"),
      ("infra", "file://infra", Map("k" -> "v"), "deploy the server cluster"))
      .toDF("id", "url", "metadata", "text")
    cm.create("wv", docs)

    val hits = cm.search("wv", "kitten cat", indexNames = Some(Seq("vector_exact_l2")),
      maxDocs = 1).collect()
    assert(hits.map(_.getAs[String]("documentId")).toSeq === Seq("pets"))
    val ops = cm.search("wv", "server deploy", indexNames = Some(Seq("vector_exact_l2")),
      maxDocs = 1).collect()
    assert(ops.map(_.getAs[String]("documentId")).toSeq === Seq("infra"))

    // The guard: a manager with a different embedder must refuse to search.
    val wrong = new CollectionManager(spark, tmp, new HashingEmbedder(dim = 4),
      new TextSplitter(50, 0))
    val e = intercept[IllegalArgumentException](wrong.search("wv", "cat"))
    assert(e.getMessage.contains("embedded with"))
  }
}
