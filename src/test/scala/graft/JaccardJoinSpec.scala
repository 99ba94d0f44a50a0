package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Prefix-filtered Jaccard join: provably-lossless pruning, asserted
  * literally against the brute-force all-pairs join on a mutated corpus.
  */
class JaccardJoinSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // 40 base docs from a small vocab + 10 near-dup mutations of the first 10
  private def corpus = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rnd = new scala.util.Random(23L)
    val base = (0 until 40).map { i =>
      (i.toLong, Seq.fill(12 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val mutated = (0 until 10).map { i =>
      val words = base(i)._2.split(" ").toBuffer
      words(rnd.nextInt(words.size)) = vocab(rnd.nextInt(vocab.size)) // one swap
      (100L + i, words.mkString(" "))
    }
    (base ++ mutated).toDF("doc_id", "text")
  }

  test("prefix-filtered join equals the brute-force join at every threshold") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val brute = Dedup.ngramJaccardPairs(corpus, "doc_id", "text")
        .filter(col("jaccard") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val fast = Dedup.jaccardJoinPrefix(corpus, "doc_id", "text", threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast === brute, s"threshold $t: pruning must be lossless")
      assert(brute.nonEmpty || t > 0.5, s"threshold $t should find the mutations")
    }
  }

  test("the prefix self-join examines fewer pairs than the cross join") {
    // candidate generation (prefix-token equality) must prune: on this corpus
    // the all-pairs count is 50·49/2 = 1225
    val tok = Dedup.jaccardJoinPrefix(corpus, "doc_id", "text", threshold = 0.8)
    // can't reach inside the operator; proxy: high threshold → tiny prefixes →
    // few verified pairs, and the result is exactly the mutation pairs
    val got = tok.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall { case (a, b) => b - a == 100L },
      s"at 0.8 only the single-word mutations may match, got $got")
  }

  // ------------------------------------------------- edit-distance-1 join

  test("editDistanceJoin equals the brute-force levenshtein join (lossless)") {
    val strs = Seq("kitten", "mitten", "kitte", "kittens", "sitting",
      "abc", "acb", "zzzz", "spark", "spork", "spak").toDF("s")
    val brute = strs.as("a").crossJoin(strs.as("b"))
      .filter(col("a.s") < col("b.s") &&
        levenshtein(col("a.s"), col("b.s")) <= 1)
      .select(col("a.s"), col("b.s"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val fast = Dedup.editDistanceJoin(strs, "s")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fast === brute)
    // the families this data plants: substitution, deletion, insertion
    assert(brute.contains(("kitten", "mitten")))
    assert(brute.contains(("kitte", "kitten")))
    assert(brute.contains(("kitten", "kittens")))
    // transposition shares a deletion variant but is distance 2 → filtered
    assert(!fast.contains(("abc", "acb")))
  }

  test("editDistanceJoin: duplicate-character strings produce no duplicate pairs") {
    val strs = Seq("aab", "ab", "aa").toDF("s")
    val rows = Dedup.editDistanceJoin(strs, "s")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.length === rows.distinct.length)
    assert(rows.toSet === Set(("aa", "aab"), ("aab", "ab"), ("aa", "ab")))
  }
}
