package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mmr

/** Greedy MMR selection: diversity actually skips near-duplicates, ranks are
  * dense, ties break to the smallest id.
  */
class MmrSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // shortlist rows: (id, query-sim, embedding); query = (1, 0)
  private def shortlist = Seq(
    (1L, 1.0, Seq(1f, 0f)),   // exact hit
    (2L, 1.0, Seq(1f, 0f)),   // exact DUPLICATE of 1
    (3L, 0.6, Seq(0.6f, 0.8f)) // diverse: sim to 1/2 is 0.6
  ).toDF("id", "qs", "v")

  test("at lambda 0.5 the duplicate loses to the diverse candidate") {
    // equal query-sims, so ONLY diversity separates the picks:
    // sim(1,2) = 1 (exact dup), sim(1,3) = (9−1)/10 = 0.8
    val sl = Seq(
      (1L, 0.9, Seq(3f, 1f)),
      (2L, 0.9, Seq(3f, 1f)),   // exact duplicate of 1
      (3L, 0.9, Seq(3f, -1f))). // mirrored: diverse from 1/2
      toDF("id", "qs", "v")
    val got = Mmr.rerank(sl, "id", "qs", "v", k = 3, lam = 0.5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._2).toSeq === Seq(1L, 3L, 2L),
      s"pick order must be hit, diverse, duplicate: ${got.toSeq}")
    assert(got(0)._3 === 0.45)  // first pick = λ·qs
    assert(got(1)._3 === 0.05)  // .5·.9 − .5·.8
    assert(got(2)._3 === -0.05) // .5·.9 − .5·1
  }

  test("at high lambda relevance wins: the duplicate is picked second") {
    val got = Mmr.rerank(shortlist, "id", "qs", "v", k = 2, lam = 0.9)
      .collect().map(_.getLong(1)).toSeq
    // dup: .9·1 − .1·1 = .8; diverse: .9·.6 − .1·.6 = .48
    assert(got === Seq(1L, 2L))
  }

  test("k beyond the shortlist returns everything with dense ranks") {
    val got = Mmr.rerank(shortlist, "id", "qs", "v", k = 10, lam = 0.7)
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(got.map(_._1).toSeq === Seq(1, 2, 3))
    assert(got.map(_._2).toSet === Set(1L, 2L, 3L))
  }

  test("equal-score ties break to the smallest id") {
    val twins = Seq(
      (7L, 0.9, Seq(0f, 1f)),
      (4L, 0.9, Seq(0f, 1f))).toDF("id", "qs", "v")
    val got = Mmr.rerank(twins, "id", "qs", "v", k = 2, lam = 0.7)
      .collect().map(_.getLong(1)).toSeq
    assert(got === Seq(4L, 7L))
  }
}
