package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graphs

/** PageRank: hand-computed fixed point on a 3-node graph, no-in-link floor,
  * duplicate-edge dedup, and partition-invariance (the 9dp iteration round
  * makes the whole computation layout-independent).
  */
class GraphsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // A->B, A->C, B->C, C->A: outdeg A=2, B=1, C=1
  private def triangle = Seq(
    ("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")).toDF("src", "dst")

  test("two iterations match the hand-computed ranks exactly") {
    // r0 = 1 everywhere
    // iter1: A <- C/1 = 1       -> 0.15 + 0.85*1     = 1.0
    //        B <- A/2 = 0.5     -> 0.15 + 0.425      = 0.575
    //        C <- A/2 + B = 1.5 -> 0.15 + 1.275      = 1.425
    // iter2: A <- 1.425         -> 0.15 + 1.21125    = 1.36125
    //        B <- 1.0/2         -> 0.15 + 0.425      = 0.575
    //        C <- 0.5 + 0.575   -> 0.15 + 0.91375    = 1.06375
    val got = Graphs.pageRank(triangle, iters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("A" -> 1.36125, "B" -> 0.575, "C" -> 1.06375))
  }

  test("a node with no in-links settles at 1 - damping") {
    val e = Seq(("X", "Y"), ("Y", "Z")).toDF("src", "dst")
    val got = Graphs.pageRank(e, iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("X") === 0.15)
    // X's floor flows through: 0.15 + 0.85·0.15, as the operator's 9dp round
    // lands it (raw double math gives ...749999997 — the round is the point)
    assert(got("Y") === 0.2775)
  }

  test("duplicate edges dedup; result is partition-invariant") {
    val dup = triangle.union(triangle) // every edge twice
    val base = Graphs.pageRank(triangle, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dd = Graphs.pageRank(dup, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dd === base, "duplicate edges must not double contributions")
    val rep = Graphs.pageRank(triangle.repartition(13), iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rep === base, "rank must not depend on partitioning")
  }
}
