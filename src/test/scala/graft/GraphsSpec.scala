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

  test("dangling redistribution matches hand math and conserves total mass") {
    // X→Y: Y is dangling. N=2, d=0.85.
    // iter1: dSum=1.  X = 0.15+0.85·(0+0.5)        = 0.575
    //                 Y = 0.15+0.85·(1+0.5)        = 1.425
    // iter2: dSum=1.425, dm=0.7125.
    //                 X = 0.15+0.85·0.7125         = 0.755625
    //                 Y = 0.15+0.85·(0.575+0.7125) = 1.244375
    val e = Seq(("X", "Y")).toDF("src", "dst")
    val got = Graphs.pageRank(e, iters = 2, redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("X" -> 0.755625, "Y" -> 1.244375))
    assert(math.abs(got.values.sum - 2.0) < 1e-9,
      "stochastic form must conserve total mass = N")
    // and the default drops that mass: Y's dangling rank just vanishes
    val dropped = Graphs.pageRank(e, iters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dropped === Map("X" -> 0.15, "Y" -> 0.2775))
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

  // K4 minus the C–D edge: triangles ABC and ABD only
  private def diamond = Seq(
    ("A", "B"), ("A", "C"), ("A", "D"), ("B", "C"), ("B", "D")).toDF("src", "dst")

  test("triangle counts: each corner credited once per triangle") {
    val got = Graphs.triangleCounts(diamond)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("A" -> 2L, "B" -> 2L, "C" -> 1L, "D" -> 1L))
  }

  test("triangle counts ignore edge direction and duplicates") {
    val messy = diamond
      .union(diamond.select(col("dst").as("src"), col("src").as("dst")))
      .union(Seq(("C", "A"), ("A", "A")).toDF("src", "dst")) // reversed dup + self-loop
    val got = Graphs.triangleCounts(messy)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("A" -> 2L, "B" -> 2L, "C" -> 1L, "D" -> 1L))
  }

  test("hop distances: undirected path graph, bounded frontier") {
    // A–B–C–D–E as mixed-direction edges; BFS from A, 3 hops
    val path = Seq(("B", "A"), ("B", "C"), ("D", "C"), ("D", "E")).toDF("src", "dst")
    val src = Seq("A").toDF("node")
    val got = Graphs.hopDistances(path, src, maxHops = 3)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got === Map("A" -> 0, "B" -> 1, "C" -> 2, "D" -> 3),
      "E is 4 hops out and must not appear")
  }

  test("label propagation separates two triangles across a bridge") {
    // {A,B,C} and {D,E,F} triangles bridged by C–D; 3 synchronous rounds with
    // min-label tie-break (hand-simulated fixed point)
    val e = Seq(("A", "B"), ("A", "C"), ("B", "C"),
      ("D", "E"), ("D", "F"), ("E", "F"), ("C", "D")).toDF("src", "dst")
    val got = Graphs.labelPropagation(e, iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("A" -> "A", "B" -> "A", "C" -> "A",
      "D" -> "C", "E" -> "C", "F" -> "C"))
    // community PARTITION is the signal: {A,B,C} share a label, {D,E,F} share
    // a different one
    assert(Set(got("A"), got("B"), got("C")).size === 1)
    assert(Set(got("D"), got("E"), got("F")).size === 1)
    assert(got("A") !== got("D"))
  }

  test("label propagation includes isolated nodes only via the nodes frame") {
    val e = Seq(("A", "B"), ("A", "C"), ("B", "C")).toDF("src", "dst")
    val bare = Graphs.labelPropagation(e, iters = 2)
      .collect().map(r => r.getString(0)).toSet
    assert(bare === Set("A", "B", "C"), "edge-less nodes absent by default")
    val withIso = Graphs.labelPropagation(e, iters = 2,
        nodes = Some(Seq("Z", "A").toDF("node")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(withIso("Z") === "Z", "isolated node keeps its own label")
    assert(withIso.keySet === Set("A", "B", "C", "Z"),
      "nodes frame unions with endpoints — nobody is lost")
  }

  test("label propagation is partition-invariant") {
    val e = Seq(("A", "B"), ("A", "C"), ("B", "C"),
      ("D", "E"), ("D", "F"), ("E", "F"), ("C", "D")).toDF("src", "dst")
    val base = Graphs.labelPropagation(e, iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val rep = Graphs.labelPropagation(e.repartition(7), iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rep === base)
  }
}
