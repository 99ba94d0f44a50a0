package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphAnn

/** Graph-ANN: exhaustive mode must equal brute force exactly; approximate
  * mode (bounded efSearch) must clear a recall floor — the standard ANN
  * acceptance shape (identical to how FAISS/HNSW libraries gate themselves).
  */
class GraphAnnSpec extends AnyFunSuite with SparkSuite {

  /** Deterministic pseudo-random unit-ish vectors: dim 16, seeded per id. */
  private def corpus(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      val rnd = new scala.util.Random(i * 7919L)
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
  }

  private def queryVecs(qn: Int): Seq[(Long, Array[Float])] =
    (1 to qn).map { q =>
      val rnd = new scala.util.Random(q * 104729L)
      (q.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    }

  private def bruteTopK(df: org.apache.spark.sql.DataFrame,
                        qs: Seq[(Long, Array[Float])], k: Int): Map[Long, Seq[Long]] =
    qs.map { case (qid, qv) =>
      qid -> graft.operators.Search.vectorTopK(df, "embedding", qv, k,
          metric = "l2", idCol = "vec_id")
        .select("vec_id").collect().map(_.getLong(0)).toSeq
    }.toMap

  test("exhaustive mode equals brute force across multiple shards") {
    val df = corpus(300).repartition(3)
    val qs = queryVecs(5)
    val exact = bruteTopK(df, qs, 10)
    val got = GraphAnn.nswTopK(df, "vec_id", "embedding", qs, 10,
        m = 6, efConstruction = 24, efSearch = 1 << 20)
      .orderBy("query_id", "dist", "vec_id").collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSeq).toMap
    qs.foreach { case (qid, _) => assert(got(qid) === exact(qid), s"query $qid") }
  }

  test("approximate mode clears a 0.9 recall@10 floor at ef=64") {
    val df = corpus(600).repartition(2)
    val qs = queryVecs(8)
    val exact = bruteTopK(df, qs, 10)
    val got = GraphAnn.nswTopK(df, "vec_id", "embedding", qs, 10,
        m = 8, efConstruction = 48, efSearch = 64)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val recalls = qs.map { case (qid, _) =>
      exact(qid).count(got(qid).contains).toDouble / exact(qid).size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean below floor (per-query: $recalls)")
  }

  test("deterministic: two runs return identical rows") {
    val df = corpus(200).repartition(2)
    val qs = queryVecs(3)
    def run() = GraphAnn.nswTopK(df, "vec_id", "embedding", qs, 5,
        m = 4, efConstruction = 16, efSearch = 24)
      .orderBy("query_id", "dist", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSeq
    assert(run() === run())
  }

  test("degree-cap shrink keeps every node reachable from the entry") {
    import spark.implicits._
    // Adversarial shrink pressure: 8 tight clusters far apart, interleaved
    // in insertion order, with the smallest degree cap (m=2 → maxDegree=4).
    // Without the permanent spanning-tree edges, shrink can evict every
    // in-edge of an early node and exhaustive search silently misses it;
    // with them, exhaustive mode must return ALL n nodes.
    val n = 400
    val df = (0 until n).map { i =>
      val c = i % 8
      val rnd = new scala.util.Random(i * 31L + 7)
      val v = Array.tabulate(16)(d =>
        (if (d == c * 2) 100f else 0f) + rnd.nextFloat() * 0.01f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding").repartition(1)
    val got = GraphAnn.nswTopK(df, "vec_id", "embedding",
        Seq((1L, Array.fill(16)(0f))), n,
        m = 2, efConstruction = 8, efSearch = 1 << 20)
      .select("vec_id").as[Long].collect().toSet
    assert(got.size === n, s"exhaustive search reached only ${got.size} of $n")
  }

  test("degenerate inputs: empty partitions and a one-vector corpus") {
    import spark.implicits._
    val one = Seq((42L, Array.fill(16)(0.5f))).toDF("vec_id", "embedding")
      .repartition(4) // 3 partitions end up empty
    val got = GraphAnn.nswTopK(one, "vec_id", "embedding",
        Seq((0L, Array.fill(16)(0.1f))), 3).collect()
    assert(got.length === 1 && got.head.getLong(1) === 42L)
  }
}
