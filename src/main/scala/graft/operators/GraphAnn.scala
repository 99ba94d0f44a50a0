package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-ANN (the recall class of the reference's Chroma HNSW backend,
  * /root/reference/main/indexes/indexers/chroma_indexer.py:155, hnsw:space=l2)
  * re-expressed for Spark's execution model: a navigable-small-world graph is
  * an in-memory, pointer-chasing structure, so the distributed shape is the
  * FAISS-shard pattern — build one small graph PER PARTITION inside
  * `mapPartitions`, search every (broadcast) query against each shard, then
  * merge the per-shard top-k with one narrow shuffle of (query, id, dist)
  * triples. No global graph, no driver-side index, nothing pickled across the
  * cluster: each task owns its shard end to end.
  *
  * The per-shard index is single-layer NSW rather than hierarchical: shards
  * are partition-sized (≤ a few hundred thousand vectors), where the
  * hierarchy's log-factor entry descent saves little but costs build
  * complexity; the greedy best-first ef-search — the part that buys the
  * recall/speed trade — is the same algorithm HNSW runs on its bottom layer.
  *
  * Determinism: insertion in ascending id order, (dist, id) tie-breaks
  * everywhere — two runs over the same partitioning return byte-identical
  * results, which is what lets exhaustive-mode runs hash-gate against a SQL
  * oracle (`ann_graph_topk`) while approximate mode is recall-gated in
  * GraphAnnSpec (approximation itself is not SQL-expressible).
  */
object GraphAnn {

  /** Single-layer NSW over squared-L2. Not thread-safe; one per task. */
  private[operators] final class NswIndex(m: Int) {
    private val maxDegree = 2 * m
    private val ids = mutable.ArrayBuffer.empty[Long]
    private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    private val adj = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Int]]
    // parentOf(x) = the closest already-inserted node at x's insertion time
    // (-1 for the entry node). The edge parentOf(x) -> x is PERMANENT: the
    // degree-cap shrink never evicts it, so the parent edges form a spanning
    // tree rooted at node 0 and every node stays reachable from the entry —
    // the structural guarantee behind "exhaustive mode equals brute force".
    private val parentOf = mutable.ArrayBuffer.empty[Int]

    def size: Int = ids.length

    private def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      s
    }

    /** Best-first ef-search: returns up to `ef` nearest internal nodes as
      * (internalIdx, dist), unsorted. With ef >= component size this visits
      * every reachable node (the exhaustive mode the oracle gates).
      */
    private def efSearch(q: Array[Float], ef: Int): mutable.ArrayBuffer[(Int, Double)] = {
      val out = mutable.ArrayBuffer.empty[(Int, Double)]
      if (ids.isEmpty) return out
      // candidates: nearest-first; results tracked with a worst-first bound
      implicit val candOrd: Ordering[(Double, Long, Int)] = Ordering.by(t => (-t._1, -t._2))
      val cand = mutable.PriorityQueue.empty[(Double, Long, Int)]
      val resOrd: Ordering[(Double, Long, Int)] = Ordering.by(t => (t._1, t._2))
      val res = mutable.PriorityQueue.empty[(Double, Long, Int)](resOrd)
      val visited = new java.util.BitSet(ids.length)
      val d0 = dist(q, vecs(0))
      cand.enqueue((d0, ids(0), 0)); res.enqueue((d0, ids(0), 0)); visited.set(0)
      while (cand.nonEmpty) {
        val (cd, _, ci) = cand.dequeue()
        if (res.size >= ef && cd > res.head._1) { cand.clear() }
        else {
          val ns = adj(ci)
          var j = 0
          while (j < ns.length) {
            val nb = ns(j)
            if (!visited.get(nb)) {
              visited.set(nb)
              val d = dist(q, vecs(nb))
              if (res.size < ef || d < res.head._1 ||
                  (d == res.head._1 && ids(nb) < res.head._2)) {
                cand.enqueue((d, ids(nb), nb))
                res.enqueue((d, ids(nb), nb))
                if (res.size > ef) res.dequeue()
              }
            }
            j += 1
          }
        }
      }
      res.foreach { case (d, _, i) => out += ((i, d)) }
      out
    }

    def insert(id: Long, vec: Array[Float], efConstruction: Int): Unit = {
      val newIdx = ids.length
      if (newIdx > 0) {
        val near = efSearch(vec, efConstruction)
          .sortBy { case (i, d) => (d, ids(i)) }.take(m)
        ids += id; vecs += vec
        adj += near.map(_._1).to(mutable.ArrayBuffer)
        parentOf += near.head._1
        near.foreach { case (nb, _) =>
          adj(nb) += newIdx
          if (adj(nb).length > maxDegree) {
            // Degree cap (HNSW's shrink step): keep the closest neighbors,
            // EXCEPT that spanning-tree edges (nb -> x where parentOf(x)
            // == nb) are never evicted — otherwise a node whose last
            // in-edge gets shrunk away becomes unreachable from entry 0
            // and exhaustive-mode completeness would be data-dependent.
            // Degree may exceed maxDegree by nb's tree-child count (~1 on
            // average, since each node has exactly one parent).
            val (tree, rest) = adj(nb)
              .partition(x => parentOf(x) == nb)
            val kept = rest
              .map(x => (dist(vecs(nb), vecs(x)), ids(x), x))
              .sortBy(t => (t._1, t._2))
              .take(math.max(0, maxDegree - tree.length)).map(_._3)
            adj(nb) = tree ++ kept
          }
        }
      } else {
        ids += id; vecs += vec
        adj += mutable.ArrayBuffer.empty[Int]; parentOf += -1
      }
    }

    /** Top-k (id, dist), ascending dist with id tie-break. */
    def search(q: Array[Float], k: Int, ef: Int): Seq[(Long, Double)] =
      efSearch(q, math.max(ef, k))
        .map { case (i, d) => (ids(i), d) }
        .sortBy { case (id, d) => (d, id) }.take(k).toSeq
  }

  /** Batch top-k for `queries` over `vectors`: one NSW shard per partition,
    * every query searches every shard, global merge keeps the k best per
    * query. Shuffle cost: numPartitions × |queries| × k narrow triples —
    * independent of corpus size. Each partition's rows are materialized to
    * build its shard (inherent to any in-memory index; size partitions
    * accordingly, e.g. repartitionByRange on the id). With
    * `efSearch >= partition size` results are exhaustive-exact; production
    * settings (ef ~ 4–8×k) trade recall for a sublinear graph walk.
    */
  def nswTopK(
      vectors: DataFrame, idCol: String, vecCol: String,
      queries: Seq[(Long, Array[Float])], k: Int,
      m: Int = 8, efConstruction: Int = 64, efSearch: Int = 64): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(queries.toArray)
    val perShard = vectors
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val rows = it.toArray.sortBy(_._1) // deterministic insertion order
        if (rows.isEmpty) Iterator.empty
        else {
          val index = new NswIndex(m)
          rows.foreach { case (id, v) => index.insert(id, v, efConstruction) }
          qB.value.iterator.flatMap { case (qid, qv) =>
            index.search(qv, k, efSearch).map { case (id, d) => (qid, id, d) }
          }
        }
      }
      .toDF("query_id", idCol, "dist")
    val w = Window.partitionBy("query_id").orderBy(col("dist").asc, col(idCol).asc)
    perShard.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k).drop("_rn")
  }
}
