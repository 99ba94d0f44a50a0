package graft.operators

import graft.plans.VectorFunctions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over an embedding column.
  *
  * The reference's ANN is Chroma's HNSW (space=l2 —
  * /root/reference/main/indexes/indexers/chroma_indexer.py:155); HNSW's
  * pointer-chasing graph doesn't map to columnar scans, so the Spark-native scale
  * paths are:
  *
  *  - brute force:  exact scan + TakeOrderedAndProject ([[Search.vectorTopK]]) —
  *                  the FAISS IndexFlatL2 semantics, embarrassingly parallel,
  *                  right up to ~10^8 vectors × small k;
  *  - IVF:          k-means coarse quantizer (MLlib KMeans, seeded); vectors
  *                  partition into nLists inverted lists; a query probes the
  *                  nProbe nearest lists — scan cost drops by nLists/nProbe.
  *                  With the chunks table partitioned by listId, partition
  *                  pruning turns the probe into a file-skip at scale;
  *  - sign-LSH:     random-hyperplane-free sign buckets (dimension signs),
  *                  multi-probe by Hamming-adjacent buckets ([[Dedup.signBucket]]).
  *
  * IVF recall with nProbe=nLists is exactly brute force (tested); smaller nProbe
  * trades recall for a proportional scan-cost drop.
  */
object Ann {

  final case class IvfIndex(
      assigned: DataFrame,            // input columns + listId
      centroids: Array[Array[Float]], // listId -> centroid
      vecCol: String)

  private val toVec = udf((a: Seq[Float]) =>
    Vectors.dense(a.map(_.toDouble).toArray))

  /** Build an IVF index: seeded k-means over (a sample of) the vectors, then
    * assign every vector to its nearest centroid's inverted list. At scale,
    * write `assigned` partitioned by listId so probes prune partitions.
    */
  def buildIvf(
      vectors: DataFrame, vecCol: String,
      nLists: Int, seed: Long = 42L, sampleFraction: Double = 1.0,
      maxIter: Int = 10): IvfIndex = {
    val train = (if (sampleFraction < 1.0)
      vectors.sample(withReplacement = false, sampleFraction, seed) else vectors)
      .select(toVec(col(vecCol)).as("features"))
    // A coarse quantizer needs rough centroids, not convergence — cap iterations
    // and use random init (FAISS trains its IVF quantizer with a similarly
    // small fixed budget; k-means|| init would double the job count for
    // precision the probe layer doesn't need).
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random")
      .setFeaturesCol("features")
      .fit(train)
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    val assigned = assignLists(vectors, vecCol, centroids)
    IvfIndex(assigned, centroids, vecCol)
  }

  /** [[buildIvf]] with a bit-reproducible quantizer: seed centroids are the
    * `nLists` lowest-id training vectors (an order- and partitioning-invariant
    * choice) and Lloyd rounds run through
    * [[Training.kMeansLloyd]]'s rounding contract (ROUND(dist, 6) argmin,
    * ROUND(avg, 9) updates), so two builds over the same data produce
    * byte-identical centroids AND assignments — the property incremental
    * update parity needs (a re-build must not silently re-shuffle every
    * vector's list), which MLlib's k-means does not guarantee across
    * partitionings. Same probe/search path as [[buildIvf]].
    */
  def buildIvfDeterministic(
      vectors: DataFrame, idCol: String, vecCol: String,
      nLists: Int, iters: Int = 5, sampleFraction: Double = 1.0,
      seed: Long = 42L): IvfIndex = {
    val train = if (sampleFraction < 1.0)
      vectors.sample(withReplacement = false, sampleFraction, seed) else vectors
    // k rows through a global window — build-time only, k-sized by the limit
    val init = train.orderBy(col(idCol)).limit(nLists)
      .withColumn("cid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(idCol))).cast("long") - 1)
      .select(col("cid"), posexplode(col(vecCol)).as(Seq("dim", "cval")))
    val cent = Training.kMeansLloyd(train, idCol, vecCol, init, iters)
      .collect() // k·d rows — the model, the legitimate driver-side residue
    val k = cent.map(_.getAs[Long]("cid")).max.toInt + 1
    val centroids = Array.tabulate(k) { cid =>
      cent.filter(_.getAs[Long]("cid") == cid.toLong).sortBy(_.getAs[Int]("dim"))
        .map(_.getAs[Double]("cval").toFloat)
    }
    IvfIndex(assignLists(vectors, vecCol, centroids), centroids, vecCol)
  }

  /** listId = argmin over centroids of squared L2 — computed with the codegen'd
    * l2_sq_f expression against a literal centroid array (no UDF in the hot path).
    */
  def assignLists(vectors: DataFrame, vecCol: String,
                  centroids: Array[Array[Float]]): DataFrame =
    assignListsWithDist(vectors, vecCol, centroids).drop("listDist")

  /** [[assignLists]] plus the distance to the assigned centroid (for cluster
    * quality stats). The argmin struct binds to a column ONCE and both fields
    * project from it — inlining it twice would re-evaluate every centroid
    * distance (CollapseProject does not dedupe non-cheap expressions).
    */
  def assignListsWithDist(vectors: DataFrame, vecCol: String,
                          centroids: Array[Array[Float]]): DataFrame = {
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      struct(l2SqF(col(vecCol), typedLit(c)).as("d"), lit(i).as("i"))
    }
    vectors.withColumn("_best", array_min(array(dists: _*)))
      .withColumn("listId", col("_best").getField("i"))
      .withColumn("listDist", col("_best").getField("d"))
      .drop("_best")
  }

  /** Probe the nProbe lists nearest to the query, brute-force inside them.
    * Returns top-k by the requested metric with deterministic id tie-break.
    */
  def searchIvf(
      index: IvfIndex, queryVec: Array[Float], k: Int, nProbe: Int,
      metric: String = "l2", idCol: String = "vec_id"): DataFrame = {
    val probeLists = index.centroids.zipWithIndex
      .map { case (c, i) => (l2Sq(c, queryVec), i) }
      .sortBy(_._1).take(nProbe).map(_._2)
    Search.vectorTopK(
      index.assigned.filter(col("listId").isin(probeLists: _*)),
      index.vecCol, queryVec, k, metric, idCol = idCol)
  }

  /** Batch IVF probe — ANN serving for a whole query batch in ONE plan:
    * probe lists resolve on the driver (centroids are local by construction),
    * the (qid, listId, qvec) probe table broadcasts, and each corpus row
    * scores only against the queries probing its list — an equi-join on
    * listId into narrow (qid, vec_id, dist) triples, then a per-query top-k
    * window. Scan cost equals the union of probed lists; one job instead of
    * |queries| sequential [[searchIvf]] calls, and the corpus side never
    * shuffles (the window keys on qid over k·|queries|-scale triples).
    */
  def searchIvfBatch(
      index: IvfIndex, queries: Seq[(Long, Array[Float])], k: Int, nProbe: Int,
      metric: String = "l2", idCol: String = "vec_id"): DataFrame = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val probeRows = queries.flatMap { case (qid, qv) =>
      index.centroids.zipWithIndex.map { case (c, i) => (l2Sq(c, qv), i) }
        .sortBy(_._1).take(nProbe).map { case (_, i) => (qid, i, qv) }
    }
    val probes = probeRows.toDF("qid", "listId", "qvec")
    val dist = metric match {
      case "l2"     => l2SqF(col(index.vecCol), col("qvec"))
      case "cosine" => -cosineF(col(index.vecCol), col("qvec"))
      case "dot"    => -dotF(col(index.vecCol), col("qvec"))
      case m        => throw new IllegalArgumentException(s"unknown metric $m")
    }
    index.assigned.join(broadcast(probes), "listId")
      .select(col("qid"), col(idCol), dist.as("dist"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("dist").asc, col(idCol).asc)).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Recall@k of an approximate result set against the exact one, per query:
    * |approx ∩ exact| / k over (qidCol, idCol) membership. The standard ANN
    * quality gauge, as a two-aggregate plan over k·|queries|-scale inputs —
    * run it on a sampled query set to regression-track an index's recall
    * after rebuilds (the evaluation loop FAISS users run offline).
    */
  def recallAtK(approx: DataFrame, exact: DataFrame,
                qidCol: String, idCol: String, k: Int): DataFrame = {
    val hits = exact.select(col(qidCol), col(idCol))
      .join(approx.select(col(qidCol), col(idCol)), Seq(qidCol, idCol), "left_semi")
      .groupBy(qidCol).agg((count(lit(1)) / k.toDouble).as("recall"))
    // a query whose approx set misses ALL true neighbors must report 0, not
    // silently vanish from the board
    exact.select(col(qidCol)).distinct()
      .join(hits, Seq(qidCol), "left")
      .select(col(qidCol), coalesce(col("recall"), lit(0.0)).as("recall"))
  }

  private def l2Sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }

  /** Multi-probe sign-LSH search: scan only rows whose sign bucket is within
    * Hamming distance `probeHamming` of the query's bucket (bits+1 buckets for
    * distance 1 — a 2^bits/(bits+1) scan reduction), then brute-force.
    */
  def searchSignLsh(
      vectors: DataFrame, vecCol: String, queryVec: Array[Float], k: Int,
      bits: Int = 8, probeHamming: Int = 1,
      metric: String = "cosine", idCol: String = "vec_id"): DataFrame = {
    val qBucket = queryVec.take(bits).map(x => if (x >= 0) '1' else '0').mkString
    val probes = scala.collection.mutable.Set(qBucket)
    if (probeHamming >= 1)
      for (i <- 0 until bits)
        probes += qBucket.updated(i, if (qBucket(i) == '1') '0' else '1')
    val bucketed = vectors.withColumn("bucket", Dedup.signBucket(col(vecCol), bits))
    Search.vectorTopK(
      bucketed.filter(col("bucket").isin(probes.toSeq: _*)),
      vecCol, queryVec, k, metric, idCol = idCol)
  }
}
