package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.VectorFunctions.l2SqF

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the compression layer that makes
  * billion-vector ANN feasible: split the embedding into `numSub` subspaces,
  * quantize each to one of `k` centroids, and search with asymmetric distance
  * computation (ADC) — the query stays exact, each row costs `numSub` table
  * lookups over a 4-bit/8-bit code instead of a full float vector. The
  * recall class of FAISS's IVF-PQ (the reference's FAISS flat index is the
  * uncompressed baseline — /root/reference/main/indexes/indexers/
  * faiss_indexer.py); composes with [[Ann]]'s IVF lists exactly as IVF-PQ.
  *
  * 100 TB posture: encode is a NARROW per-row expression (the argmin over
  * centroids is an `array_min` over a numSub×k struct literal — no join, no
  * shuffle, codegen'd); codes are numSub ints vs dim floats (32× smaller at
  * 64-dim/8-sub); ADC scans read ONLY the code column plus a broadcast-free
  * literal LUT — top-k is a `TakeOrderedAndProject`. Fitting here is the
  * deterministic fixed-centroid recipe (sub-vectors of the k smallest-id
  * vectors) so the oracle replays it; production swaps per-subspace k-means
  * trained offline — the model shape and search path are identical.
  */
object Pq {

  /** centroids(s)(c) = the subDim-float centroid c of subspace s. */
  final case class PqModel(numSub: Int, subDim: Int, k: Int,
                           centroids: Array[Array[Array[Float]]]) {
    require(centroids.length == numSub && centroids.forall(_.length == k))

    /** Reconstruction of a code: concatenate its per-subspace centroids. */
    def reconstruct(code: Seq[Int]): Array[Float] =
      code.zipWithIndex.flatMap { case (c, s) => centroids(s)(c) }.toArray
  }

  /** Deterministic fit: subspace centroids are the sub-vectors of the `k`
    * smallest-id vectors — the fixed-centroid recipe that lets a SQL oracle
    * replay encode+search end to end (same trick as `cluster_assign`/IVF).
    */
  def fitFromIds(vectors: DataFrame, idCol: String, vecCol: String,
                 numSub: Int, k: Int): PqModel = {
    val rows = vectors.orderBy(col(idCol)).limit(k)
      .select(vecCol).collect().map(_.getSeq[Float](0).toArray)
    require(rows.length == k, s"need $k training vectors, got ${rows.length}")
    val dim = rows.head.length
    require(dim % numSub == 0, s"dim $dim not divisible by $numSub subspaces")
    val subDim = dim / numSub
    PqModel(numSub, subDim, k,
      Array.tabulate(numSub, k)((s, c) => rows(c).slice(s * subDim, (s + 1) * subDim)))
  }

  /** Encode every vector to its `numSub`-int code: per subspace, the argmin
    * centroid by squared L2 with (dist, cid) tie-break — an `array_min` over
    * a struct literal per subspace, all narrow and codegen'd. Sub-vectors
    * bind to a column once (multi-referenced non-cheap projections don't
    * re-inline). Output: input columns minus the vector, plus `code`.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             model: PqModel): DataFrame = {
    val bound = df.withColumn("_sv", expr(
      s"transform(sequence(0, ${model.numSub - 1}), " +
        s"s -> slice($vecCol, s * ${model.subDim} + 1, ${model.subDim}))"))
    val codes = (0 until model.numSub).map { s =>
      val cands = (0 until model.k).map { c =>
        struct(
          l2SqF(element_at(col("_sv"), s + 1), typedlit(model.centroids(s)(c)))
            .as("d"),
          lit(c).as("i"))
      }
      array_min(array(cands: _*)).getField("i")
    }
    bound.withColumn("code", array(codes: _*)).drop("_sv", vecCol)
  }

  /** ADC top-k: distance(row) = Σ_s lut(s)(code(s)) where lut(s)(c) is the
    * exact squared L2 from the query's subspace-s slice to centroid c —
    * mathematically l2²(query, reconstruct(code)). Pure per-row lookups into
    * a numSub×k literal plus a TakeOrderedAndProject; rows never touch float
    * vectors.
    */
  def adcTopK(codes: DataFrame, idCol: String, codeCol: String,
              model: PqModel, query: Array[Float], k: Int): DataFrame = {
    require(query.length == model.numSub * model.subDim, "query dim mismatch")
    val lut: Seq[Seq[Double]] = (0 until model.numSub).map { s =>
      (0 until model.k).map { c =>
        val cs = model.centroids(s)(c)
        var d = 0.0; var i = 0
        while (i < model.subDim) {
          val diff = query(s * model.subDim + i).toDouble - cs(i); d += diff * diff
          i += 1
        }
        d
      }
    }
    val lutLit = typedlit(lut)
    val adc = (0 until model.numSub)
      .map(s => element_at(element_at(lutLit, s + 1),
        element_at(col(codeCol), s + 1) + 1))
      .reduce(_ + _)
    codes.withColumn("adc", adc)
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k)
  }

  /** Residual of a float vector against a constant centroid, with ENGINE-
    * PARITY float math: subtract in double (both engines' double ops are
    * IEEE-identical), then round back to float (one IEEE round-to-nearest in
    * both). A plain float subtraction would round differently from an
    * oracle that must cast through DOUBLE — this column is what lets
    * residual IVF-PQ hash-gate end to end.
    */
  def residualCol(vec: Column, centroid: Array[Float]): Column =
    zip_with(vec, typedlit(centroid),
      (x, y) => (x.cast("double") - y.cast("double")).cast("float"))

  /** Driver-side twin of [[residualCol]] for the query vector. */
  def residualVec(v: Array[Float], centroid: Array[Float]): Array[Float] =
    v.zip(centroid).map { case (a, b) => (a.toDouble - b.toDouble).toFloat }

  /** ADC shortlist → exact re-rank: the production PQ search recipe (FAISS's
    * `IndexRefineFlat` composition). The quantized scan over-fetches
    * `shortlist` candidates (cheap — codes only), then ONLY those rows'
    * full-precision vectors are re-scored with exact squared L2 and the true
    * top-`k` returned. Recovers most of the recall the 32× code compression
    * gives up, at the cost of `shortlist` exact distances instead of N.
    *
    * Scale shape: the shortlist ids collect to the driver (bounded — a few
    * hundred longs) and come back as an IN-list predicate, so the
    * full-precision pass is a PUSHED-DOWN point lookup into the vector table
    * (PushedFilters: In(id)), not a scan-plus-join — at 100 TB the re-rank
    * touches only the row groups holding the shortlist.
    */
  def adcRerankTopK(codes: DataFrame, vectors: DataFrame,
                    idCol: String, codeCol: String, vecCol: String,
                    model: PqModel, query: Array[Float], k: Int,
                    shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val ids = adcTopK(codes, idCol, codeCol, model, query, shortlist)
      .select(idCol).collect().map(_.get(0))
    vectors.filter(col(idCol).isin(ids: _*))
      .withColumn("dist", l2SqF(col(vecCol), typedlit(query.toSeq)))
      .select(col(idCol), col("dist"))
      .orderBy(round(col("dist"), 6).asc, col(idCol).asc)
      .limit(k)
  }
}
