package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine model training for curation classifiers — the "train the
  * quality filter on the corpus you are cleaning" loop (CCNet / fasttext
  * style model-based filtering, reference role: the quality gate a curation
  * pipeline applies before indexing). Complements the file-backed
  * [[graft.functions.LinearQualityModel]], which SHIPS a trained model;
  * this trains one from labeled rows without leaving the engine.
  *
  * Scale shape: full-batch gradient descent where each iteration is ONE
  * distributed aggregate — every row computes its error term and the d+1
  * gradient components partial-aggregate map-side, so the only thing that
  * crosses the wire per iteration is 32 partial gradient vectors of d+1
  * doubles, and the only driver state is the model itself (d+1 doubles —
  * the legitimate driver-side residue of data-parallel training). The
  * feature table is localCheckpoint-ed once so iterations do not re-derive
  * the upstream plan (same reasoning as [[Graphs.pageRank]]).
  *
  * Determinism: weights are updated THROUGH A SPARK `round(_, roundDp)`
  * (computed in a one-row DataFrame, not driver math) and re-enter the next
  * iteration as literals — the same per-iteration rounding contract that
  * makes [[Graphs.pageRank]] bit-reproducible across engines and
  * partitionings; `exp` follows the `ln` precedent of
  * [[LanguageModel]] (libm vs java.lang.Math agree far below the rounding
  * cut).
  */
object Training {

  /** A trained logistic model over named feature columns. */
  final case class LogRegModel(featureCols: Seq[String], bias: Double,
                               weights: Seq[Double], n: Long) {
    require(featureCols.length == weights.length)

    /** Left-associated linear term b + w1·x1 + … (association order matters
      * for bit-parity with an oracle writing the same expression).
      */
    def marginCol: Column =
      featureCols.zip(weights).foldLeft(lit(bias): Column) {
        case (acc, (f, w)) => acc + lit(w) * col(f)
      }

    /** Predicted probability sigmoid(margin). */
    def probCol: Column = lit(1.0) / (lit(1.0) + exp(-marginCol))
  }

  /** Train logistic regression by `iters` rounds of full-batch gradient
    * descent from w = 0: w ← round(w − lr·∇/n). `labelCol` must be 0/1
    * (castable to double); feature columns should be roughly unit-scaled by
    * construction (no internal standardization — keep the feature map
    * oracle-replicable).
    */
  def logRegGD(df: DataFrame, labelCol: String, featureCols: Seq[String],
               iters: Int = 3, lr: Double = 0.5, roundDp: Int = 9): LogRegModel = {
    require(iters >= 1 && featureCols.nonEmpty)
    val data = df.select(
        col(labelCol).cast("double").as("_y") +: featureCols.map(f => col(f).cast("double").as(f)): _*)
      .localCheckpoint()
    val n = data.count()
    require(n > 0, "cannot train on an empty table")
    var w = Array.fill(featureCols.length + 1)(0.0)
    for (_ <- 1 to iters) {
      val model = LogRegModel(featureCols, w(0), w.tail.toSeq, n)
      val err = model.probCol - col("_y")
      val gradAggs = (lit(1.0) +: featureCols.map(col)).zipWithIndex.map {
        case (x, i) => sum(err * x).as(s"_g$i")
      }
      // the update runs through Spark's round so the oracle's round() replays
      // the exact binary64 the next iteration's literals carry
      val updated = data.agg(gradAggs.head, gradAggs.tail: _*)
        .select(w.indices.map(i =>
          round(lit(w(i)) - lit(lr) * col(s"_g$i") / lit(n.toDouble), roundDp).as(s"_w$i")): _*)
        .head()
      w = w.indices.map(updated.getDouble).toArray
    }
    LogRegModel(featureCols, w(0), w.tail.toSeq, n)
  }

  /** Training accuracy of a model against its 0/1 label column: the margin's
    * sign is the prediction (no exp at the decision boundary — the linear
    * term is deterministic arithmetic on rounded weights).
    */
  def accuracy(df: DataFrame, labelCol: String, model: LogRegModel): Double =
    df.agg(round(avg(
        when((model.marginCol >= 0) === (col(labelCol).cast("double") === 1.0), 1.0)
          .otherwise(0.0)), 6).as("acc"))
      .head().getDouble(0)

  /** Deterministic Lloyd k-means over an embedding column — the
    * bit-reproducible alternative to [[Ann.buildIvf]]'s MLlib trainer for when
    * two builds of the same collection must produce byte-identical quantizers
    * (incremental-update parity), and the trained-centroid complement to the
    * fixed-centroid assignment the `cluster_assign` query gates.
    *
    * Determinism contract (the [[Graphs.pageRank]] / [[logRegGD]] recipe):
    * initial centroids are given explicitly (e.g. k corpus vectors); each
    * round assigns points by ROUND(squared-L2, 6) with ties to the lowest
    * cluster id — the 6dp round absorbs summation-order ulp so the argmin is
    * engine- and partitioning-invariant — and recomputes each centroid
    * component as ROUND(avg, 9); a cluster that captures no points keeps its
    * previous centroid (the standard empty-cluster rule, made explicit so the
    * oracle can replay it).
    *
    * Scale shape per round: the points explode to (id, dim, val) ONCE
    * (checkpointed), the k·d centroid table broadcasts into the distance join,
    * per-point distances aggregate on (id, cid) — n·k narrow rows — and means
    * aggregate on (cid, dim) — k·d rows. Nothing corpus-sized funnels through
    * the driver; train on a sample for a coarse quantizer, exactly as
    * [[Ann.buildIvf]] does.
    *
    * Returns the centroid table (cid, dim, cval), k·d rows.
    */
  def kMeansLloyd(vectors: DataFrame, idCol: String, vecCol: String,
                  initCentroids: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val pts = vectors.select(col(idCol).as("_id"),
        posexplode(col(vecCol)).as(Seq("dim", "val")))
      .withColumn("val", col("val").cast("double")) // float→double is exact
      .localCheckpoint()
    var cent = initCentroids.select(col("cid"), col("dim"),
        col("cval").cast("double").as("cval"))
      .localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_id").orderBy(col("dist"), col("cid"))
    for (_ <- 1 to iters) {
      val dists = pts.join(broadcast(cent), "dim")
        .groupBy("_id", "cid")
        .agg(round(sum((col("val") - col("cval")) * (col("val") - col("cval"))), 6)
          .as("dist"))
      val assigned = dists.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("_id", "cid")
      val means = pts.join(assigned, "_id")
        .groupBy("cid", "dim").agg(avg("val").as("m"))
      cent = cent.join(means, Seq("cid", "dim"), "left")
        .select(col("cid"), col("dim"),
          round(coalesce(col("m"), col("cval")), 9).as("cval"))
        .localCheckpoint() // k·d rows; also what makes each round's state final
    }
    cent
  }
}
