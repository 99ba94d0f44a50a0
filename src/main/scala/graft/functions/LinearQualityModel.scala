package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** File-backed linear quality classifier — the fasttext/CCNet-style
  * model-based filtering slot of a curation pipeline (score each document,
  * keep above a threshold). The feature map φ is [[HashingEmbedder]]'s
  * hashed uni+bigram bag (same seed, same dim), so a model trained offline
  * against those features ships as a PLAIN TEXT weights file: line 1 = bias,
  * then one weight per line (dim inferred from line count).
  *
  * score(text) = sigmoid(bias + w · φ(text)) ∈ (0, 1).
  *
  * Like [[WordVectorEmbedder]], the identity embeds a content digest of the
  * artifact, so two different model files are never conflated. Scoring is a
  * per-row map over a broadcast-in-closure weights array — no shuffle, scan
  * cost only. Not SQL-expressible (murmur feature hashing), so it is
  * spec-gated rather than oracle-gated, like the embedder itself.
  */
final class LinearQualityModel private (
    val dim: Int,
    bias: Double,
    weights: Array[Float],
    digest: String,
    seed: Int) extends Serializable {

  def name: String = s"linear-quality-$dim-$seed-$digest"

  private val features = new HashingEmbedder(dim, seed)

  def score(text: String): Double = {
    val v = features.embed(text)
    var s = bias
    var i = 0
    while (i < dim) { s += weights(i).toDouble * v(i); i += 1 }
    1.0 / (1.0 + math.exp(-s))
  }

  /** Column form: adds nothing to the plan but a deterministic scalar UDF. */
  def scoreCol(textCol: Column): Column = {
    val self = this
    udf((t: String) => self.score(if (t == null) "" else t)).apply(textCol)
  }

  /** `df` plus a `model_quality` column. */
  def scoreDf(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("model_quality", scoreCol(col(textCol)))

  /** Keep rows scoring at or above `minScore`. */
  def filterByQuality(df: DataFrame, textCol: String, minScore: Double): DataFrame =
    scoreDf(df, textCol).filter(col("model_quality") >= minScore)

  /** Export as the plain-text artifact [[LinearQualityModel.fromFile]] reads —
    * the ship format for a model trained with [[LinearQualityModel.train]].
    */
  def save(path: String): Unit = {
    val sb = new StringBuilder
    sb.append("# linear quality model: line 1 = bias, then one weight per line\n")
    sb.append(bias).append('\n')
    weights.foreach(w => sb.append(w).append('\n'))
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }
}

object LinearQualityModel {

  /** Load a weights file: line 1 = bias, lines 2..n+1 = weights (dim = n).
    * Blank lines and `#` comments are skipped.
    */
  def fromFile(path: String, seed: Int = 42): LinearQualityModel = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val digest = MessageDigest.getInstance("SHA-256").digest(bytes)
      .take(6).map("%02x".format(_)).mkString
    val nums = new String(bytes, StandardCharsets.UTF_8).linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.toDouble).toArray
    require(nums.length >= 2, s"weights file $path needs a bias plus >=1 weight")
    new LinearQualityModel(nums.length - 1, nums.head,
      nums.tail.map(_.toFloat), digest, seed)
  }

  /** Build from in-memory weights (tests; exporting a trained model). */
  def fromWeights(bias: Double, weights: Array[Float], seed: Int = 42): LinearQualityModel =
    new LinearQualityModel(weights.length, bias, weights,
      f"mem${weights.length}%04d", seed)

  /** Train the classifier with MLlib logistic regression over the SAME hashed
    * uni+bigram features the scorer applies — closing the loop from "weights
    * file slot" to "trained in this engine": fit on a labeled sample
    * (distributed L-BFGS), [[LinearQualityModel#save]] the weights artifact,
    * ship it to the scoring pipeline via [[fromFile]] (which stamps the
    * content digest into the model identity).
    *
    * `labelCol` must be 0/1 (1 = keep-quality). Feature extraction is the
    * same per-row map scoring uses — no shuffle beyond MLlib's aggregation
    * rounds, whose state is O(dim) per partition, not corpus-sized.
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
            dim: Int = 1024, seed: Int = 42, maxIter: Int = 50,
            regParam: Double = 1e-4): LinearQualityModel = {
    val emb = new HashingEmbedder(dim, seed)
    val toVec = udf { t: String =>
      org.apache.spark.ml.linalg.Vectors.dense(
        emb.embed(if (t == null) "" else t).map(_.toDouble))
    }
    val data = df.select(toVec(col(textCol)).as("features"),
      col(labelCol).cast("double").as("label"))
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
    val m = lr.fit(data)
    new LinearQualityModel(dim, m.intercept,
      m.coefficients.toArray.map(_.toFloat), f"fit${dim}%04d", seed)
  }
}
