package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

/** Principal-component extraction over embedding columns — the
  * whitening / rotation building block in front of quantization (OPQ: Ge et
  * al., "Optimized Product Quantization", CVPR 2013 rotates by exactly these
  * eigenvectors) and the embedding-drift diagnostic of a curation pipeline.
  *
  * Scale shape: the covariance pass is ONE typed aggregation whose buffer is
  * a fixed `1 + d + d(d+1)/2` doubles (n, per-dim sums, upper-triangle
  * second moments) — each partition folds its vectors locally and only the
  * ~33 KB buffers (d = 64) cross the wire, the [[Sketches.KmvAggregator]]
  * posture applied to a dense moment matrix. No d²-row explode, no shuffle
  * of vector data. The d×d matrix and the d-vector iterate are MODEL-sized
  * state, so driver arithmetic on them is legitimate (the
  * [[Training.logRegGD]] rule); the power-iteration update itself runs as
  * tiny DataFrame ops so every round's normalization goes through Spark's
  * `round` — the [[Graphs.pageRank]] bit-reproducibility contract, which is
  * what lets a DuckDB oracle replay covariance → 3 iterations → Rayleigh
  * quotient exactly.
  */
object Pca {

  /** Accumulates (n, Σx_i, Σx_i·x_j upper triangle) in one fixed-size buffer. */
  class CovarianceAggregator(dim: Int)
      extends Aggregator[Seq[Float], Array[Double], Array[Double]] {
    private val triLen = dim * (dim + 1) / 2

    override def zero: Array[Double] = new Array[Double](1 + dim + triLen)

    override def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = {
      require(v != null && v.length == dim, s"expected dim-$dim vector")
      b(0) += 1
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) { x(i) = v(i).toDouble; b(1 + i) += x(i); i += 1 }
      var idx = 1 + dim
      i = 0
      while (i < dim) {
        var j = i
        while (j < dim) { b(idx) += x(i) * x(j); idx += 1; j += 1 }
        i += 1
      }
      b
    }

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(r: Array[Double]): Array[Double] = r
    override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  /** Index of (i, j), i ≤ j, in the flattened upper triangle. */
  private def triIdx(dim: Int, i: Int, j: Int): Int =
    i * (2 * dim - i + 1) / 2 + (j - i)

  /** Mean-centered covariance matrix as (i, j, cov) rows, cov = E[xy] − E[x]E[y]
    * rounded to 9dp THROUGH SPARK'S round (oracle-parity — sum-order ulp drift
    * is absorbed here, like every iterative operator in this engine).
    */
  def covariance(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    val aggCol = udaf(new CovarianceAggregator(dim))
    val buf = df.select(aggCol(col(vecCol).cast("array<float>")).as("b"))
      .head().getSeq[Double](0)
    val n = buf(0)
    require(n > 0, "cannot compute covariance of an empty table")
    val rows = for { i <- 0 until dim; j <- 0 until dim } yield {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      val sxy = buf(1 + dim + triIdx(dim, a, b))
      val raw = sxy / n - (buf(1 + i) / n) * (buf(1 + j) / n)
      Row(i, j, raw)
    }
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("c", DoubleType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
      .select(col("i"), col("j"), round(col("c"), 9).as("c"))
  }

  /** Dominant eigenvector by `iters` power-iteration rounds from the uniform
    * unit start 1/√dim: v ← round(C·v / ‖C·v‖, 9). Returns (i, loading).
    */
  def topComponent(cov: DataFrame, dim: Int, iters: Int = 3): DataFrame = {
    require(iters >= 1)
    val spark = cov.sparkSession
    var v = spark.range(dim)
      .select(col("id").cast("int").as("i"), lit(1.0 / math.sqrt(dim.toDouble)).as("v"))
    for (_ <- 1 to iters) {
      val w = cov.as("c").join(v.as("x"), col("c.j") === col("x.i"))
        .groupBy(col("c.i").as("i")).agg(sum(col("c.c") * col("x.v")).as("w"))
      val nrm = w.agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      v = w.crossJoin(broadcast(nrm))
        .select(col("i"), round(col("w") / col("nrm"), 9).as("v"))
    }
    v.select(col("i"), col("v").as("loading"))
  }

  /** Rayleigh quotient vᵀCv of a unit vector — the eigenvalue estimate
    * matching [[topComponent]]'s iterate. One row, `eigenvalue` rounded 6dp.
    */
  def rayleigh(cov: DataFrame, loadings: DataFrame): DataFrame =
    cov.as("c")
      .join(loadings.as("a"), col("c.i") === col("a.i"))
      .join(loadings.as("b"), col("c.j") === col("b.i"))
      .agg(round(sum(col("a.loading") * col("c.c") * col("b.loading")), 6)
        .as("eigenvalue"))
}
