package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for vector search — the third compression
  * point on the accuracy/memory curve next to the flat scan (exact,
  * 4 bytes/dim) and PQ-ADC (lossiest, sub-byte/dim): one uint8 code per
  * dimension, 4× smaller than float32, distances computed on midpoint
  * dequantization. FAISS calls this IndexScalarQuantizer(QT_8bit).
  *
  * Fit is one pass (per-dimension min/max — exact aggregates, no float
  * accumulation), encode is one embarrassingly-parallel projection, and the
  * model is 2×dim floats that ride into every executor as plan literals —
  * nothing to broadcast-join, nothing to shuffle. At 100 TB the win is the
  * scan itself: a quantized corpus reads 4× fewer bytes at ~equal recall for
  * well-spread data, and the exact re-rank (IndexRefineFlat pattern, same as
  * [[Pq.adcRerankTopK]]) restores true order on the shortlist.
  *
  * All arithmetic is double on both engines (fit maxes/mins are exact float
  * values; step/dequant/distance in double, summed in index order) so the
  * whole pipeline hash-gates against a DuckDB replay.
  */
object Sq {

  /** Per-dimension quantization bounds; `step` derives as (max-min)/256. */
  final case class SqModel(minv: Array[Float], maxv: Array[Float]) {
    def dim: Int = minv.length
    def step(i: Int): Double = (maxv(i).toDouble - minv(i).toDouble) / 256.0
  }

  /** One exact aggregation pass: per-dimension min/max over the corpus. */
  def fit(emb: DataFrame, vecCol: String): SqModel = {
    val rows = emb.select(posexplode(col(vecCol)).as(Seq("d", "v")))
      .groupBy("d").agg(min("v").as("mn"), max("v").as("mx"))
      .orderBy("d").collect()
    SqModel(rows.map(_.getFloat(1)), rows.map(_.getFloat(2)))
  }

  private def litArr(xs: Seq[Double]): Column = array(xs.map(lit): _*)

  /** uint8 codes (as array<int>): floor((v-min)/step), clamped to 255 so
    * v = max lands in the top cell; a constant dimension codes to 0.
    */
  def encode(emb: DataFrame, idCol: String, vecCol: String, model: SqModel): DataFrame = {
    val d = model.dim
    emb
      .withColumn("_mn", litArr(model.minv.map(_.toDouble)))
      .withColumn("_st", litArr((0 until d).map(model.step)))
      .select(col(idCol), expr(
        s"""transform(sequence(1, $d), i ->
           |  IF(element_at(_st, i) = 0D, 0,
           |    CAST(least(255D, floor((CAST(element_at($vecCol, i) AS DOUBLE)
           |                            - element_at(_mn, i)) / element_at(_st, i)))
           |         AS INT)))""".stripMargin).as("code"))
  }

  /** Top-k by L2 on the DEQUANTIZED codes (midpoint rule:
    * v̂ = min + (code+0.5)·step), summed in dimension order; ties break on
    * id. The scan touches only the 1-byte codes.
    */
  def searchTopK(codes: DataFrame, idCol: String, codeCol: String,
                 model: SqModel, query: Array[Float], k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val d = model.dim
    codes
      .withColumn("_mn", litArr(model.minv.map(_.toDouble)))
      .withColumn("_st", litArr((0 until d).map(model.step)))
      .withColumn("_q", litArr(query.map(_.toDouble)))
      // squared diffs via multiplication, not pow(x, 2): pow is only
      // 1-ulp-accurate and need not bit-match the oracle's arithmetic
      .withColumn("_vh", expr(
        s"""transform(sequence(1, $d), i -> element_at(_mn, i)
           |  + (CAST(element_at($codeCol, i) AS DOUBLE) + 0.5D) * element_at(_st, i))""".stripMargin))
      .withColumn("dist", expr(
        s"""aggregate(sequence(1, $d), 0D, (acc, i) -> acc +
           |  (element_at(_vh, i) - element_at(_q, i))
           |  * (element_at(_vh, i) - element_at(_q, i)))""".stripMargin))
      .select(col(idCol), col("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** Quantized shortlist → exact L2 re-rank over the full-precision vectors
    * (an IN-list point lookup, pushed to the scan) — true top-k at SQ8 scan
    * cost plus `shortlist` exact distances.
    */
  def rerankTopK(codes: DataFrame, corpus: DataFrame, idCol: String,
                 codeCol: String, vecCol: String, model: SqModel,
                 query: Array[Float], k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val ids = searchTopK(codes, idCol, codeCol, model, query, shortlist)
      .select(col(idCol)).collect().map(_.get(0))
    val qd = litArr(query.map(_.toDouble))
    corpus.where(col(idCol).isin(ids: _*))
      .withColumn("_q", qd)
      .withColumn("dist", expr(
        s"""aggregate(sequence(1, ${model.dim}), 0D, (acc, i) -> acc +
           |  (CAST(element_at($vecCol, i) AS DOUBLE) - element_at(_q, i))
           |  * (CAST(element_at($vecCol, i) AS DOUBLE) - element_at(_q, i)))""".stripMargin))
      .select(col(idCol), col("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }
}
