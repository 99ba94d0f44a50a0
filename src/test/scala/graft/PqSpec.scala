package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq

/** Product quantization: centroid self-encoding, the ADC ≡ l2²(query,
  * reconstruction) identity (the mathematical definition of asymmetric
  * distance), recall against exact search, and determinism.
  */
class PqSpec extends AnyFunSuite with SparkSuite {

  private val dim = 64
  private def corpus(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      val rnd = new scala.util.Random(i * 6151L)
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
  }

  private def queryV = {
    val rnd = new scala.util.Random(99991L)
    Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
  }

  test("a centroid-source vector encodes to its own code in every subspace") {
    val df = corpus(100)
    val model = Pq.fitFromIds(df, "vec_id", "embedding", numSub = 8, k = 16)
    val codes = Pq.encode(df.filter(col("vec_id") <= 16), "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    (1 to 16).foreach { id =>
      assert(codes(id.toLong).forall(_ == id - 1),
        s"vector $id should self-encode, got ${codes(id.toLong)}")
    }
  }

  test("ADC distance equals l2-squared to the reconstruction, exactly") {
    val df = corpus(200)
    val model = Pq.fitFromIds(df, "vec_id", "embedding", numSub = 8, k = 16)
    val q = queryV
    val got = Pq.adcTopK(
        Pq.encode(df, "vec_id", "embedding", model), "vec_id", "code", model, q, 200)
      .collect()
    val codes = Pq.encode(df, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    got.foreach { r =>
      val rec = model.reconstruct(codes(r.getLong(0)))
      val exact = q.zip(rec).map { case (a, b) =>
        val d = a.toDouble - b; d * d }.sum
      assert(math.abs(r.getAs[Double]("adc") - exact) < 1e-9,
        s"vec ${r.getLong(0)}: adc ${r.getAs[Double]("adc")} vs $exact")
    }
  }

  test("ADC recall@10 clears a floor against exact search") {
    val df = corpus(500)
    val model = Pq.fitFromIds(df, "vec_id", "embedding", numSub = 8, k = 16)
    val q = queryV
    val exact = graft.operators.Search.vectorTopK(df, "embedding", q, 10,
        metric = "l2", idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val adc = Pq.adcTopK(
        Pq.encode(df, "vec_id", "embedding", model), "vec_id", "code", model, q, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.count(adc.contains).toDouble / exact.size
    // 16 centroids/subspace on uniform random data is a coarse quantizer —
    // the identity test above carries exactness; this pins "sane, not broken"
    assert(recall >= 0.2, s"recall@10 $recall")
  }

  test("adcRerankTopK with shortlist = N reproduces exact search exactly") {
    val df = corpus(300)
    val model = Pq.fitFromIds(df, "vec_id", "embedding", numSub = 8, k = 16)
    val q = queryV
    val exact = graft.operators.Search.vectorTopK(df, "embedding", q, 10,
        metric = "l2", idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val rer = Pq.adcRerankTopK(
        Pq.encode(df, "vec_id", "embedding", model), df,
        "vec_id", "code", "embedding", model, q, k = 10, shortlist = 300)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(rer === exact,
      "a full-corpus shortlist re-ranked by exact L2 IS exact search")
  }

  test("adcRerankTopK recall >= plain ADC recall (the refinement property)") {
    val df = corpus(500)
    val model = Pq.fitFromIds(df, "vec_id", "embedding", numSub = 8, k = 16)
    val q = queryV
    val exact = graft.operators.Search.vectorTopK(df, "embedding", q, 10,
        metric = "l2", idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val codes = Pq.encode(df, "vec_id", "embedding", model)
    val adc = Pq.adcTopK(codes, "vec_id", "code", model, q, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val rer = Pq.adcRerankTopK(codes, df, "vec_id", "code", "embedding",
        model, q, k = 10, shortlist = 100)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recallAdc = exact.count(adc.contains)
    val recallRer = exact.count(rer.contains)
    assert(recallRer >= recallAdc,
      s"re-ranking a 10x shortlist must not lose recall: adc=$recallAdc rer=$recallRer")
    // every re-ranked hit that appears in the shortlist is ordered exactly, so
    // any exact-top-10 member the 100-deep shortlist caught must be returned
    val shortIds = Pq.adcTopK(codes, "vec_id", "code", model, q, 100)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(exact.filter(shortIds.contains).subsetOf(rer))
  }

  test("residualCol (DF column) and residualVec (driver) agree bit for bit") {
    import spark.implicits._
    val centroid = {
      val rnd = new scala.util.Random(31L)
      Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
    }
    val df = corpus(50)
    val got = df.select(col("vec_id"),
        Pq.residualCol(col("embedding"), centroid).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    corpus(50).collect().foreach { row =>
      val id = row.getLong(0)
      val v = row.getSeq[Float](1).toArray
      assert(got(id).sameElements(Pq.residualVec(v, centroid)),
        s"vec $id: engine and driver residuals must be identical floats")
    }
  }

  test("deterministic: two encode+search runs return identical rows") {
    val df = corpus(150)
    val model = Pq.fitFromIds(df, "vec_id", "embedding", numSub = 8, k = 16)
    def run() = Pq.adcTopK(
        Pq.encode(df, "vec_id", "embedding", model), "vec_id", "code", model, queryV, 20)
      .collect().map(r => (r.getLong(0), math.round(r.getAs[Double]("adc") * 1e9))).toSeq
    assert(run() === run())
  }
}
