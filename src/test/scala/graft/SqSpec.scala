package graft

import graft.operators.Sq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SqSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def emb = Seq(
    (1L, Array(0.0f, 10.0f, 5.0f)),
    (2L, Array(1.0f, 10.0f, 7.0f)),
    (3L, Array(0.5f, 10.0f, 9.0f)),
    (4L, Array(0.25f, 10.0f, 5.5f))).toDF("vec_id", "embedding")

  test("fit + encode: bounds clamp, min cell 0, max cell 255, constant dim codes 0") {
    val m = Sq.fit(emb, "embedding")
    assert(m.minv.toSeq === Seq(0.0f, 10.0f, 5.0f))
    assert(m.maxv.toSeq === Seq(1.0f, 10.0f, 9.0f))
    val codes = Sq.encode(emb, "vec_id", "embedding", m)
      .orderBy("vec_id").collect().map(_.getSeq[Int](1).toSeq)
    assert(codes(0) === Seq(0, 0, 0))       // per-dim minima
    assert(codes(1) === Seq(255, 0, 128))   // maxima clamp to the top cell
    assert(codes(2) === Seq(128, 0, 255))
    assert(codes(3) === Seq(64, 0, 32))     // 0.5/4 of the range → cell 32
    assert(codes.flatten.forall(c => c >= 0 && c <= 255))
  }

  test("rerank with a full-corpus shortlist equals the exact flat top-k") {
    val m = Sq.fit(emb, "embedding")
    val codes = Sq.encode(emb, "vec_id", "embedding", m)
    val q = Array(0.4f, 10.0f, 6.0f)
    val reranked = Sq.rerankTopK(codes, emb, "vec_id", "code", "embedding",
        m, q, k = 4, shortlist = 4)
      .collect().map(_.getLong(0)).toSeq
    // exact L2: d1=(.16+1)=1.16, d2=(.36+1)=1.36, d3=(.01+9)=9.01, d4=(.0225+.25)
    assert(reranked === Seq(4L, 1L, 2L, 3L))
    // and the quantized order itself is close: top-1 agrees here
    val approx = Sq.searchTopK(codes, "vec_id", "code", m, q, 4)
      .collect().map(_.getLong(0)).toSeq
    assert(approx.head === 4L)
  }
}
