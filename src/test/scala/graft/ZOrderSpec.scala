package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Z-order clustering: the Morton key bit math against hand-interleaved
  * values, and the layout property that actually buys data skipping — after
  * a clustered write, each Parquet file's (x, y) min/max span covers a small
  * tile instead of the full domain.
  */
class ZOrderSpec extends AnyFunSuite with SparkSuite {

  test("mortonKey interleaves bits (x even positions, y odd)") {
    import spark.implicits._
    val df = Seq((5L, 3L), (0L, 0L), (7L, 0L), (0L, 7L))
      .toDF("x", "y")
      .select(ZOrder.mortonKey(col("x"), col("y"), bits = 3).as("z"))
    // x=0b101, y=0b011 → z bits (LSB up): x0=1,y0=1,x1=0,y1=1,x2=1,y2=0 = 27
    assert(df.as[Long].collect().toSeq === Seq(27L, 0L, 21L, 42L))
  }

  test("mortonSql mirrors mortonKey bit for bit") {
    import spark.implicits._
    // evaluate the generated SQL arithmetic with Spark's own SQL engine —
    // both engines use two's-complement BIGINT ops, so agreement here is
    // agreement with the DuckDB oracle text
    val sql = ZOrder.mortonSql("x", "y", 16)
    val df = Seq((513L, 80L), (65535L, 0L), (12345L, 54321L))
      .toDF("x", "y")
    val viaSql = df.selectExpr(s"$sql AS z").as[Long].collect().toSeq
    val viaCol = df.select(ZOrder.mortonKey(col("x"), col("y"), 16).as("z"))
      .as[Long].collect().toSeq
    assert(viaSql === viaCol)
  }

  test("clusterByMorton writes tile-local files (per-file spans shrink)") {
    import spark.implicits._
    // 64×64 uniform grid, shuffled order; cluster into 16 files
    val rnd = new scala.util.Random(42)
    val pts = rnd.shuffle((0 until 64).flatMap(x => (0 until 64).map(y => (x, y))))
      .toDF("x", "y").repartition(8)
    val dir = Files.createTempDirectory("zorder").toString
    ZOrder.clusterByMorton(pts, "x", "y", numFiles = 16, bits = 6)
      .write.mode("overwrite").parquet(dir)

    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .select("sx", "sy").as[(Int, Int)].collect()
    assert(spans.length === 16)
    val avgSpan = spans.map(t => (t._1 + t._2) / 2.0).sum / spans.length
    // unclustered files span ~63 on both axes; 16 Morton tiles of a 64×64
    // grid are 16×16 squares — allow slack for range-boundary straddling
    assert(avgSpan < 28.0, s"avg per-file span $avgSpan — not tile-local")
    assert(spans.map(_._1).max <= 40 && spans.map(_._2).max <= 40)
  }
}
