package graft

import graft.operators.Skew
import graft.sources.FilesSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkSuite {

  test("salted aggregation equals direct aggregation (hot key included)") {
    import spark.implicits._
    // one hot key covering 90% of rows
    val df = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count("v").as("count_v"), max("v").as("max_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Skew.saltedAgg(df, Seq("k"), col("v"),
      Map("v" -> "sum"), numSalts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted === direct.map(t => (t._1, t._2)))
    val saltedCnt = Skew.saltedAgg(df, Seq("k"), col("v"),
      Map("v" -> "count"), 8).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(saltedCnt === direct.map(t => (t._1, t._3)))
    val saltedMax = Skew.saltedAgg(df, Seq("k"), col("v"),
      Map("v" -> "max"), 8).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(saltedMax === direct.map(t => (t._1, t._4)))
  }

  test("salted join equals direct join") {
    import spark.implicits._
    val big = ((1 to 500).map(i => ("hot", i)) ++ Seq(("cold", 1), ("miss", 2)))
      .toDF("k", "v")
    val small = Seq(("hot", "H"), ("cold", "C"), ("other", "O")).toDF("k", "label")
    val direct = big.join(small, Seq("k")).select("k", "v", "label")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", col("v"), numSalts = 4)
      .select("k", "v", "label")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(salted === direct)
    assert(salted.count(_._1 == "hot") === 500)
  }

  test("parse quarantine splits bad rows with error messages") {
    import spark.implicits._
    val df = Seq(("f1", "ok text"), ("f2", "BOOM"), ("f3", "fine")).toDF("id", "text")
    val parsed = FilesSource.withParseStatus(df,
      s => if (s.contains("BOOM")) throw new RuntimeException("bad payload") else s.toUpperCase)
    val (good, bad) = FilesSource.quarantine(parsed)
    assert(good.select("id").collect().map(_.getString(0)).sorted === Array("f1", "f3"))
    assert(good.filter($"id" === "f1").head().getAs[String]("text") === "OK TEXT")
    val badRow = bad.head()
    assert(badRow.getAs[String]("id") === "f2")
    assert(badRow.getAs[String]("parseError") === "bad payload")
  }
}
