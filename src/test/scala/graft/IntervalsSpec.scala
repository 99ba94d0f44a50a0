package graft

import graft.operators.Intervals
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntervalsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("mergeIntervals: overlap and touch merge, gaps split, counts add up") {
    // key 1: [0,10] [5,12] (overlap) [12,20] (touch) → one island [0,20]×3
    //        [25,30] → second island
    // key 2: single interval stays itself
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 12L), (1L, 12L, 20L), (1L, 25L, 30L),
      (2L, 100L, 110L)).toDF("k", "s", "e")
    val got = Intervals.mergeIntervals(iv, Seq("k"), "s", "e")
      .orderBy("k", "island_start")
      .select("k", "island_start", "island_end", "n_intervals")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L, 20L, 3L), (1L, 25L, 30L, 1L), (2L, 100L, 110L, 1L)))
  }

  test("mergeIntervals: an interval nested inside an earlier one cannot split the island") {
    // [0,100] then [10,20] then [30,40]: naive prev-end comparison (instead of
    // running MAX end) would see 30 > 20 and wrongly open a new island
    val iv = Seq((1L, 0L, 100L), (1L, 10L, 20L), (1L, 30L, 40L)).toDF("k", "s", "e")
    val got = Intervals.mergeIntervals(iv, Seq("k"), "s", "e")
      .select("island_start", "island_end", "n_intervals")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 100L, 3L)))
  }

  test("gapFillDaily: missing days fill with the last seen value, flagged") {
    val daily = Seq(
      (1L, 10L, 1.0), (1L, 13L, 4.0), // gap at 11, 12
      (2L, 5L, 9.0)).toDF("k", "day", "v")
    val got = Intervals.gapFillDaily(daily, Seq("k"), "day", "v")
      .orderBy("k", "day")
      .select("k", "day", "v", "is_filled")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 10L, 1.0, 0L), (1L, 11L, 1.0, 1L), (1L, 12L, 1.0, 1L),
      (1L, 13L, 4.0, 0L), (2L, 5L, 9.0, 0L)))
  }

  test("gapFillDaily: dense series passes through unchanged") {
    val daily = Seq((1L, 1L, 2.0), (1L, 2L, 3.0)).toDF("k", "day", "v")
    val got = Intervals.gapFillDaily(daily, Seq("k"), "day", "v")
    assert(got.filter(col("is_filled") === 1L).count() === 0L)
    assert(got.count() === 2L)
  }
}
