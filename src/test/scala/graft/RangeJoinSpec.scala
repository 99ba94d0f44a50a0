package graft

import graft.operators.RangeJoin
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class RangeJoinSpec extends AnyFunSuite with SparkSuite {

  private def t(m: Int, s: Int = 0) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:$s%02d")

  test("point-in-interval matches across bin boundaries, inclusive bounds") {
    import spark.implicits._
    val points = Seq(
      (1L, 101L, t(0)),       // == interval start (inclusive)
      (1L, 102L, t(9, 59)),   // inside, same bin as start
      (1L, 103L, t(10)),      // == interval end (inclusive), NEXT 10-min bin
      (1L, 104L, t(10, 1)),   // just outside
      (2L, 201L, t(5)))       // other key: its own interval only
      .toDF("k", "pid", "pts")
    val intervals = Seq(
      (1L, 11L, t(0), t(10)),   // spans two 600s bins
      (2L, 21L, t(4), t(6)),
      (1L, 12L, t(9), t(11)))   // overlapping second interval for k=1
      .toDF("k", "iid", "s", "e")

    val got = RangeJoin.pointInInterval(points, "pts", intervals, "s", "e",
        Seq("k"), binSeconds = 600L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set(
      (101L, 11L), (102L, 11L), (103L, 11L), // incl. the cross-bin boundary match
      (102L, 12L), (103L, 12L), (104L, 12L),
      (201L, 21L)))
  }

  test("no duplicate pairs: each pair meets in exactly the point's bin") {
    import spark.implicits._
    val points = Seq((1L, 1L, t(30))).toDF("k", "pid", "pts")
    val intervals = Seq((1L, 9L, t(0), t(59))).toDF("k", "iid", "s", "e") // spans many bins
    val rows = RangeJoin.pointInInterval(points, "pts", intervals, "s", "e",
      Seq("k"), binSeconds = 600L).count()
    assert(rows === 1L)
  }

  test("fanoutStats flags the interval that would explode under small bins") {
    import spark.implicits._
    val intervals = Seq(
      (1L, t(0), t(9)),    // 1 bin at 600s
      (2L, t(0), t(119)))  // 12 bins at 600s — the offender
      .toDF("iid", "s", "e")
    val r = RangeJoin.fanoutStats(intervals, "s", "e", binSeconds = 600L).head()
    assert(r.getAs[Long]("n_intervals") === 2L)
    assert(r.getAs[Long]("max_fanout") === 12L)
    assert(r.getAs[Long]("total_exploded_rows") === 13L)
    // the mitigation: bigger bins collapse the fan-out
    val big = RangeJoin.fanoutStats(intervals, "s", "e", binSeconds = 7200L).head()
    assert(big.getAs[Long]("max_fanout") === 1L)
  }
}
