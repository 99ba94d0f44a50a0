package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class AsOfSpec extends AnyFunSuite with SparkSuite {

  private def t(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  private def fixture = {
    import spark.implicits._
    val quotes = Seq( // key, ts, px
      (1L, t(0), 10.0), (1L, t(10), 11.0), (1L, t(30), 12.0),
      (2L, t(5), 20.0)).toDF("k", "ts", "px")
    val trades = Seq( // key, ts, qty
      (1L, t(0), 100L),  // boundary: equal ts matches inclusively
      (1L, t(15), 200L), // between quotes -> 10:10 quote
      (1L, t(45), 300L), // after last -> 10:30 quote
      (2L, t(0), 400L),  // before any quote -> no match
      (3L, t(1), 500L))  // key with no quotes -> no match
      .toDF("k", "ts", "qty")
    (trades, quotes)
  }

  test("as-of join picks most recent right row at or before each left row") {
    val (trades, quotes) = fixture
    val got = AsOf.asOfJoin(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
      .select("k", "qty", "px").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(got((1L, 100L)) === Some(10.0)) // inclusive boundary
    assert(got((1L, 200L)) === Some(11.0))
    assert(got((1L, 300L)) === Some(12.0))
    assert(got((2L, 400L)) === None)       // right side later than left
    assert(got((3L, 500L)) === None)       // no right rows for key
  }

  test("tolerance nulls out matches older than the window") {
    val (trades, quotes) = fixture
    val got = AsOf.asOfJoin(trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
        toleranceSeconds = Some(600))
      .select("k", "qty", "px").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(got((1L, 200L)) === Some(11.0)) // 5 min back: within tolerance
    assert(got((1L, 300L)) === None)       // 15 min back: outside
  }

  test("payload name collision with the left side fails loudly") {
    val (trades, quotes) = fixture
    intercept[IllegalArgumentException](
      AsOf.asOfJoin(trades, quotes.withColumnRenamed("px", "qty"),
        Seq("k"), "ts", "ts", Seq("qty")))
  }

  test("hot-key guard flags the planted key; the join still runs correct") {
    val (trades, quotes) = fixture
    // key 1 has 3 quotes + 3 trades = 6 rows; every other key has <= 2
    val hot = AsOf.hotKeys(trades, quotes, Seq("k"), cap = 5).collect()
    assert(hot.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 6L)))
    assert(AsOf.hotKeys(trades, quotes, Seq("k"), cap = 100).collect().isEmpty)

    // Advisory, not fatal: results with the guard on match the unguarded run.
    val guarded = AsOf.asOfJoin(trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
        maxRowsPerKey = Some(1))
      .select("k", "qty", "px").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(guarded((1L, 300L)) === Some(12.0))
    assert(guarded((3L, 500L)) === None)
  }
}
