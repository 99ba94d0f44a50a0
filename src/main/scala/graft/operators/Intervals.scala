package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed timelines: merge overlapping intervals into
  * maximal islands, and densify a sparse per-key daily series with
  * last-observation-carried-forward fill.
  *
  * Both operators are single-exchange by construction: every window and the
  * follow-up aggregation key on the same partition columns, so Spark plans ONE
  * hash exchange and reuses its clustering for the window sort and the island
  * group-by (HashPartitioning on a prefix of the grouping keys satisfies the
  * aggregation's ClusteredDistribution — no second shuffle appears).
  */
object Intervals {

  /** Merge overlapping or touching [startCol, endCol] intervals per key — the
    * classic scan-line: an interval starts a new island iff its start exceeds
    * the running max end of every earlier interval (window `max` over rows
    * unbounded-preceding..1-preceding); the island id is the running sum of
    * those flags. State per key is one cumulative max — no self-join, no
    * per-key collect; cost is one exchange + one in-partition sort, identical
    * to any keyed window, so a 100 TB timeline merges in a single pass.
    *
    * Intervals that merely touch (next.start == current max end) merge — the
    * half-open-vs-closed boundary choice is the caller's to encode in endCol.
    */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String],
                     startCol: String, endCol: String): DataFrame = {
    val order = Seq(col(startCol).asc, col(endCol).asc)
    val prior = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = df
      .withColumn("_prev_max_end", max(col(endCol)).over(prior))
      .withColumn("_new_island",
        when(col("_prev_max_end").isNull ||
          col(startCol) > col("_prev_max_end"), 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new_island")).over(upTo))
    flagged.groupBy((keyCols :+ "_island").map(col): _*)
      .agg(min(col(startCol)).as("island_start"),
           max(col(endCol)).as("island_end"),
           count(lit(1)).as("n_intervals"))
      .drop("_island")
  }

  /** Densify a (key, day, value) daily series: fill every missing day between
    * each key's first and last observation, carrying the last seen value
    * forward (LOCF). The day grid comes from `sequence(min, max)` exploded per
    * key — rows-out is bounded by keys × span-days (metadata-sized next to the
    * raw input that produced the daily table), and the fill is one
    * `last(_, ignoreNulls)` window on the same key partitioning, so the whole
    * densify rides the single exchange the per-key min/max already paid.
    *
    * The first grid day per key always holds an observation (the span starts
    * at the key's min day), so the filled value is never null.
    */
  def gapFillDaily(daily: DataFrame, keyCols: Seq[String],
                   dayCol: String, valueCol: String): DataFrame = {
    val grid = daily
      .groupBy(keyCols.map(col): _*)
      .agg(min(col(dayCol)).as("_d0"), max(col(dayCol)).as("_d1"))
      .select(keyCols.map(col) :+
        explode(sequence(col("_d0"), col("_d1"))).as(dayCol): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, keyCols :+ dayCol, "left")
      .withColumn("_filled_value", last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("is_filled", col(valueCol).isNull.cast("long"))
      .drop(valueCol)
      .withColumnRenamed("_filled_value", valueCol)
  }
}
