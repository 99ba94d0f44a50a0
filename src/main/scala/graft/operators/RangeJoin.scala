package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match each point row to every interval row of the
  * same key containing it. Spark has no native range-join operator — a plain
  * inequality join plans as a per-key nested loop — so this buckets time into
  * fixed bins: intervals explode to the bins they span (≤ len/bin + 1 rows),
  * points land in exactly one bin, and the match becomes an EQUI-join on
  * (key, bin) + an exact containment filter. Each (interval, point) pair meets
  * in exactly the point's bin, so no post-join dedup is needed.
  *
  * Cost: one equi-join shuffle on (key, bin); the fan-out factor is the mean
  * interval length / binSeconds. Pick binSeconds near the typical interval
  * length — larger bins cut interval replication but widen the per-bin
  * candidate set the filter prunes.
  */
object RangeJoin {

  /** Pre-flight fan-out report for a candidate `binSeconds`: per-interval bin
    * replication (len/bin + 1) summarized as (n_intervals, max_fanout,
    * mean_fanout, total_exploded_rows). The hazard this surfaces is the dual
    * of the as-of hot key: one open-ended or year-long interval against
    * hour bins explodes to ~9k rows — run this on big inputs, then either
    * raise binSeconds, cap interval length upstream, or split the offender.
    * One cheap aggregate over the two timestamp columns only.
    */
  def fanoutStats(intervals: DataFrame, startTs: String, endTs: String,
                  binSeconds: Long): DataFrame = {
    val fan = (floor(unix_timestamp(col(endTs)) / binSeconds) -
      floor(unix_timestamp(col(startTs)) / binSeconds) + 1)
    intervals.select(fan.as("_f"))
      .agg(count(lit(1)).as("n_intervals"), max("_f").as("max_fanout"),
        round(avg("_f"), 2).as("mean_fanout"),
        sum("_f").as("total_exploded_rows"))
  }

  /** @param points    DataFrame with `pointTs` (timestamp) + key + payload cols
    * @param intervals DataFrame with `startTs`/`endTs` (timestamps, inclusive
    *                  bounds) + key + payload cols (names must not collide with
    *                  points except the keys)
    */
  def pointInInterval(
      points: DataFrame, pointTs: String,
      intervals: DataFrame, startTs: String, endTs: String,
      keyCols: Seq[String], binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val collisions = intervals.columns.toSet
      .intersect(points.columns.toSet) -- keyCols
    require(collisions.isEmpty, s"column collision outside keys: $collisions")

    val p = points.withColumn("_bin",
      floor(unix_timestamp(col(pointTs)) / binSeconds))
    val iv = intervals.withColumn("_bin", explode(sequence(
      floor(unix_timestamp(col(startTs)) / binSeconds),
      floor(unix_timestamp(col(endTs)) / binSeconds))))

    p.join(iv, keyCols :+ "_bin")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("_bin")
  }
}
