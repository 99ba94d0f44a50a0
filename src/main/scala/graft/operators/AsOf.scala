package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** As-of join: each left row picks the most recent right row (per key) with
  * right-ts <= left-ts — the time-series lookup Spark has no built-in operator
  * for (and one of the classic "engine X has it" operators; DuckDB ships it as
  * ASOF JOIN, which is exactly what the oracle uses).
  *
  * Implementation is compose-first and scale-correct: both sides union into one
  * stream tagged by side, ONE shuffle partitions by key, and a running
  * `last(_, ignoreNulls)` over (ts, side) order carries the latest right row —
  * timestamp and payload together in one struct, so the match is atomic even
  * when payload values are null — forward into each left row. No
  * range-condition join (which Spark plans as a cartesian-per-key), no per-key
  * collect; cost is one exchange + one sort, identical to any windowed
  * aggregation.
  *
  * Right-side rows must be unique per (key, ts) for a deterministic result —
  * pre-aggregate the right side if they aren't (the boundary "most recent" row
  * would otherwise be ambiguous, in any engine).
  */
object AsOf {

  /** Keys whose combined row count exceeds `cap` — the degenerate-input hazard
    * of ANY keyed as-of: the window sort concentrates each key in one task, so
    * one hot key (e.g. a null-ish default id) serializes that task at scale.
    * Run as a pre-flight on big inputs; mitigation is pre-aggregating the right
    * side or splitting the hot key upstream (see SCALE.md §temporal-joins).
    */
  def hotKeys(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              cap: Long): DataFrame =
    left.select(keyCols.map(col): _*).unionByName(right.select(keyCols.map(col): _*))
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("rowsPerKey"))
      .filter(col("rowsPerKey") > cap)
      .orderBy(col("rowsPerKey").desc)

  /** @param rightPayload right columns to carry (must not collide with left names)
    * @param toleranceSeconds match only if left-ts − right-ts <= tolerance
    * @param maxRowsPerKey opt-in sanity cap: when set, counts rows per key
    *   (one cheap aggregate job over the key columns only) and WARNs with the
    *   hottest offenders before running the join — the join itself proceeds,
    *   degraded not broken, matching the skew guard's advisory role
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String,
      rightPayload: Seq[String],
      toleranceSeconds: Option[Long] = None,
      maxRowsPerKey: Option[Long] = None): DataFrame = {
    maxRowsPerKey.foreach { cap =>
      val hot = hotKeys(left, right, keyCols, cap).limit(5).collect()
      if (hot.nonEmpty)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"asOfJoin: ${hot.length}+ key(s) exceed maxRowsPerKey=$cap — " +
            s"hottest: ${hot.mkString(", ")}; one window task per key will " +
            "serialize these (pre-aggregate the right side or split the key)")
    }
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"rightPayload collides with left columns: $collisions")

    val leftStruct = StructType(left.schema.fields)
    val matchStruct = StructType(
      StructField("_mts", right.schema(rightTsCol).dataType) +:
        rightPayload.map(c => right.schema(c).copy()))

    val lPart = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("_ts"), lit(1).as("_side"),
        struct(left.columns.map(col): _*).as("_lrow"),
        lit(null).cast(matchStruct).as("_r")): _*)
    val rPart = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTsCol).as("_ts"), lit(0).as("_side"),
        lit(null).cast(leftStruct).as("_lrow"),
        struct(col(rightTsCol).as("_mts") +: rightPayload.map(col): _*).as("_r")): _*)

    // Right rows sort before left rows at equal ts, so the match is inclusive
    // (right-ts == left-ts matches), like DuckDB's ASOF `>=`.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lPart.unionByName(rPart)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))

    val matched = toleranceSeconds match {
      case Some(tol) =>
        col("_m").isNotNull &&
          (col("_ts").cast(LongType) - col("_m._mts").cast(LongType)) <= tol
      case None => col("_m").isNotNull
    }
    carried
      .filter(col("_side") === 1)
      .select(left.columns.map(c => col(s"_lrow.$c")) ++
        rightPayload.map(c => when(matched, col(s"_m.$c")).otherwise(lit(null)).as(c)): _*)
  }
}
