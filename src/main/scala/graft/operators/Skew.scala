package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers for hot keys.
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin) already re-plans skewed
  * sort-merge joins at runtime; these helpers cover the cases AQE doesn't:
  * aggregations over power-law keys, and joins where one hot key floods a single
  * reducer before AQE can split it. Salts derive deterministically from row
  * content (xxhash64), never rand() — results stay reproducible.
  */
object Skew {

  /** Two-phase aggregation: partial-aggregate on (key, salt), then finalize on
    * key. sum/count/min/max re-aggregate losslessly; avg decomposes into
    * sum+count. The hot key spreads over `numSalts` reducers in phase one, and
    * phase two touches only numKeys × numSalts pre-aggregated rows.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      aggs: Map[String, String], // column -> sum | count | min | max
      numSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(saltSource), lit(numSalts)))
    val partialAggs = aggs.map { case (c, f) =>
      (f match {
        case "sum"   => sum(col(c))
        case "count" => count(col(c))
        case "min"   => min(col(c))
        case "max"   => max(col(c))
        case other   => throw new IllegalArgumentException(s"agg $other")
      }).as(s"_p_$c")
    }.toSeq
    val partial = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = aggs.map { case (c, f) =>
      (f match {
        case "sum" | "count" => sum(col(s"_p_$c")) // counts re-sum
        case "min"           => min(col(s"_p_$c"))
        case "max"           => max(col(s"_p_$c"))
      }).as(s"${f}_$c")
    }.toSeq
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a skewed big side against a small-but-unbroadcastable
    * side: the big side salts deterministically from `saltSource`; the small side
    * replicates once per salt (explode over 0..n-1), so each (key, salt) pair
    * lands on its own reducer.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, numSalts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(xxhash64(saltSource), lit(numSalts)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(numSalts - 1L))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
