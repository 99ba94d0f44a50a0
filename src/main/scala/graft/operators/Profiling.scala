package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the per-column completeness/cardinality report every
  * ingestion pipeline runs before trusting a new corpus drop (null rates
  * flag broken extractions, cardinality flags key collapse or duplication).
  *
  * ONE aggregation pass computes every column's facts together (Spark
  * expands the multi-distinct into grouped passes internally — still one
  * job, no per-column scans); the single result row reshapes on the driver
  * into the (column, stats) long form, bounded by the schema width. At
  * 100 TB this is exactly one corpus read; for cheaper refreshes swap the
  * exact distinct for [[Sketches.kmvDistinct]]/[[Sketches.hllDistinct]].
  */
object Profiling {

  /** (column, n_nonnull, n_null, n_distinct) per requested column, in the
    * requested order. `n_distinct` is exact and excludes NULL (SQL COUNT
    * DISTINCT semantics on both engines).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"_cnt_$c"), countDistinct(col(c)).as(s"_dst_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    cols.zipWithIndex.map { case (c, i) =>
      val nonNull = row.getLong(1 + 2 * i)
      (c, nonNull, n - nonNull, row.getLong(2 + 2 * i))
    }.toDF("column", "n_nonnull", "n_null", "n_distinct")
  }
}
