package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping — the
  * layout tool that makes "filter on EITHER of two columns" prune row groups
  * at 100 TB. Interleaving the bits of two keys gives a 1-D sort order whose
  * prefix ranges are 2-D tiles: `repartitionByRange` + `sortWithinPartitions`
  * on the Morton key write Parquet files whose min/max spans cover a small
  * tile of (x, y) space, so predicate pushdown on either dimension skips most
  * files — the same layout trick Delta Lake's OPTIMIZE ZORDER BY applies
  * (public behavior; implementation here is independent).
  *
  * Everything is a pure per-row bit expression (codegen'd, no UDF, no
  * shuffle) except the final range repartition — one sampled exchange, the
  * unavoidable cost of any clustered rewrite.
  *
  * The bit-interleave expression and the oracle SQL are generated from the
  * SAME Scala loop ([[interleaveBitOps]]), so the `zorder_key` query
  * hash-gates the exact key, not just its shape.
  */
object ZOrder {

  /** (shift of x-bit i → position 2i, shift of y-bit i → position 2i+1). */
  private def interleaveBitOps(bits: Int): Seq[(Int, Long)] =
    (0 until bits).map(i => (i, 1L << i))

  /** Morton key: interleave the low `bits` bits of two non-negative integral
    * columns — x on even bit positions, y on odd. Callers quantize wider
    * domains first (e.g. `% (1 << bits)` or rank-bucketing).
    */
  def mortonKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    interleaveBitOps(bits).foldLeft(lit(0L)) { case (acc, (i, mask)) =>
      acc
        .bitwiseOR(shiftleft(x.cast("long").bitwiseAND(lit(mask)), i))
        .bitwiseOR(shiftleft(y.cast("long").bitwiseAND(lit(mask)), i + 1))
    }
  }

  /** DuckDB replica of [[mortonKey]], generated from the same bit loop. */
  def mortonSql(x: String, y: String, bits: Int = 16): String =
    interleaveBitOps(bits).map { case (i, mask) =>
      s"((($x) & $mask) << $i) | ((($y) & $mask) << ${i + 1})"
    }.mkString(" | ")

  /** Rewrite `df` clustered by the Morton key of (xCol % 2^bits,
    * yCol % 2^bits): range-partition into `numFiles` output tasks and sort
    * within each, so every output file covers one contiguous Morton range —
    * a small 2-D tile. Write the result with partition-preserving
    * `.write.parquet` to get per-file min/max tiles.
    */
  def clusterByMorton(df: DataFrame, xCol: String, yCol: String,
                      numFiles: Int, bits: Int = 16): DataFrame = {
    val masked = lit((1L << bits) - 1)
    val keyed = df.withColumn("_zkey",
      mortonKey(col(xCol).cast("long").bitwiseAND(masked),
                col(yCol).cast("long").bitwiseAND(masked), bits))
    keyed
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
  }
}
