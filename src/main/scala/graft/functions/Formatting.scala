package graft.functions

import org.apache.spark.sql.DataFrame

/** Output formatting (F13 — /root/reference/main/utils/formatting.py:5-15:
  * json / json_with_indent / toon). Driver-side serialization of (small, already
  * top-k-limited) result sets.
  */
object Formatting {

  /** Compact JSON array of row objects (Spark's own JSON encoder per row). */
  def json(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  /** Indented JSON: one row object per line, 2-space block indent. */
  def jsonIndent(df: DataFrame): String =
    df.toJSON.collect().mkString("[\n  ", ",\n  ", "\n]")

  /** TOON (token-oriented object notation), uniform-table subset: a header with
    * row count + field names, then one comma-joined line per row — the shape the
    * reference's `toon` formatter emits for result lists.
    */
  def toon(df: DataFrame, label: String = "rows"): String = {
    val cols = df.columns
    val rows = df.collect()
    val header = s"$label[${rows.length}]{${cols.mkString(",")}}:"
    val lines = rows.map(r =>
      "  " + cols.indices.map { i =>
        val v = r.get(i)
        val s = if (v == null) "" else v.toString
        if (s.contains(",") || s.contains("\n")) "\"" + s.replace("\"", "\"\"") + "\"" else s
      }.mkString(","))
    (header +: lines).mkString("\n")
  }
}
