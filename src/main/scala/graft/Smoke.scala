package graft
import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: run SparkEntry.entry on sf0.001
  * and print the row count (driver checks rows > 0).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.configure(spark)
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    df.show(truncate = false)
    spark.stop()
  }
}
