package graft.streaming

import graft.core.CollectionManager
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** Structured Streaming extensions (SURVEY §2.10 — the reference has only a
  * micro-batch-like incremental update: a stored watermark minus a 5-minute overlap
  * re-reads changed docs, /root/reference/main/factories/update_collection_factory
  * .py:47-65). Here the same merge becomes a continuous pipeline:
  *
  *  - [[collectionUpdateWriter]]: a changed-documents stream drives the
  *    CollectionManager merge per micro-batch (`foreachBatch`) — watermark
  *    bookkeeping comes free from the source offsets instead of a stored
  *    timestamp minus overlap buffer;
  *  - [[windowedEventCounts]]: tumbling-window aggregation with late-data
  *    watermark over an event stream — the streaming twin of the batch
  *    `st1_tumbling_window` query (same plan, readStream instead of read).
  */
object StreamingUpdate {

  /** Continuous incremental update: each micro-batch of changed documents
    * (id, url, metadata, text) merges into the collection via the same anti-join +
    * append + high-water-mark path as batch update — exactly-once per batch since
    * the merge is idempotent on document ids.
    */
  def collectionUpdateWriter(
      changedDocs: DataFrame,
      cm: CollectionManager,
      collectionName: String,
      checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    changedDocs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          if (cm.exists(collectionName)) cm.update(collectionName, batch)
          else cm.create(collectionName, batch)
        }
        ()
      }

  /** Tumbling-window event aggregation with a late-data watermark: the canonical
    * streaming agg (counts + sums per event_type per window). `withWatermark`
    * bounds state: windows older than the watermark finalize and evict.
    */
  def windowedEventCounts(
      events: DataFrame, // streaming DF: ts timestamp, event_type string, value double
      windowLength: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("event_type"), window(col("ts"), windowLength).as("w"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("event_type"), col("w.start").as("window_start"),
        col("cnt"), col("sum_value"))
}
