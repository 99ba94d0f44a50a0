package graft.sources

import scala.annotation.tailrec
import scala.util.{Failure, Success, Try}

/** Driver-side REST pagination with retry and bad-item quarantine — the generic
  * batch-read loop of the reference (/root/reference/main/utils/batch.py:4-52 and
  * main/utils/retry.py:5-15), with the fetch function pluggable so connectors
  * (Jira offset pages, Jira Cloud nextPageToken, Confluence CQL cursor — S1–S4)
  * and tests share one engine without any HTTP dependency.
  *
  * Pagination is inherently sequential per source (each page's cursor comes from
  * the previous response), so this runs on the driver — exactly like the
  * reference — and the fetched rows then parallelize via
  * `spark.createDataFrame`/`read.json(ds)`. At scale, many collections/sources
  * page concurrently; a single source's scan is bandwidth-bound on the REST API
  * either way (the reference has the same property).
  */
object RestPager {

  /** One page of results plus the cursor for the next fetch (None = done).
    * Offset-paged APIs use the offset as the cursor; token-paged APIs the token.
    */
  final case class Page[T](items: Seq[T], nextCursor: Option[String])

  final case class PagerConfig(
      batchSize: Int = 500,                // jira_document_reader.py:16
      retries: Int = 3,                    // retry.py "retries"
      retryDelayMillis: Long = 1000,       // retry.py "delay"
      maxSkippedItemsInRow: Int = 5)       // jira_document_reader.py:20

  /** Retry a call N times with a fixed delay (retry.py:5-15). */
  @tailrec
  def withRetry[A](retries: Int, delayMillis: Long)(f: () => A): A =
    Try(f()) match {
      case Success(a) => a
      case Failure(e) if retries > 0 =>
        Thread.sleep(delayMillis)
        withRetry(retries - 1, delayMillis)(f)
      case Failure(e) => throw e
    }

  /** Read all items: page through `fetch(cursor, batchSize)`; on a failing page,
    * degrade to batch size 1 and skip up to `maxSkippedItemsInRow` consecutive bad
    * items (batch.py:21-43) before giving up.
    */
  def readAll[T](fetch: (Option[String], Int) => Page[T],
                 config: PagerConfig = PagerConfig()): Seq[T] = {
    val out = Seq.newBuilder[T]
    var cursor: Option[String] = None
    var done = false
    while (!done) {
      val page = Try(withRetry(config.retries, config.retryDelayMillis)(
        () => fetch(cursor, config.batchSize))) match {
        case Success(p) => p
        case Failure(_) => // degrade: one item at a time, quarantine bad ones
          var skippedInRow = 0
          var items = Vector.empty[T]
          var c = cursor
          var innerDone = false
          while (!innerDone && items.size < config.batchSize) {
            Try(withRetry(config.retries, config.retryDelayMillis)(
              () => fetch(c, 1))) match {
              case Success(p1) =>
                skippedInRow = 0
                items ++= p1.items
                c = p1.nextCursor
                if (p1.nextCursor.isEmpty) innerDone = true
              case Failure(e) =>
                skippedInRow += 1
                if (skippedInRow > config.maxSkippedItemsInRow)
                  throw new RuntimeException(
                    s"gave up after $skippedInRow consecutive bad items", e)
                // None = the start of an offset sequence — skip item 0 by moving
                // to offset 1 (a silent early return here would truncate the
                // whole source). Non-numeric (token) cursors cannot skip; they
                // retry until the skip cap throws loudly.
                c = Some(advanceCursor(c.getOrElse("0")))
            }
          }
          Page(items, c)
      }
      out ++= page.items
      cursor = page.nextCursor
      done = cursor.isEmpty
    }
    out.result()
  }

  /** Offset-cursor advance for the degrade path (numeric cursors only; token
    * cursors cannot skip — matching the reference, which only degrades offset
    * pagination: batch.py:30-36).
    */
  private def advanceCursor(c: String): String =
    Try(c.toLong) match {
      case Success(n) => (n + 1).toString
      case Failure(_) => c
    }
}
