package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Recursive character text splitter.
  *
  * Re-implementation of the splitting semantics the reference delegates to LangChain's
  * `RecursiveCharacterTextSplitter` (/root/reference/main/splitter/text_splitter.py:5-21,
  * defaults chunk_size=1000 chunk_overlap=100, separators "\n\n","\n"," ",""): split on
  * the coarsest separator present, re-merge adjacent splits greedily up to `chunkSize`
  * with a sliding `chunkOverlap` tail, and recurse into oversized splits with the
  * remaining (finer) separators.
  *
  * Pure Scala — usable on the driver, inside a UDF, or in `Dataset.flatMap`.
  */
final class TextSplitter(
    val chunkSize: Int = 1000,
    val chunkOverlap: Int = 100,
    val separators: Seq[String] = Seq("\n\n", "\n", " ", "")) extends Serializable {
  require(chunkOverlap < chunkSize, "chunkOverlap must be smaller than chunkSize")

  def split(text: String): Seq[String] =
    if (text == null || text.isEmpty) Seq.empty else splitRec(text, separators)

  private def splitRec(text: String, seps: Seq[String]): Seq[String] = {
    // Pick the first separator that occurs in the text; "" always matches last.
    var separator = seps.lastOption.getOrElse("")
    var remaining: Seq[String] = Nil
    var i = 0
    var found = false
    while (i < seps.length && !found) {
      val s = seps(i)
      if (s.isEmpty || text.contains(s)) { separator = s; remaining = seps.drop(i + 1); found = true }
      i += 1
    }

    val splits: Seq[String] =
      if (separator.isEmpty) text.map(_.toString)
      else text.split(java.util.regex.Pattern.quote(separator), -1).toSeq

    val out = ArrayBuffer.empty[String]
    val good = ArrayBuffer.empty[String]
    for (s <- splits; if s.nonEmpty || separator.nonEmpty) {
      if (s.length < chunkSize) good += s
      else {
        if (good.nonEmpty) { out ++= merge(good.toSeq, separator); good.clear() }
        if (remaining.isEmpty) out += s
        else out ++= splitRec(s, remaining)
      }
    }
    if (good.nonEmpty) out ++= merge(good.toSeq, separator)
    out.toSeq
  }

  /** Greedy re-merge with overlap carry-over (LangChain `_merge_splits` semantics). */
  private def merge(splits: Seq[String], separator: String): Seq[String] = {
    val sepLen = separator.length
    val docs = ArrayBuffer.empty[String]
    val current = ArrayBuffer.empty[String]
    var total = 0
    def joined: Option[String] = {
      val t = current.mkString(separator).trim
      if (t.isEmpty) None else Some(t)
    }
    for (d <- splits) {
      val len = d.length
      if (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize) {
        if (current.nonEmpty) {
          joined.foreach(docs += _)
          // Slide the window: drop head splits until the carried tail fits the overlap
          // budget and the incoming split still fits in a fresh chunk.
          while (total > chunkOverlap ||
                 (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize && total > 0)) {
            total -= current.head.length + (if (current.length > 1) sepLen else 0)
            current.remove(0)
          }
        }
      }
      current += d
      total += len + (if (current.length > 1) sepLen else 0)
    }
    joined.foreach(docs += _)
    docs.toSeq
  }
}

object TextSplitter {
  val default = new TextSplitter()

  /** Fixed-size character splitter with overlap — the SQL-expressible variant used by
    * oracle-checked queries: chunk i covers [i*(size-overlap), i*(size-overlap)+size).
    */
  def fixedSize(text: String, size: Int, overlap: Int): Seq[String] = {
    require(overlap < size)
    if (text == null || text.isEmpty) Seq.empty
    else {
      val step = size - overlap
      val n = math.max(1, math.ceil((text.length - overlap).toDouble / step).toInt)
      (0 until n).map(i => text.substring(i * step, math.min(text.length, i * step + size)))
    }
  }
}
