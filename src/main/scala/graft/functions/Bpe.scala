package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — the REAL subword slot behind the regex
  * approximation in `TextAnalysis.tokenCounts` (`bpe_tokens`): train merges on
  * a corpus, ship them as a one-merge-per-line text artifact, count/encode
  * with the trained table.
  *
  * Scale split (the standard one, cf. sentencepiece/GPT-2 BPE): the CORPUS
  * pass is one distributed word-frequency aggregation (groupBy word — the
  * only corpus-sized step, map-side combined); the merge LOOP then runs on
  * the driver over that word-frequency table, which is vocabulary-sized
  * (≤ distinct words), not corpus-sized. Encoding is a pure per-row map with
  * the broadcast rank table.
  *
  * Reference pairing: the reference approximates token budgets with
  * character counts (`text_splitter.py:6` splits by chars); this gives the
  * pipeline a true subword count for token-budget packing and mixture math.
  */
object Bpe {

  val endOfWord = "</w>"

  final case class BpeModel(merges: Seq[(String, String)]) extends Serializable {
    @transient private lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Greedy standard BPE: repeatedly apply the LOWEST-rank merge present. */
    def encodeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Nil
      var parts: Vector[String] = word.map(_.toString).toVector :+ endOfWord
      var done = false
      while (!done && parts.length > 1) {
        var bestIdx = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i < parts.length - 1) {
          val r = rank.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestIdx = i }
          i += 1
        }
        if (bestIdx < 0) done = true
        else parts = (parts.take(bestIdx) :+ (parts(bestIdx) + parts(bestIdx + 1))) ++
          parts.drop(bestIdx + 2)
      }
      parts
    }

    def encode(text: String): Seq[String] =
      tokenizeWords(text).flatMap(encodeWord)

    def countTokens(text: String): Long =
      tokenizeWords(text).map(encodeWord(_).length.toLong).sum

    /** One merge per line, space-separated pair — the ship format. */
    def save(path: String): Unit = {
      val body = "# bpe merges, rank order\n" +
        merges.map { case (a, b) => s"$a $b" }.mkString("\n") + "\n"
      Files.write(Paths.get(path), body.getBytes(StandardCharsets.UTF_8))
    }
  }

  private def tokenizeWords(text: String): Seq[String] =
    if (text == null) Nil
    else text.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  def load(path: String): BpeModel = BpeModel(
    new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
      .linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => // a merge line is exactly "left right" — anything else is a
        l.split(" ") match { // corrupt artifact; silently skipping (or folding
          case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b) // extra fields
          case _ => throw new IllegalArgumentException( // into one token) would
            s"bpe merges file $path: malformed line '$l'") // CHANGE the
        } // tokenizer, so fail loud — an unlimited split makes 'a b c' hit here
      }.toSeq)

  /** Train `nMerges` merges. The corpus reduces to (word, freq) in ONE
    * distributed aggregation; the loop then runs over that table locally
    * (each iteration touches only words containing the merged pair, tracked
    * in an index — the sentencepiece-style optimization, minus the heap).
    *
    * The driver-side table is bounded BY CONSTRUCTION, not by corpus luck:
    * `minFreq` floors the frequency and `maxVocab` caps the collect at the
    * top-V words (freq desc, word asc — deterministic). At web scale the
    * distinct alphanumeric token set is 1e8–1e9 rows (typos, numbers, IDs);
    * an uncapped collect OOMs the driver. The cut is the standard BPE/
    * sentencepiece vocabulary pruning and is an approximation in the strict
    * sense: an excluded word removes its occurrences from the counts of the
    * pairs it contains, so a merge decision flips only when the margin
    * between the winning pair and the runner-up is smaller than the total
    * excluded mass touching exactly one of them. Early merges on real
    * corpora are decided by margins orders of magnitude above any single
    * rare word's mass; a freq-2 floor is therefore safe for realistic merge
    * counts, and the default cap (2^20 words) is far above any gated corpus
    * so existing oracles are byte-identical.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
            minFreq: Long = 1L, maxVocab: Int = 1 << 20): BpeModel = {
    require(maxVocab > 0, "maxVocab must be positive (it bounds the driver collect)")
    val wordFreq: Array[(String, Long)] = docs
      .select(explode(
        graft.operators.Search.tokensCol(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minFreq)
      // top-V: TakeOrderedAndProject — per-partition heaps + driver merge of
      // V rows, never a full sort shuffle
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))

    // mutable word representations: symbol vectors with frequencies
    val words = wordFreq.map { case (w, c) =>
      (scala.collection.mutable.ArrayBuffer.from(w.map(_.toString)) += endOfWord, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // deterministic argmax: count desc, then lexicographic pair
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val fused = best._1 + best._2
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms(i) = fused; syms.remove(i + 1)
            } else i += 1
          }
        }
        iter += 1
      }
    }
    BpeModel(merges.toSeq)
  }

  /** Per-row token count under a trained model — the drop-in upgrade for the
    * `bpe_tokens` regex estimate (broadcast-in-closure ranks, zero shuffle).
    */
  def tokenCountCol(model: BpeModel): Column => Column = {
    val f = udf { t: String => model.countTokens(t) }
    (c: Column) => f(c)
  }
}
