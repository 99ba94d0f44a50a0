package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass kernel behind [[EngineTokenize]] — the ENGINE tokenizer
  * (`filter(split(lower(text), "[^a-z0-9]+"), _ != "")`) as a single byte
  * scan instead of a lowercase pass plus a java.util.regex split.
  *
  * The declarative form pays three traversals and a regex machine per row;
  * on the r15 board the scan-path MATCH rows spent ~half their time inside
  * it (`ql_phrase_search` 1.8 → 3.7 s when the scan default switched to the
  * regex tokenizer). This kernel emits each token's lowercased bytes
  * directly: ASCII alphanumerics are token bytes ('A'–'Z' mapped +32),
  * EVERYTHING else — including every byte of any multi-byte codepoint — is a
  * separator, which is exactly what the regex sees after `lower()` for
  * ASCII text.
  *
  * Bit-parity with the declarative form is EXACT: any input containing a
  * non-ASCII byte falls back to the same `UTF8String.toLowerCase` + regex
  * split the `Lower`/`StringSplit` expressions run (locale-sensitive
  * lowercasings like U+0130 İ → "i̇" included), so the fast path never
  * changes a result, only the cost (TextHashSpec pins equality on both
  * paths; every tokenizer-dependent oracle re-derives in DuckDB).
  */
object TokenizeOps extends Serializable {
  private val SPLIT = java.util.regex.Pattern.compile("[^a-z0-9]+")

  def tokenize(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    while (i < n) {
      if ((b(i) & 0x80) != 0) return tokenizeNonAscii(s)
      i += 1
    }
    val toks = new java.util.ArrayList[AnyRef](8)
    i = 0
    var st = -1
    while (i <= n) {
      val isTok = i < n && {
        val c = b(i)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z')
      }
      if (isTok) { if (st < 0) st = i }
      else if (st >= 0) {
        val len = i - st
        val t = new Array[Byte](len)
        var j = 0
        while (j < len) {
          val c = b(st + j)
          t(j) = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
          j += 1
        }
        toks.add(UTF8String.fromBytes(t))
        st = -1
      }
      i += 1
    }
    new GenericArrayData(toks.toArray)
  }

  /** The exact declarative path (Lower + StringSplit semantics) for inputs
    * with any non-ASCII byte — bit-parity over locale-sensitive lowercase
    * expansions beats a hand-rolled unicode table here.
    */
  private def tokenizeNonAscii(s: UTF8String): ArrayData = {
    val parts = SPLIT.split(s.toLowerCase.toString, -1)
    val out = new java.util.ArrayList[AnyRef](parts.length)
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) out.add(UTF8String.fromString(parts(i)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** The engine tokenizer (string → array<string>), codegen'd. */
case class EngineTokenize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "engine_tokenize"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any): Any =
    TokenizeOps.tokenize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ctx.addReferenceObj("tokenizeOps", TokenizeOps, "graft.plans.TokenizeOps$")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ops.tokenize($c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass kernel behind [[BestHighlightWindow]]: hit-test each word ONCE
  * through [[TokenizeOps]] (a word hits when any of its tokens equals a query
  * term or starts with a stem), then slide the window with a running sum —
  * O(words) total. The declarative formulation (a `transform` over windows
  * with an `aggregate` inside) is interpreted per element AND Catalyst
  * splices any hoisted per-word array into every lambda reference, so it
  * re-tokenized each word once per covering window (O(words × window)
  * regexes; `search_highlight` measured 4.2 → 8.8 → 23 s across the r15
  * attempts before this kernel). Tie-break and output contract are EXACTLY
  * the declarative ones (earliest window with the max hit count; snippet =
  * the window's raw words joined by one space) — the search_highlight oracle
  * replays them in DuckDB.
  */
object HighlightOps extends Serializable {
  def bestWindow(ws: ArrayData, window: Int,
                 terms: java.util.HashSet[UTF8String],
                 stems: Array[UTF8String]): Any = {
    val n = ws.numElements()
    if (n == 0) return null
    val hits = new Array[Int](n)
    var i = 0
    while (i < n) {
      val w = ws.getUTF8String(i)
      if (w != null) {
        val toks = TokenizeOps.tokenize(w)
        val tn = toks.numElements()
        var j = 0
        var hit = false
        while (j < tn && !hit) {
          val t = toks.getUTF8String(j)
          if (terms.contains(t)) hit = true
          else {
            var k = 0
            while (k < stems.length && !hit) {
              if (t.startsWith(stems(k))) hit = true
              k += 1
            }
          }
          j += 1
        }
        if (hit) hits(i) = 1
      }
      i += 1
    }
    // sliding sum over windows starting at 0 .. max(n - window, 0) — the
    // same index range as the declarative sequence(0, greatest(n - w, 0))
    val lastStart = math.max(n - window, 0)
    var sum = 0
    i = 0
    while (i < math.min(window, n)) { sum += hits(i); i += 1 }
    var best = sum
    var bestAt = 0
    var s = 1
    while (s <= lastStart) {
      sum -= hits(s - 1)
      if (s + window - 1 < n) sum += hits(s + window - 1)
      if (sum > best) { best = sum; bestAt = s }
      s += 1
    }
    if (best <= 0) return null
    val sb = new java.lang.StringBuilder()
    i = bestAt
    val end = math.min(bestAt + window, n)
    while (i < end) {
      if (i > bestAt) sb.append(' ')
      val w = ws.getUTF8String(i)
      if (w != null) sb.append(w.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(sb.toString), best.toLong))
  }
}

/** Best highlight window of a word array (array<string> →
  * struct<snippet: string, n_hits: bigint>, null when nothing hits).
  */
case class BestHighlightWindow(child: Expression, window: Int,
                               terms: Seq[String], stems: Seq[String])
    extends UnaryExpression {
  override def prettyName: String = "best_highlight_window"
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("snippet", StringType),
    org.apache.spark.sql.types.StructField("n_hits",
      org.apache.spark.sql.types.LongType)))
  override def nullable: Boolean = true

  @transient private lazy val termSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](terms.size * 2)
    terms.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }
  @transient private lazy val stemArr: Array[UTF8String] =
    stems.map(UTF8String.fromString).toArray

  /** Instance entry point — codegen references `this` so the precomputed
    * term set and stem array are built once per task, not per row.
    */
  def best(ws: ArrayData): Any = HighlightOps.bestWindow(ws, window, termSet, stemArr)

  override def nullSafeEval(ws: Any): Any = best(ws.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bestHighlight", this,
      "graft.plans.BestHighlightWindow")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.best($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Kernels behind the scan-path MATCH family: occurrence starts of a word
  * pattern and the minimum covering span. The declarative forms — a
  * `filter(sequence(...), p -> slice(toks, p, l) = pattern)` per row, and
  * minSpanSearch's candidate-window aggregate — run their lambdas
  * INTERPRETED (higher-order functions never enter whole-stage codegen) and
  * allocate a slice per position; minSpan additionally degraded to
  * O(tokens² × terms) on long rows, a documented don't-point-this-at-books
  * caveat. These are O(tokens × pattern) and O(tokens) single passes.
  * Contracts are EXACTLY the declarative ones — QueryLangPropertySpec pins
  * `matchColumn` against an independent reference evaluator over thousands
  * of generated ASTs, and the ql_* scan oracles replay them in DuckDB.
  */
object MatchOps extends Serializable {
  /** 1-based occurrence START positions of `words` in `toks`; with
    * `lastPrefix` the last word matches by startsWith. Null tokens (possible
    * in caller-supplied arrays, never from the tokenizer) match nothing.
    */
  def occurrenceStarts(toks: ArrayData, words: Array[UTF8String],
                       lastPrefix: Boolean): ArrayData = {
    val l = words.length
    val n = toks.numElements()
    if (n < l) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](4)
    val exact = if (lastPrefix) l - 1 else l
    var p = 0
    while (p <= n - l) {
      var ok = true
      var j = 0
      while (ok && j < exact) {
        val t = if (toks.isNullAt(p + j)) null else toks.getUTF8String(p + j)
        ok = t != null && t.equals(words(j))
        j += 1
      }
      if (ok && lastPrefix) {
        val t = if (toks.isNullAt(p + l - 1)) null else toks.getUTF8String(p + l - 1)
        ok = t != null && t.startsWith(words(l - 1))
      }
      if (ok) out.add(Integer.valueOf(p + 1))
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Minimum window covering every distinct term: (span_len, span_start
    * 1-based), or null when some term is absent. Two-pointer over one pass —
    * the same minimum and the same EARLIEST-start tie-break as the
    * declarative candidate-window formulation (each left edge's minimal
    * covering window is visited in left-to-right order; only strictly
    * smaller spans replace the best).
    */
  def minCoverSpan(toks: ArrayData, terms: Array[UTF8String]): Any = {
    val k = terms.length
    val n = toks.numElements()
    if (n == 0 || k == 0) return null
    val idx = new java.util.HashMap[UTF8String, Integer](k * 2)
    var i = 0
    while (i < k) { idx.put(terms(i), Integer.valueOf(i)); i += 1 }
    val have = new Array[Int](k)
    var covered = 0
    var bestLen = Int.MaxValue
    var bestAt = -1
    var l = 0
    var r = 0
    while (r < n) {
      val t = if (toks.isNullAt(r)) null else toks.getUTF8String(r)
      val ti = if (t == null) null else idx.get(t)
      if (ti != null) {
        have(ti) += 1
        if (have(ti) == 1) covered += 1
        while (covered == k) {
          if (r - l + 1 < bestLen) { bestLen = r - l + 1; bestAt = l }
          val lt = if (toks.isNullAt(l)) null else toks.getUTF8String(l)
          val li = if (lt == null) null else idx.get(lt)
          if (li != null) {
            have(li) -= 1
            if (have(li) == 0) covered -= 1
          }
          l += 1
        }
      }
      r += 1
    }
    if (bestAt < 0) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestLen.toLong, (bestAt + 1).toLong))
  }
}

/** Occurrence starts of a word pattern (array<string> → array<int>). */
case class OccurrenceStarts(child: Expression, words: Seq[String],
                            lastPrefix: Boolean) extends UnaryExpression {
  override def prettyName: String = "occurrence_starts"
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val wordArr: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  def starts(toks: ArrayData): ArrayData =
    MatchOps.occurrenceStarts(toks, wordArr, lastPrefix)

  override def nullSafeEval(toks: Any): Any = starts(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("occurrenceStarts", this,
      "graft.plans.OccurrenceStarts")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.starts($c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Minimum covering span of a distinct-term set (array<string> →
  * struct<span_len: bigint, span_start: bigint>, null when not all present).
  */
case class MinCoverSpan(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  override def prettyName: String = "min_cover_span"
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("span_len",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("span_start",
      org.apache.spark.sql.types.LongType)))
  override def nullable: Boolean = true

  @transient private lazy val termArr: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  def span(toks: ArrayData): Any = MatchOps.minCoverSpan(toks, termArr)

  override def nullSafeEval(toks: Any): Any = span(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minCoverSpan", this, "graft.plans.MinCoverSpan")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.span($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenizeFunctions {
  def engineTokenize(text: Column): Column =
    ColumnBridge.toCol(EngineTokenize(ColumnBridge.toExpr(text)))
  def bestHighlightWindow(words: Column, window: Int,
                          terms: Seq[String], stems: Seq[String]): Column =
    ColumnBridge.toCol(BestHighlightWindow(ColumnBridge.toExpr(words), window, terms, stems))
  def occurrenceStarts(toks: Column, words: Seq[String], lastPrefix: Boolean): Column =
    ColumnBridge.toCol(OccurrenceStarts(ColumnBridge.toExpr(toks), words, lastPrefix))
  def minCoverSpan(toks: Column, terms: Seq[String]): Column =
    ColumnBridge.toCol(MinCoverSpan(ColumnBridge.toExpr(toks), terms))
}
