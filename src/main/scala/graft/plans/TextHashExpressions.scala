package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop implementations behind [[SimHash16]] and [[WinnowFingerprint]].
  *
  * The declarative formulations (higher-order `aggregate`/`transform` over an
  * md5-per-element array) are interpreted per element and, worse, Catalyst
  * splices the md5 array expression into every reference — the simhash
  * `aggregate(sequence(1,16), ...)` form recomputed the whole per-token md5
  * array 16 times per document. These helpers hash each input exactly once with
  * a reused thread-local MessageDigest and no per-element boxing; the wrapping
  * expressions keep the call inside whole-stage codegen.
  *
  * Bit/byte contracts are EXACTLY the declarative ones (oracle-checked):
  * md5 = MD5 over UTF-8 bytes; "hex char j" = nibble j of the digest,
  * high nibble first; 8-hex-char window hashes compare as unsigned 32-bit ints
  * (lexicographic hex order == unsigned numeric order at fixed width).
  */
object TextHashOps extends Serializable {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 16-bit simhash over a token array: bit j set iff
    * Σ_tokens (nibble j of md5(token) >= 8 ? +1 : −1) > 0.
    */
  def simhash16(tokens: ArrayData): Long = {
    val md = md5Local.get()
    val counts = new Array[Int](16)
    val digest = new Array[Byte](16)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        md.reset()
        md.update(tokens.getUTF8String(t).getBytes)
        md.digest(digest, 0, 16)
        var j = 0
        while (j < 16) {
          val b = digest(j >> 1) & 0xff
          val nib = if ((j & 1) == 0) b >> 4 else b & 0xf
          counts(j) += (if (nib >= 8) 1 else -1)
          j += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 16) { if (counts(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }

  private val spaceByte = ' '.toByte

  /** MinHash signature slices over a token array: word-`n`-gram shingles (docs
    * shorter than n tokens collapse to one whole-text shingle, matching the
    * declarative `withShingles` CASE), one md5 per shingle via the reused
    * digest — shingle bytes stream straight into the digest, no string
    * allocation — and the four signatures are the per-slice unsigned minima of
    * digest words 0..3 (8 hex chars == 4 digest bytes; lexicographic hex order
    * == unsigned int order at fixed width).
    */
  def minhashSig(tokens: ArrayData, n: Int): ArrayData = {
    val md = md5Local.get()
    val digest = new Array[Byte](16)
    val count = tokens.numElements()
    // mins stored sign-flipped so plain signed < is unsigned order; every code
    // path folds at least one shingle (an empty token array still hashes the
    // empty whole-text shingle), so the init value never escapes.
    val mins = Array.fill(4)(Int.MaxValue)

    def fold(): Unit = {
      md.digest(digest, 0, 16)
      var s = 0
      while (s < 4) {
        val w = (((digest(4 * s) & 0xff) << 24) | ((digest(4 * s + 1) & 0xff) << 16) |
          ((digest(4 * s + 2) & 0xff) << 8) | (digest(4 * s + 3) & 0xff)) ^ 0x80000000
        if (w < mins(s)) mins(s) = w
        s += 1
      }
    }

    if (count < n) {
      // whole-text shingle: tokens joined by single spaces (array_join semantics)
      md.reset()
      var i = 0
      while (i < count) {
        if (i > 0) md.update(spaceByte)
        if (!tokens.isNullAt(i)) md.update(tokens.getUTF8String(i).getBytes)
        i += 1
      }
      fold()
    } else {
      var i = 0
      while (i <= count - n) {
        md.reset()
        var j = 0
        while (j < n) {
          if (j > 0) md.update(spaceByte)
          if (!tokens.isNullAt(i + j)) md.update(tokens.getUTF8String(i + j).getBytes)
          j += 1
        }
        fold()
        i += 1
      }
    }

    val out = new Array[Any](4)
    var s = 0
    while (s < 4) { out(s) = hex8(mins(s) ^ 0x80000000); s += 1 }
    new GenericArrayData(out)
  }

  private def hex8(v: Int): UTF8String = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) {
      val nib = (v >>> ((7 - i) << 2)) & 0xf
      out(i) = (if (nib < 10) '0' + nib else 'a' + nib - 10).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Winnowing fingerprint: k-codepoint shingles → first-8-hex-chars of md5 →
    * min per sliding window of w (monotonic deque, O(positions)) → distinct in
    * first-occurrence order. Texts shorter than k codepoints fingerprint the
    * whole text; hash counts <= w collapse to the single global min.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val md = md5Local.get()
    val digest = new Array[Byte](16)
    val bytes = text.getBytes
    val nChars = text.numChars()

    def head4(off: Int, len: Int): Int = {
      md.reset()
      md.update(bytes, off, len)
      md.digest(digest, 0, 16)
      ((digest(0) & 0xff) << 24) | ((digest(1) & 0xff) << 16) |
        ((digest(2) & 0xff) << 8) | (digest(3) & 0xff)
    }

    if (nChars < k)
      return new GenericArrayData(Array[Any](hex8(head4(0, bytes.length))))

    // Codepoint start offsets (UTF-8 continuation bytes are 10xxxxxx).
    val starts = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xc0) != 0x80) { starts(ci) = bi; ci += 1 }
      bi += 1
    }
    starts(nChars) = bytes.length

    val nHashes = nChars - k + 1
    // Stored sign-flipped so plain signed < is unsigned (= hex-lexicographic) order.
    val hashes = new Array[Int](nHashes)
    var i = 0
    while (i < nHashes) {
      hashes(i) = head4(starts(i), starts(i + k) - starts(i)) ^ 0x80000000
      i += 1
    }

    val seen = new java.util.LinkedHashSet[Int]()
    if (nHashes <= w) {
      var min = hashes(0)
      i = 1
      while (i < nHashes) { if (hashes(i) < min) min = hashes(i); i += 1 }
      seen.add(min)
    } else {
      val deque = new Array[Int](nHashes) // indices into hashes
      var head = 0
      var tail = 0 // live range [head, tail)
      i = 0
      while (i < nHashes) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) seen.add(hashes(deque(head)))
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = hex8(it.next() ^ 0x80000000); i += 1 }
    new GenericArrayData(out)
  }
}

/** One-pass character-entropy kernel behind [[CharEntropy]]: UTF-8 codepoint
  * histogram (dense int[128] for ASCII, map spill for the rest) folded into
  * -Σ p·log2 p. Replaces a sort + two higher-order passes; value parity with
  * the declarative run-length formulation is locked by the text_entropy
  * oracle (summation-order double drift is absorbed by the 4-dp round, the
  * same tolerance the DuckDB comparison already exercises).
  */
object CharEntropyOps extends Serializable {
  private val LOG2 = math.log(2.0)

  def entropy(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 0.0
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Array[Int]] = null
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 0x80) { ascii(b) += 1; i += 1 }
      else {
        val len =
          if ((b & 0xe0) == 0xc0) 2 else if ((b & 0xf0) == 0xe0) 3
          else if ((b & 0xf8) == 0xf0) 4 else 1
        var cp = 0
        var j = 0
        while (j < len && i + j < bytes.length) {
          cp = (cp << 8) | (bytes(i + j) & 0xff); j += 1
        }
        if (other == null) other = new java.util.HashMap()
        other.computeIfAbsent(cp, _ => new Array[Int](1))(0) += 1
        i += math.min(len, bytes.length - i)
      }
      n += 1
    }
    val nd = n.toDouble
    var h = 0.0
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0) { val p = k / nd; h -= p * math.log(p) / LOG2 }
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) { val p = it.next()(0) / nd; h -= p * math.log(p) / LOG2 }
    }
    h
  }
}

/** Shannon entropy in bits/char of a string's codepoints (string → double). */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def prettyName: String = "char_entropy"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any): Any =
    CharEntropyOps.entropy(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ctx.addReferenceObj("charEntropyOps", CharEntropyOps,
      "graft.plans.CharEntropyOps$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ops.entropy($c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 16-bit simhash of a token array (array<string> → bigint). */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash16"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(tokens: Any): Any =
    TextHashOps.simhash16(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ctx.addReferenceObj("textHashOps", TextHashOps, "graft.plans.TextHashOps$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ops.simhash16($c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature slices of a token array (array<string> → array<string>[4]). */
case class MinHashSig(child: Expression, n: Int) extends UnaryExpression {
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(tokens: Any): Any =
    TextHashOps.minhashSig(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ctx.addReferenceObj("textHashOps", TextHashOps, "graft.plans.TextHashOps$")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ops.minhashSig($c, $n);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing fingerprint set of a text column (string → array<string>). */
case class WinnowFingerprint(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def prettyName: String = "winnow_fingerprint"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(text: Any): Any =
    TextHashOps.winnow(text.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ctx.addReferenceObj("textHashOps", TextHashOps, "graft.plans.TextHashOps$")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ops.winnow($c, $k, $w);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** JVM body for [[NfcNormalize]] — kept in an Ops object so codegen calls the
  * same code as interpreted eval. `java.text.Normalizer` implements Unicode
  * Standard Annex #15, the identical spec DuckDB's `nfc_normalize` follows,
  * which is what lets the oracle gate normalized-text HASHES.
  */
object TextNormOps extends Serializable {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan, and real corpora
    // are overwhelmingly already-NFC — skip the allocation for them
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization (string → string), codegen'd. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any): Any =
    TextNormOps.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ctx.addReferenceObj("textNormOps", TextNormOps, "graft.plans.TextNormOps$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ops.nfc($c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** JVM body for [[SortedIntersectSize]] — a merge walk over two SORTED string
  * arrays. The built-in `array_intersect` builds a hash set per ROW (boxing
  * every element, allocating per call); at 193k candidate pairs × ~50-element
  * shingle sets that was 3.8 s of the 5 s jaccard-join bench — ~20 µs/row of
  * pure overhead. The merge walk is O(|a|+|b|) UTF8String compares with zero
  * allocation, and the sort it requires happens once per DOCUMENT (in the
  * projection that builds the arrays), not once per pair.
  */
object SortedArrayOps extends Serializable {
  /** Distinct-intersection size; both inputs must be sorted ascending with
    * distinct elements (array_sort ∘ array_distinct). `array_sort` places
    * null elements at the END of an ascending sort (unlike `sort_array`,
    * which puts them first), so the merge walk stops at the first null on
    * either side — everything after it is null too.
    */
  def intersectSize(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb && !a.isNullAt(i) && !b.isNullAt(j)) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

/** Intersection size of two sorted distinct string arrays
  * (array<string>, array<string>) → bigint.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "sorted_intersect_size"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedArrayOps.intersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ctx.addReferenceObj("sortedArrayOps", SortedArrayOps,
      "graft.plans.SortedArrayOps$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ops.intersectSize($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Character-level longest-common-prefix helpers shared by eval and codegen. */
object CommonPrefixOps extends Serializable {
  /** LCP of two strings in CODEPOINTS: byte-wise walk over the UTF-8
    * encodings (equal bytes ⇒ identical char structure), then count complete
    * codepoints inside the matched byte prefix — a char matched only
    * partially (its tail bytes diverge) is excluded, which is exactly
    * SQL `substr`-prefix-comparison semantics.
    */
  def lcp(a: UTF8String, b: UTF8String): Long = {
    val ba = a.getBytes; val bb = b.getBytes
    val n = math.min(ba.length, bb.length)
    var p = 0
    while (p < n && ba(p) == bb(p)) p += 1
    var q = 0
    var chars = 0L
    while (q < p) {
      val lead = ba(q) & 0xFF
      val len =
        if (lead < 0x80) 1 else if (lead < 0xE0) 2 else if (lead < 0xF0) 3 else 4
      if (q + len > p) q = p // partial char at the mismatch point: not counted
      else { q += len; chars += 1L }
    }
    chars
  }
}

/** Longest-common-prefix length in codepoints (string, string) → bigint. */
case class CommonPrefixLength(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "common_prefix_length"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CommonPrefixOps.lcp(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ctx.addReferenceObj("commonPrefixOps", CommonPrefixOps,
      "graft.plans.CommonPrefixOps$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ops.lcp($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object TextHashFunctions {
  import ColumnBridge.{toCol, toExpr}

  def sortedIntersectSize(a: Column, b: Column): Column =
    toCol(SortedIntersectSize(toExpr(a), toExpr(b)))
  def commonPrefixLength(a: Column, b: Column): Column =
    toCol(CommonPrefixLength(toExpr(a), toExpr(b)))
  def simhash16(tokens: Column): Column = toCol(SimHash16(toExpr(tokens)))
  def charEntropy(text: Column): Column = toCol(CharEntropy(toExpr(text)))
  def minhashSig(tokens: Column, n: Int): Column = toCol(MinHashSig(toExpr(tokens), n))
  def winnowFingerprint(text: Column, k: Int, w: Int): Column =
    toCol(WinnowFingerprint(toExpr(text), k, w))
  def nfcNormalize(text: Column): Column = toCol(NfcNormalize(toExpr(text)))
}
