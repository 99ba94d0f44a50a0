package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** From-scratch Python-pickle codec for the subset of the format the
  * reference's legacy index artifacts use: `pickle.dumps`/`loads` of plain
  * dict/list/str/int/float/bool/None trees (reference:
  * main/indexes/indexers/chroma_indexer.py:181 `pickle.loads(serialized_data)`
  * of `{"ids": [str], "embeddings": [[float]], "metadatas": [dict]}`;
  * main/persisters/disk_persister.py:30 `pickle.dump`). The opcode set and
  * wire layout are public knowledge — CPython's `pickletools` module documents
  * every opcode; this reader covers what CPython 3.x emits for such trees at
  * protocols 2–5 (plus the legacy protocol-0/1 string ops for robustness), and
  * the writer emits protocol 2, which every CPython ≥ 2.3 loads.
  *
  * Value mapping: None↔null, bool↔java.lang.Boolean, int↔java.lang.Long,
  * float↔java.lang.Double, str↔String, bytes↔Array[Byte],
  * list/tuple↔mutable.ArrayBuffer[Any], dict↔mutable.LinkedHashMap[Any, Any]
  * (insertion-ordered, like Python dicts). Containers stay mutable because
  * pickle's APPENDS/SETITEMS opcodes mutate memoized objects in place.
  *
  * Scale note: a pickle is a single in-memory artifact by construction (the
  * reference materializes the full dict before dumping), so this codec is
  * driver-side by design — the distributed part of a migration starts after
  * parse, when [[LegacyChroma.importPickled]] hands the rows to Spark.
  */
object Pickle {

  /** Parse a pickle stream produced by CPython's `pickle.dumps`. */
  def load(bytes: Array[Byte]): Any = {
    var pos = 0
    def u8(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    def take(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= bytes.length, s"pickle truncated at $pos (+$n)")
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }
    def u16le(): Int = { val a = u8(); val b = u8(); a | (b << 8) }
    def i32le(): Int =
      ByteBuffer.wrap(take(4)).order(ByteOrder.LITTLE_ENDIAN).getInt
    def u32le(): Long = i32le().toLong & 0xffffffffL
    def u64le(): Long =
      ByteBuffer.wrap(take(8)).order(ByteOrder.LITTLE_ENDIAN).getLong
    def f64be(): Double =
      ByteBuffer.wrap(take(8)).order(ByteOrder.BIG_ENDIAN).getDouble
    def intLen(v: Long): Int = {
      require(v >= 0 && v <= Int.MaxValue, s"pickle length out of range: $v")
      v.toInt
    }
    def utf8(n: Int): String = new String(take(n), java.nio.charset.StandardCharsets.UTF_8)
    /** Little-endian two's-complement arbitrary-width int (LONG1/LONG4 body). */
    def longFromLe(b: Array[Byte]): Long = {
      require(b.length <= 8, s"pickle integer wider than 64 bits (${b.length} bytes)")
      if (b.isEmpty) 0L
      else {
        var v = 0L
        var i = b.length - 1
        while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
        val bits = b.length * 8
        if (bits < 64 && (b(b.length - 1) & 0x80) != 0) v - (1L << bits) else v
      }
    }

    val stack = mutable.ArrayBuffer.empty[Any]
    val marks = mutable.ArrayBuffer.empty[Int]
    val memo = mutable.ArrayBuffer.empty[Any]
    def push(v: Any): Unit = { stack += v; () }
    def pop(): Any = { val v = stack.last; stack.dropRightInPlace(1); v }
    /** Pop everything above the latest MARK, in push order. */
    def popToMark(): mutable.ArrayBuffer[Any] = {
      val m = marks.last; marks.dropRightInPlace(1)
      val items = stack.slice(m, stack.length)
      stack.takeInPlace(m)
      items
    }

    while (true) {
      val op = u8()
      op match {
        case 0x80 => u8() // PROTO n — versions differ only in available opcodes
        case 0x95 => u64le() // FRAME (proto 4+): length hint, no semantic content
        case '.' => return stack.last // STOP
        case 'N' => push(null) // NONE
        case 0x88 => push(java.lang.Boolean.TRUE) // NEWTRUE
        case 0x89 => push(java.lang.Boolean.FALSE) // NEWFALSE
        case 'K' => push(java.lang.Long.valueOf(u8().toLong)) // BININT1
        case 'M' => push(java.lang.Long.valueOf(u16le().toLong)) // BININT2
        case 'J' => push(java.lang.Long.valueOf(i32le().toLong)) // BININT (signed)
        case 0x8a => push(java.lang.Long.valueOf(longFromLe(take(u8())))) // LONG1
        case 0x8b => push(java.lang.Long.valueOf(longFromLe(take(intLen(u32le()))))) // LONG4
        case 'G' => push(java.lang.Double.valueOf(f64be())) // BINFLOAT
        case 0x8c => push(utf8(u8())) // SHORT_BINUNICODE (proto 4)
        case 'X' => push(utf8(intLen(u32le()))) // BINUNICODE
        case 0x8d => push(utf8(intLen(u64le()))) // BINUNICODE8
        case 'C' => push(take(u8())) // SHORT_BINBYTES (proto 3)
        case 'B' => push(take(intLen(u32le()))) // BINBYTES
        case 0x8e => push(take(intLen(u64le()))) // BINBYTES8
        // Protocol-0/1 text ops (python2-era artifacts): STRING semantics; the
        // reference's payloads are ASCII ids/keys, decoded here as UTF-8.
        case 'U' => push(utf8(u8())) // SHORT_BINSTRING
        case 'T' => push(utf8(intLen(u32le()))) // BINSTRING
        case ']' => push(mutable.ArrayBuffer.empty[Any]) // EMPTY_LIST
        case '}' => push(mutable.LinkedHashMap.empty[Any, Any]) // EMPTY_DICT
        case ')' => push(mutable.ArrayBuffer.empty[Any]) // EMPTY_TUPLE
        case '(' => marks += stack.length // MARK
        case 'l' => push(popToMark()) // LIST
        case 't' => push(popToMark()) // TUPLE
        case 0x85 => { val a = pop(); push(mutable.ArrayBuffer[Any](a)) } // TUPLE1
        case 0x86 => { val b = pop(); val a = pop(); push(mutable.ArrayBuffer[Any](a, b)) } // TUPLE2
        case 0x87 => { val c = pop(); val b = pop(); val a = pop()
          push(mutable.ArrayBuffer[Any](a, b, c)) } // TUPLE3
        case 'a' => { val v = pop() // APPEND
          stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] += v; () }
        case 'e' => { val items = popToMark() // APPENDS
          stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] ++= items; () }
        case 's' => { val v = pop(); val k = pop() // SETITEM
          stack.last.asInstanceOf[mutable.LinkedHashMap[Any, Any]].put(k, v); () }
        case 'u' => { val items = popToMark() // SETITEMS
          val d = stack.last.asInstanceOf[mutable.LinkedHashMap[Any, Any]]
          var i = 0
          while (i < items.length) { d.put(items(i), items(i + 1)); i += 2 } }
        case 'd' => { val items = popToMark() // DICT
          val d = mutable.LinkedHashMap.empty[Any, Any]
          var i = 0
          while (i < items.length) { d.put(items(i), items(i + 1)); i += 2 }
          push(d) }
        case 'q' => memoPut(memo, u8(), stack.last) // BINPUT
        case 'r' => memoPut(memo, intLen(u32le()), stack.last) // LONG_BINPUT
        case 0x94 => memoPut(memo, memo.length, stack.last) // MEMOIZE
        case 'h' => push(memo(u8())) // BINGET
        case 'j' => push(memo(intLen(u32le()))) // LONG_BINGET
        case other =>
          throw new IllegalArgumentException(
            f"unsupported pickle opcode 0x$other%02x at offset ${pos - 1} — " +
              "only plain dict/list/str/int/float/bool/None payloads are importable")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def memoPut(memo: mutable.ArrayBuffer[Any], idx: Int, v: Any): Unit = {
    while (memo.length <= idx) memo += null
    memo(idx) = v
  }

  /** Serialize a None/Boolean/Long/Int/Double/Float/String/Seq/Map tree as a
    * protocol-2 pickle CPython loads verbatim — the export half of the legacy
    * migration (our index state → the reference's `pickle.loads` path). Trees
    * only (no shared references), so no memo records are needed.
    */
  def dump(value: Any): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x80); out.write(2) // PROTO 2
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def write(v: Any): Unit = v match {
      case null => out.write('N')
      case b: Boolean => out.write(if (b) 0x88 else 0x89)
      case b: java.lang.Boolean => out.write(if (b) 0x88 else 0x89)
      case i: Int => write(i.toLong)
      case l: Long =>
        if (l >= 0 && l < 256) { out.write('K'); out.write(l.toInt) }
        else if (l >= 0 && l < 65536) { out.write('M'); out.write(l.toInt & 0xff); out.write((l.toInt >> 8) & 0xff) }
        else if (l >= Int.MinValue && l <= Int.MaxValue) { out.write('J'); le32(l.toInt) }
        else { // LONG1, little-endian two's complement, minimal width
          var n = 8
          while (n > 1 && (l >> ((n - 1) * 8 - 1) == 0 || l >> ((n - 1) * 8 - 1) == -1)) n -= 1
          out.write(0x8a); out.write(n)
          var i = 0
          while (i < n) { out.write(((l >> (i * 8)) & 0xff).toInt); i += 1 }
        }
      case f: Float => write(f.toDouble)
      case d: Double =>
        out.write('G')
        val bits = java.lang.Double.doubleToLongBits(d)
        var i = 7
        while (i >= 0) { out.write(((bits >> (i * 8)) & 0xff).toInt); i -= 1 }
      case s: String =>
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.write('X'); le32(b.length); out.write(b)
      case bs: Array[Byte] => // proto-2 has no bytes op; emit BINBYTES (proto 3)
        out.write('B'); le32(bs.length); out.write(bs)
      case seq: scala.collection.Seq[_] =>
        out.write(']')
        // batch APPENDS like CPython: ] ( items e
        seq.grouped(1000).foreach { g =>
          out.write('('); g.foreach(write); out.write('e')
        }
      case arr: Array[_] => write(arr.toSeq)
      case m: scala.collection.Map[_, _] =>
        out.write('}')
        m.toSeq.grouped(1000).foreach { g =>
          out.write('(')
          g.foreach { case (k, v2) => write(k); write(v2) }
          out.write('u')
        }
      case other =>
        throw new IllegalArgumentException(s"not picklable here: ${other.getClass}")
    }
    write(value)
    out.write('.')
    out.toByteArray
  }
}
