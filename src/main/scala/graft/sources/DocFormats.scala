package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Inflater, ZipInputStream}
import scala.collection.mutable
import scala.collection.mutable.ListBuffer
import scala.util.control.NonFatal

/** Minimal JVM text extraction for the paginated binary formats the reference
  * reads through the Unstructured library
  * (/root/reference/main/sources/files/files_document_reader.py:227-246):
  * PDF produces per-page elements grouped on pageNumber (:239-246), DOCX a
  * single unpaginated text (:233-237). No document library ships in this
  * container, so this is a from-scratch parser of the common core of each
  * format — enough for machine-written documents, degrading to empty text
  * (never a task failure) on exotic encodings.
  *
  * PDF coverage: uncompressed + FlateDecode content streams; literal
  * (with escapes/octal/nesting) and hex strings; Tj / TJ / ' / " show
  * operators; Td / TD / T* / ET treated as line breaks; TJ kerns below
  * -150/1000 em treated as a space; page order from the /Catalog → /Pages
  * → /Kids tree. CID/Identity-H encoded fonts (2-byte glyph ids) are out of
  * scope and yield garbled-or-empty text, as any non-font-aware extractor.
  */
object DocFormats {

  /** One parsed content element: `metadata` is null for unpaginated formats,
    * mirroring the reference's optional element metadata. Field names must
    * match FilesSource's literal content schema (metadata.pageNumber, text).
    */
  case class PageMeta(pageNumber: String)
  case class ContentPart(metadata: PageMeta, text: String)

  // ------------------------------------------------------------------- PDF

  private case class PdfObj(dict: String, stream: Option[Array[Byte]])

  /** Extract (pageNumber, text) for each non-empty page, 1-based, in page-tree
    * order. Returns Nil for unparseable input.
    */
  def pdfPages(bytes: Array[Byte]): Seq[(Int, String)] =
    try {
      // ISO-8859-1 round-trips bytes 1:1, so structural regexes run on the
      // string while stream payloads convert back to exact bytes.
      val raw = new String(bytes, StandardCharsets.ISO_8859_1)
      val objs = parseObjects(raw)

      val pageNums: Seq[Int] = {
        val fromTree = for {
          (_, cat) <- objs.find(_._2.dict.matches("(?s).*?/Type\\s*/Catalog.*"))
          pagesRef <- """/Pages\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(cat.dict)
        } yield collectPageRefs(pagesRef.group(1).toInt, objs, new ListBuffer[Int])
        fromTree.getOrElse {
          // No catalog (truncated/linearized file): fall back to every /Type
          // /Page object in object-number order.
          objs.toSeq.sortBy(_._1)
            .filter(_._2.dict.matches("(?s).*?/Type\\s*/Page\\b(?!s).*"))
            .map(_._1)
        }
      }

      pageNums.zipWithIndex.flatMap { case (num, idx) =>
        val text = objs.get(num).map(p => pageText(p, objs)).getOrElse("")
        if (text.trim.nonEmpty) Some((idx + 1, text.trim)) else None
      }
    } catch { case NonFatal(_) => Nil }

  private def parseObjects(raw: String): Map[Int, PdfObj] =
    """(?s)(\d+)\s+\d+\s+obj\b(.*?)endobj""".r.findAllMatchIn(raw).map { m =>
      val body = m.group(2)
      val sIdx = body.indexOf("stream")
      val obj =
        if (sIdx < 0) PdfObj(body, None)
        else {
          val dict = body.substring(0, sIdx)
          var dataStart = sIdx + "stream".length
          if (dataStart < body.length && body.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < body.length && body.charAt(dataStart) == '\n') dataStart += 1
          val endIdx = body.lastIndexOf("endstream")
          val data = body.substring(dataStart, math.max(dataStart, endIdx))
            .stripSuffix("\n").stripSuffix("\r")
            .getBytes(StandardCharsets.ISO_8859_1)
          val decoded =
            if (dict.contains("/FlateDecode")) inflate(data) else data
          PdfObj(dict, Some(decoded))
        }
      m.group(1).toInt -> obj
    }.toMap

  /** Walks /Pages → /Kids. A malformed (or malicious) page tree can contain
    * cycles — an object listing itself or an ancestor in /Kids — so the walk
    * carries a visited set and a depth cap; cyclic or absurdly deep refs are
    * skipped, degrading to fewer pages rather than a StackOverflowError
    * (which NonFatal would not catch and would fail the task).
    */
  private def collectPageRefs(num: Int, objs: Map[Int, PdfObj],
                              acc: ListBuffer[Int],
                              seen: mutable.Set[Int] = mutable.Set.empty,
                              depth: Int = 0): Seq[Int] = {
    if (depth > 64 || !seen.add(num)) return acc.toSeq
    objs.get(num).foreach { o =>
      if (o.dict.matches("(?s).*?/Type\\s*/Pages\\b.*")) {
        for {
          kids <- """/Kids\s*\[([^\]]*)\]""".r.findFirstMatchIn(o.dict)
          ref <- """(\d+)\s+\d+\s+R""".r.findAllMatchIn(kids.group(1))
        } collectPageRefs(ref.group(1).toInt, objs, acc, seen, depth + 1)
      } else acc += num
    }
    acc.toSeq
  }

  private def pageText(page: PdfObj, objs: Map[Int, PdfObj]): String = {
    // /Contents is one indirect ref or an array of them; concatenate streams.
    val refs: Seq[Int] =
      """/Contents\s*\[([^\]]*)\]""".r.findFirstMatchIn(page.dict) match {
        case Some(arr) =>
          """(\d+)\s+\d+\s+R""".r.findAllMatchIn(arr.group(1)).map(_.group(1).toInt).toSeq
        case None =>
          """/Contents\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(page.dict)
            .map(_.group(1).toInt).toSeq
      }
    val content = refs.flatMap(r => objs.get(r).flatMap(_.stream))
      .map(new String(_, StandardCharsets.ISO_8859_1)).mkString("\n")
    contentStreamText(content)
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    var done = false
    while (!done && !inf.finished()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else done = true // needs input/dictionary we don't have — stop cleanly
    }
    inf.end()
    out.toByteArray
  }

  /** Run the text-show operators of one page's content stream. */
  private[graft] def contentStreamText(cs: String): String = {
    val out = new StringBuilder
    val arr = new StringBuilder // strings accumulated inside a [...] TJ array
    var inArray = false
    var lastStr: String = null
    var i = 0
    def newline(): Unit =
      if (out.nonEmpty && out.charAt(out.length - 1) != '\n') out.append('\n')
    def showLast(): Unit = { if (lastStr != null) out.append(lastStr); lastStr = null }
    while (i < cs.length) {
      val c = cs.charAt(i)
      if (c == '%') { while (i < cs.length && cs.charAt(i) != '\n') i += 1 }
      else if (c == '(') {
        val (s, j) = parseLiteralString(cs, i)
        if (inArray) arr.append(s) else lastStr = s
        i = j
      } else if (c == '<' && i + 1 < cs.length && cs.charAt(i + 1) == '<') i += 2
      else if (c == '<') {
        val (s, j) = parseHexString(cs, i)
        if (inArray) arr.append(s) else lastStr = s
        i = j
      } else if (c == '[') { inArray = true; arr.clear(); i += 1 }
      else if (c == ']') { inArray = false; i += 1 }
      else if (c.isWhitespace || c == '>' || c == ')' || c == '{' || c == '}') i += 1
      else {
        var j = i
        while (j < cs.length && !cs.charAt(j).isWhitespace &&
               !"()<>[]{}/%".contains(cs.charAt(j))) j += 1
        val tok = if (c == '/') { // name: consume the leading slash too
          val k = math.max(j, i + 1); val t = cs.substring(i, k); j = k; t
        } else cs.substring(i, j)
        tok match {
          case "Tj"       => showLast()
          case "TJ"       => out.append(arr); arr.clear()
          case "'" | "\"" => newline(); showLast()
          case "Td" | "TD" | "T*" | "ET" => newline()
          case t if inArray && t.nonEmpty &&
                    t.forall(ch => ch.isDigit || ch == '-' || ch == '.') =>
            // A kern wider than ~0.15em is a typeset space.
            try if (t.toDouble < -150) arr.append(' ') catch { case _: NumberFormatException => }
          case _ => ()
        }
        i = math.max(j, i + 1)
      }
    }
    out.toString
  }

  private def parseLiteralString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '\n' => i += 2 // escaped EOL = line continuation
            case d if d.isDigit => // up to 3 octal digits
              var j = i + 1
              while (j < s.length && j < i + 4 && s.charAt(j).isDigit) j += 1
              sb.append(Integer.parseInt(s.substring(i + 1, j), 8).toChar)
              i = j
            case other => sb.append(other); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' => depth -= 1; if (depth > 0) sb.append(')'); i += 1
        case ch  => sb.append(ch); i += 1
      }
    }
    (sb.toString, i)
  }

  private def parseHexString(s: String, start: Int): (String, Int) = {
    val end0 = s.indexOf('>', start + 1)
    val end = if (end0 < 0) s.length else end0
    val hex = s.substring(start + 1, end).filter(c => Character.digit(c, 16) >= 0)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val sb = new StringBuilder
    var i = 0
    while (i + 1 < padded.length + 1 && i + 2 <= padded.length) {
      sb.append(Integer.parseInt(padded.substring(i, i + 2), 16).toChar)
      i += 2
    }
    (sb.toString, math.min(end + 1, s.length))
  }

  // ------------------------------------------------------------------ DOCX

  /** DOCX is a zip whose main part is `word/document.xml`; text lives in
    * `<w:t>` runs inside `<w:p>` paragraphs. Paragraphs join with a blank
    * line, the same element-join the reference applies to unpaginated files
    * (files_document_reader.py:233-237). Returns "" for unparseable input.
    */
  def docxText(bytes: Array[Byte]): String =
    try zipEntry(bytes, "word/document.xml")
      .map(xml => docxParagraphs(xml).mkString("\n\n").trim)
      .getOrElse("")
    catch { case NonFatal(_) => "" }

  private[graft] def docxParagraphs(xml: String): Seq[String] = {
    val para = """(?s)<w:p(?:\s[^>]*)?>.*?</w:p>""".r
    val run = """(?s)<w:t(?:\s[^>]*)?>(.*?)</w:t>|<w:tab\s*/>|<w:br[^>]*/>""".r
    para.findAllIn(xml).map { p =>
      val sb = new StringBuilder
      run.findAllMatchIn(p).foreach { m =>
        val tok = m.matched
        if (tok.startsWith("<w:t")) sb.append(unescapeXml(m.group(1)))
        else if (tok.startsWith("<w:tab")) sb.append('\t')
        else sb.append('\n')
      }
      sb.toString.trim
    }.filter(_.nonEmpty).toSeq
  }

  // ------------------------------------------------------------------ PPTX

  /** PPTX → one element per slide, slide number as the page number (the same
    * shape Unstructured emits for presentations — the reference groups it by
    * pageNumber exactly like PDF, files_document_reader.py:239-246). Text
    * lives in `<a:t>` runs inside `ppt/slides/slideN.xml`; paragraphs
    * (`<a:p>`) join with newlines, slides are ordered by their number.
    * Returns Nil for unparseable input.
    */
  def pptxSlides(bytes: Array[Byte]): Seq[(Int, String)] =
    try {
      val slidePat = """ppt/slides/slide(\d+)\.xml""".r
      zipEntries(bytes) { name => slidePat.findFirstMatchIn(name).map(_.group(1).toInt) }
        .map { case (n, xml) => (n, pptxSlideText(xml)) }
        .filter(_._2.nonEmpty)
        .sortBy(_._1)
    } catch { case NonFatal(_) => Nil }

  private[graft] def pptxSlideText(xml: String): String = {
    val para = """(?s)<a:p(?:\s[^>]*)?>.*?</a:p>""".r
    val run = """(?s)<a:t(?:\s[^>]*)?>(.*?)</a:t>""".r
    para.findAllIn(xml).map { p =>
      run.findAllMatchIn(p).map(m => unescapeXml(m.group(1))).mkString
    }.map(_.trim).filter(_.nonEmpty).mkString("\n").trim
  }

  /** All zip entries whose name maps to Some(key), decoded as UTF-8. */
  private def zipEntries[K](bytes: Array[Byte])(select: String => Option[K]): Seq[(K, String)] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      val out = ListBuffer.empty[(K, String)]
      var e = zis.getNextEntry
      while (e != null) {
        select(e.getName).foreach { k =>
          out += ((k, new String(zis.readAllBytes(), StandardCharsets.UTF_8)))
        }
        e = zis.getNextEntry
      }
      out.toSeq
    } finally zis.close()
  }

  private def zipEntry(bytes: Array[Byte], name: String): Option[String] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var found: Option[String] = None
      var e = zis.getNextEntry
      while (e != null && found.isEmpty) {
        if (e.getName == name)
          found = Some(new String(zis.readAllBytes(), StandardCharsets.UTF_8))
        e = if (found.isEmpty) zis.getNextEntry else null
      }
      found
    } finally zis.close()
  }

  private def unescapeXml(s: String): String = {
    val ent = """&(amp|lt|gt|quot|apos|#x?[0-9a-fA-F]+);""".r
    ent.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(m.group(1) match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case code if code.startsWith("#x") || code.startsWith("#X") =>
        Integer.parseInt(code.drop(2), 16).toChar.toString
      case code => Integer.parseInt(code.drop(1)).toChar.toString
    }))
  }
}
