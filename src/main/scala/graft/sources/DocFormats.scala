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

  // ------------------------------------------------------------------- ODT

  /** OpenDocument text: the same zip+XML shape as DOCX with `content.xml` as
    * the main part. Text lives in `<text:p>` paragraphs and `<text:h>`
    * headings (document order); `<text:s/>` is a run of spaces (`text:c`
    * count), `<text:tab/>` a tab, `<text:line-break/>` a newline; spans and
    * other inline markup strip to their content. Paragraphs join with a blank
    * line, matching [[docxText]]. Returns "" for unparseable input.
    */
  def odtText(bytes: Array[Byte]): String =
    try zipEntry(bytes, "content.xml")
      .map(xml => odtParagraphs(xml).mkString("\n\n").trim)
      .getOrElse("")
    catch { case NonFatal(_) => "" }

  private[graft] def odtParagraphs(xml: String): Seq[String] = {
    val para = """(?s)<text:(p|h)(\s[^>]*)?>(.*?)</text:\1>""".r
    para.findAllMatchIn(xml).map { m =>
      val inner = """<text:s\s+text:c="(\d+)"\s*/>""".r
        .replaceAllIn(m.group(3), mm => " " * mm.group(1).toInt)
        .replaceAll("""<text:s\s*/>""", " ")
        .replaceAll("""<text:tab[^>]*/>""", "\t")
        .replaceAll("""<text:line-break[^>]*/>""", "\n")
        .replaceAll("<[^>]*>", "")
      unescapeXml(inner).trim
    }.filter(_.nonEmpty).toSeq
  }

  // ------------------------------------------------------------------ XLSX

  /** XLSX → one element per sheet, sheet number as the page number (the
    * paginated shape, like [[pptxSlides]]). Cells resolve through the shared
    * string table (`t="s"`), inline strings (`t="inlineStr"`), or their raw
    * `<v>` value; a row joins its cells with tabs, a sheet its rows with
    * newlines — the TSV-ish rendering a text extractor emits for
    * spreadsheets. Returns Nil for unparseable input.
    */
  def xlsxSheets(bytes: Array[Byte]): Seq[(Int, String)] =
    try {
      val shared: Vector[String] =
        zipEntry(bytes, "xl/sharedStrings.xml").map { xml =>
          """(?s)<si>(.*?)</si>""".r.findAllMatchIn(xml).map { si =>
            // an <si> is either one <t> or rich-text runs of <r><t> pieces
            """(?s)<t(?:\s[^>]*)?>(.*?)</t>""".r.findAllMatchIn(si.group(1))
              .map(t => unescapeXml(t.group(1))).mkString
          }.toVector
        }.getOrElse(Vector.empty)
      val sheetPat = """xl/worksheets/sheet(\d+)\.xml""".r
      zipEntries(bytes) { name => sheetPat.findFirstMatchIn(name).map(_.group(1).toInt) }
        .map { case (n, xml) => (n, xlsxSheetText(xml, shared)) }
        .filter(_._2.nonEmpty)
        .sortBy(_._1)
    } catch { case NonFatal(_) => Nil }

  private[graft] def xlsxSheetText(xml: String, shared: Vector[String]): String = {
    val rowPat = """(?s)<row(?:\s[^>]*)?>(.*?)</row>""".r
    val cellPat = """(?s)<c(\s[^>]*)?(?:/>|>(.*?)</c>)""".r
    rowPat.findAllMatchIn(xml).map { r =>
      cellPat.findAllMatchIn(r.group(1)).map { c =>
        val attrs = Option(c.group(1)).getOrElse("")
        val body = Option(c.group(2)).getOrElse("")
        val t = """\bt="([^"]+)"""".r.findFirstMatchIn(attrs).map(_.group(1))
        t match {
          case Some("s") =>
            """(?s)<v>(.*?)</v>""".r.findFirstMatchIn(body)
              .flatMap(v => shared.lift(v.group(1).trim.toInt)).getOrElse("")
          case Some("inlineStr") =>
            """(?s)<t(?:\s[^>]*)?>(.*?)</t>""".r.findAllMatchIn(body)
              .map(tm => unescapeXml(tm.group(1))).mkString
          case _ =>
            """(?s)<v>(.*?)</v>""".r.findFirstMatchIn(body)
              .map(v => unescapeXml(v.group(1)).trim).getOrElse("")
        }
      }.mkString("\t").replaceAll("\t+$", "")
    }.filter(_.trim.nonEmpty).mkString("\n").trim
  }

  // ------------------------------------------------------------------- EML

  /** RFC 822 email → "Subject/From/To/Date header block + decoded body".
    * Handles folded headers, RFC 2047 encoded-words (B and Q), multipart
    * bodies (text/plain parts preferred, text/html tag-stripped otherwise,
    * nested multiparts recursed), quoted-printable and base64 transfer
    * encodings, and the declared charset. Returns "" for unparseable input.
    */
  def emlText(bytes: Array[Byte]): String =
    try {
      val raw = new String(bytes, StandardCharsets.ISO_8859_1)
      val (headers, body) = splitMessage(raw)
      val headerLines = Seq("Subject", "From", "To", "Date").flatMap { h =>
        headers.get(h.toLowerCase).map(v => s"$h: ${decodeEncodedWords(v).trim}")
      }
      val bodyText = partText(headers, body, depth = 0)
      (headerLines.mkString("\n") + "\n\n" + bodyText).trim
    } catch { case NonFatal(_) => "" }

  /** Header block (unfolded, lower-cased names) + body, split at the first
    * blank line.
    */
  private def splitMessage(raw: String): (Map[String, String], String) = {
    val norm = raw.replace("\r\n", "\n")
    val sep = norm.indexOf("\n\n")
    val (head, body) = if (sep < 0) (norm, "") else (norm.take(sep), norm.drop(sep + 2))
    val unfolded = head.replaceAll("\n[ \t]+", " ")
    val headers = unfolded.linesIterator.flatMap { l =>
      val i = l.indexOf(':')
      if (i <= 0) None else Some(l.take(i).trim.toLowerCase -> l.drop(i + 1).trim)
    }.toMap
    (headers, body)
  }

  private def partText(headers: Map[String, String], body: String, depth: Int): String = {
    if (depth > 8) return "" // nested-multipart bomb guard
    val ctype = headers.getOrElse("content-type", "text/plain")
    val ctypeLc = ctype.toLowerCase
    if (ctypeLc.startsWith("multipart/")) {
      val boundary = """boundary="?([^";\n]+)"?""".r
        .findFirstMatchIn(ctype).map(_.group(1)).getOrElse(return "")
      val marker = "--" + boundary
      val segments = body.split(java.util.regex.Pattern.quote(marker))
        .drop(1) // preamble
        .filterNot(_.startsWith("--")) // terminator
      val parts = segments.toSeq.map(s => splitMessage(s.stripPrefix("\n")))
        .map { case (h, b) => (h.getOrElse("content-type", "text/plain").toLowerCase, h, b) }
      val chosen = {
        val plains = parts.filter(_._1.startsWith("text/plain"))
        if (plains.nonEmpty) plains
        else parts.filter(p => p._1.startsWith("text/") || p._1.startsWith("multipart/"))
      }
      chosen.map { case (_, h, b) => partText(h, b, depth + 1) }
        .filter(_.nonEmpty).mkString("\n\n")
    } else if (ctypeLc.startsWith("text/")) {
      val decoded = headers.getOrElse("content-transfer-encoding", "").trim.toLowerCase match {
        case "base64" =>
          java.util.Base64.getMimeDecoder.decode(body.replaceAll("\\s", ""))
        case "quoted-printable" => decodeQuotedPrintable(body)
        case _ => body.getBytes(StandardCharsets.ISO_8859_1)
      }
      val cs = """charset="?([\w\-]+)"?""".r.findFirstMatchIn(ctypeLc)
        .map(_.group(1)).getOrElse("utf-8")
      val charset =
        try java.nio.charset.Charset.forName(cs)
        catch { case NonFatal(_) => StandardCharsets.UTF_8 }
      val text = new String(decoded, charset)
      if (ctypeLc.startsWith("text/html")) Converters.htmlToText(text) else text.trim
    } else "" // attachments and other media: not text
  }

  private[graft] def decodeQuotedPrintable(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    val t = s.replace("\r\n", "\n").replace("=\n", "") // soft line breaks
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '=' && i + 2 < t.length + 1 && i + 3 <= t.length &&
          Character.digit(t.charAt(i + 1), 16) >= 0 && Character.digit(t.charAt(i + 2), 16) >= 0) {
        out.write(Integer.parseInt(t.substring(i + 1, i + 3), 16))
        i += 3
      } else { out.write(c.toInt); i += 1 }
    }
    out.toByteArray
  }

  /** RFC 2047 `=?charset?B|Q?data?=` words in headers. */
  private[graft] def decodeEncodedWords(s: String): String = {
    val word = """=\?([\w\-]+)\?([BbQq])\?([^?]*)\?=""".r
    word.replaceAllIn(s, m => {
      val charset =
        try java.nio.charset.Charset.forName(m.group(1))
        catch { case NonFatal(_) => StandardCharsets.UTF_8 }
      val decoded = m.group(2).toUpperCase match {
        case "B" =>
          try new String(java.util.Base64.getDecoder.decode(m.group(3)), charset)
          catch { case NonFatal(_) => m.matched }
        case _ =>
          new String(decodeQuotedPrintable(m.group(3).replace('_', ' ')), charset)
      }
      java.util.regex.Matcher.quoteReplacement(decoded)
    })
  }

  // ------------------------------------------------------------------- RTF

  /** RTF → text: a control-word state machine. `\par`/`\line` break lines,
    * `\tab` tabs, `\'hh` decodes a cp1252-ish byte, `\uN` a unicode scalar
    * (honouring the `\ucN` replacement-skip count); destination groups that
    * carry no body text (font/color/style tables, info, pict, `{\*` …) are
    * skipped with full brace matching. Returns "" for unparseable input.
    */
  def rtfText(bytes: Array[Byte]): String =
    try {
      val s = new String(bytes, StandardCharsets.ISO_8859_1)
      if (!s.startsWith("{\\rtf")) return ""
      val skipDests = Set("fonttbl", "colortbl", "stylesheet", "info", "pict",
        "themedata", "colorschememapping", "datastore", "generator", "header",
        "footer", "xmlnstbl", "listtable", "listoverridetable", "latentstyles",
        "rsidtbl", "filetbl", "revtbl", "objdata", "fchars", "lchars")
      val out = new StringBuilder
      var i = 0
      var skipDepth = 0 // >0 while inside a skipped destination group
      var depth = 0
      var ucSkip = 1 // chars to skip after \uN (per RTF spec default)
      var pendingUcSkip = 0
      while (i < s.length) {
        val c = s.charAt(i)
        c match {
          case '{' => depth += 1; if (skipDepth > 0) skipDepth += 1; i += 1
          case '}' =>
            depth -= 1
            if (skipDepth > 0) skipDepth -= 1
            i += 1
          case '\\' if i + 1 < s.length =>
            val n = s.charAt(i + 1)
            if (n == '*') {
              // {\*\dest ...}: an "ignore if unknown" destination — skip group
              if (skipDepth == 0) skipDepth = 1
              i += 2
            } else if (n == '\'' && i + 3 < s.length + 1 && i + 4 <= s.length) {
              if (skipDepth == 0) {
                if (pendingUcSkip > 0) pendingUcSkip -= 1
                else try out.append(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar)
                  catch { case _: NumberFormatException => }
              }
              i += 4
            } else if (!n.isLetter) { // escaped literal: \{ \} \\ \~ …
              if (skipDepth == 0) out.append(n match {
                case '~' => ' '
                case '-' | '_' => '-'
                case other => other
              })
              i += 2
            } else {
              var j = i + 1
              while (j < s.length && s.charAt(j).isLetter) j += 1
              val wordEnd = j
              var numEnd = j
              if (numEnd < s.length && (s.charAt(numEnd) == '-' || s.charAt(numEnd).isDigit)) {
                numEnd += 1
                while (numEnd < s.length && s.charAt(numEnd).isDigit) numEnd += 1
              }
              val word = s.substring(i + 1, wordEnd)
              val num = if (numEnd > wordEnd) s.substring(wordEnd, numEnd) else ""
              // a single space after a control word is part of the word
              var next = numEnd
              if (next < s.length && s.charAt(next) == ' ') next += 1
              if (skipDepth == 0) word match {
                case _ if skipDests.contains(word) => skipDepth = 1
                case "par" | "line" | "sect" | "page" => out.append('\n')
                case "tab" | "cell" => out.append('\t')
                case "row" => out.append('\n')
                case "emdash" | "endash" => out.append('-')
                case "lquote" | "rquote" => out.append('\'')
                case "ldblquote" | "rdblquote" => out.append('"')
                case "uc" => ucSkip = try num.toInt catch { case _: NumberFormatException => 1 }
                case "u" =>
                  try {
                    val cp = num.toInt
                    out.append((if (cp < 0) cp + 65536 else cp).toChar)
                    pendingUcSkip = ucSkip
                  } catch { case _: NumberFormatException => }
                case _ => ()
              }
              i = next
            }
          case '\n' | '\r' => i += 1 // raw newlines are not text in RTF
          case ch =>
            if (skipDepth == 0) {
              if (pendingUcSkip > 0) pendingUcSkip -= 1 else out.append(ch)
            }
            i += 1
        }
      }
      out.toString.replaceAll("\n{3,}", "\n\n").trim
    } catch { case NonFatal(_) => "" }

  // ------------------------------------------------------------------ EPUB

  /** EPUB → one element per spine chapter, chapter ordinal (1-based) as the
    * page number — the paginated shape, like [[pptxSlides]]. Resolution chain
    * per OCF/OPF: `META-INF/container.xml` names the package (.opf) file; the
    * OPF `<manifest>` maps item ids to hrefs (relative to the OPF's own
    * directory, possibly URL-encoded); `<spine>` lists itemrefs in reading
    * order. Each chapter's XHTML strips to text with the shared HTML
    * semantics ([[Converters.htmlToText]]). When the container/OPF chain is
    * missing or unresolvable (malformed but still chapter-structured books),
    * falls back to every `.x?html`/`.htm` entry in archive order. Returns Nil
    * for unparseable input.
    */
  def epubChapters(bytes: Array[Byte]): Seq[(Int, String)] =
    try {
      val spineHrefs: Seq[String] = (for {
        container <- zipEntry(bytes, "META-INF/container.xml")
        opfPath <- """full-path="([^"]+)"""".r.findFirstMatchIn(container)
          .map(m => unescapeXml(m.group(1)))
        opf <- zipEntry(bytes, opfPath)
      } yield {
        val opfDir = opfPath.lastIndexOf('/') match {
          case -1 => ""
          case i  => opfPath.take(i + 1)
        }
        val items: Map[String, String] =
          """<item\s[^>]*>|<item\s[^>]*/>""".r.findAllIn(opf).flatMap { tag =>
            for {
              id <- """\bid="([^"]+)"""".r.findFirstMatchIn(tag).map(_.group(1))
              href <- """\bhref="([^"]+)"""".r.findFirstMatchIn(tag).map(_.group(1))
            } yield id -> normalizePath(opfDir + urlDecode(unescapeXml(href)))
          }.toMap
        """<itemref\s[^>]*\bidref="([^"]+)"""".r.findAllMatchIn(opf)
          .map(_.group(1)).flatMap(items.get).toSeq
      }).getOrElse(Nil)

      val chapters: Seq[String] =
        if (spineHrefs.nonEmpty) {
          val wanted = spineHrefs.toSet
          val found = zipEntries(bytes) { n => if (wanted(n)) Some(n) else None }.toMap
          spineHrefs.flatMap(found.get)
        } else
          zipEntries(bytes) { n =>
            val lc = n.toLowerCase
            if (lc.endsWith(".xhtml") || lc.endsWith(".html") || lc.endsWith(".htm"))
              Some(()) else None
          }.map(_._2)

      chapters.map(Converters.htmlToText).zipWithIndex
        .collect { case (t, i) if t.nonEmpty => (i + 1, t) }
    } catch { case NonFatal(_) => Nil }

  /** Resolve `.` and `..` segments (hrefs like `../text/ch1.xhtml`). */
  private def normalizePath(p: String): String =
    p.split('/').foldLeft(List.empty[String]) {
      case (acc, "" | ".") => acc
      case (_ :: tl, "..") => tl
      case (Nil, "..")     => Nil
      case (acc, seg)      => seg :: acc
    }.reverse.mkString("/")

  private def urlDecode(s: String): String =
    try java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)
    catch { case NonFatal(_) => s }

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
