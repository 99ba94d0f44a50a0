package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Converters, DocFormats, FilesSource}
import graft.functions.TextSplitter

/** DocFormats (S5 PDF/DOCX leg): the from-scratch extractors against
  * hand-assembled fixtures, then end-to-end through FilesSource + the files
  * converter asserting per-page chunks carry pageNumber metadata the way the
  * reference builds them (files_document_reader.py:227-246,
  * files_document_converter.py:36-50).
  */
class DocFormatsSpec extends AnyFunSuite with SparkSuite {

  // ------------------------------------------------------- fixture builders

  private def deflate(s: String): Array[Byte] = {
    val d = new Deflater()
    d.setInput(s.getBytes(StandardCharsets.ISO_8859_1)); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** Two-page PDF: page 1 Flate-compressed (Tj + Td line break), page 2 raw
    * (TJ with a wide kern, a hex string, and a ' next-line-show operator).
    */
  private def twoPagePdf(): Array[Byte] = {
    val p1z = deflate("BT /F1 12 Tf 72 720 Td (Hello PDF) Tj 0 -14 Td (Second line) Tj ET")
    val p2 = "BT /F1 12 Tf 72 720 Td [(Widely) -400 (spaced) -20 (!)] TJ " +
      "T* <48657821> Tj (apostrophe line) ' ET"
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj\n")
    w("4 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    w(s"5 0 obj << /Length ${p1z.length} /Filter /FlateDecode >> stream\n")
    out.write(p1z) // raw bytes — must not pass through any string templating
    w("\nendstream endobj\n")
    w(s"6 0 obj << /Length ${p2.length} >> stream\n")
    w(p2)
    w("\nendstream endobj\n%%EOF")
    out.toByteArray
  }

  private def docx(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map { p =>
      s"""<w:p w14:paraId="X"><w:r><w:t xml:space="preserve">$p</w:t></w:r></w:p>"""
    }.mkString
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
         |<w:body>$body</w:body></w:document>""".stripMargin
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    z.putNextEntry(new ZipEntry("[Content_Types].xml"))
    z.write("<Types/>".getBytes(StandardCharsets.UTF_8)); z.closeEntry()
    z.putNextEntry(new ZipEntry("word/document.xml"))
    z.write(xml.getBytes(StandardCharsets.UTF_8)); z.closeEntry()
    z.close()
    out.toByteArray
  }

  private def pptx(slides: Seq[Seq[String]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    z.putNextEntry(new ZipEntry("[Content_Types].xml"))
    z.write("<Types/>".getBytes(StandardCharsets.UTF_8)); z.closeEntry()
    slides.zipWithIndex.foreach { case (paras, i) =>
      val body = paras.map(p => s"<a:p><a:r><a:t>$p</a:t></a:r></a:p>").mkString
      val xml = s"""<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
                   |<p:txBody>$body</p:txBody></p:sld>""".stripMargin
      z.putNextEntry(new ZipEntry(s"ppt/slides/slide${i + 1}.xml"))
      z.write(xml.getBytes(StandardCharsets.UTF_8)); z.closeEntry()
    }
    z.close()
    out.toByteArray
  }

  private def odt(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map(p => s"""<text:p text:style-name="P1">$p</text:p>""").mkString
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<office:document-content xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
         |<office:body><office:text>$body</office:text></office:body>
         |</office:document-content>""".stripMargin
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    z.putNextEntry(new ZipEntry("mimetype"))
    z.write("application/vnd.oasis.opendocument.text".getBytes(StandardCharsets.UTF_8))
    z.closeEntry()
    z.putNextEntry(new ZipEntry("content.xml"))
    z.write(xml.getBytes(StandardCharsets.UTF_8)); z.closeEntry()
    z.close()
    out.toByteArray
  }

  /** XLSX with a shared-string table and two sheets; sheet 2 exercises
    * inline strings and numeric cells.
    */
  private def xlsx(): Array[Byte] = {
    val shared =
      """<?xml version="1.0"?><sst count="3" uniqueCount="3">
        |<si><t>Region</t></si>
        |<si><t>Revenue</t></si>
        |<si><r><t>EM</t></r><r><t>EA</t></r></si></sst>""".stripMargin
    val sheet1 =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>1250.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val sheet2 =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>Notes &amp; totals</t></is></c>
        |<c r="B1"><v>42</v></c><c r="C1"/></row>
        |</sheetData></worksheet>""".stripMargin
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(StandardCharsets.UTF_8)); z.closeEntry()
    }
    entry("[Content_Types].xml", "<Types/>")
    entry("xl/sharedStrings.xml", shared)
    entry("xl/worksheets/sheet1.xml", sheet1)
    entry("xl/worksheets/sheet2.xml", sheet2)
    z.close()
    out.toByteArray
  }

  /** EPUB whose spine order (ch2 before ch1) disagrees with manifest order,
    * with an OPF-relative `../text/…` href, a URL-encoded href, and a
    * non-spine item (cover) that must not surface.
    */
  private def epub(): Array[Byte] = {
    val container =
      """<?xml version="1.0"?><container version="1.0">
        |<rootfiles><rootfile full-path="OEBPS/ops/content.opf"
        |  media-type="application/oebps-package+xml"/></rootfiles>
        |</container>""".stripMargin
    val opf =
      """<?xml version="1.0"?><package version="3.0">
        |<manifest>
        |<item id="ch1" href="../text/chapter%201.xhtml" media-type="application/xhtml+xml"/>
        |<item id="ch2" href="../text/ch2.xhtml" media-type="application/xhtml+xml"/>
        |<item id="cover" href="../text/cover.xhtml" media-type="application/xhtml+xml"/>
        |</manifest>
        |<spine><itemref idref="ch2"/><itemref idref="ch1"/></spine>
        |</package>""".stripMargin
    def chap(title: String, body: String) =
      s"""<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/xhtml">
         |<head><title>$title</title><style>p {color: red}</style></head>
         |<body><h1>$title</h1><p>$body</p></body></html>""".stripMargin
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(StandardCharsets.UTF_8)); z.closeEntry()
    }
    entry("mimetype", "application/epub+zip")
    entry("META-INF/container.xml", container)
    entry("OEBPS/ops/content.opf", opf)
    entry("OEBPS/text/chapter 1.xhtml", chap("Chapter One", "It begins quietly."))
    entry("OEBPS/text/ch2.xhtml", chap("Chapter Two", "It continues loudly."))
    entry("OEBPS/text/cover.xhtml", chap("Cover", "Cover art alt text"))
    z.close()
    out.toByteArray
  }

  // ------------------------------------------------------------- unit level

  test("pdfPages: page order, Flate + raw streams, Tj/TJ/hex/quote operators") {
    val pages = DocFormats.pdfPages(twoPagePdf())
    assert(pages.map(_._1) === Seq(1, 2))
    assert(pages(0)._2 === "Hello PDF\nSecond line")
    // -400 kern → space; -20 kern → glued; hex <48657821> → "Hex!"
    assert(pages(1)._2 === "Widely spaced!\nHex!\napostrophe line")
  }

  test("pdfPages: literal-string escapes and nested parens") {
    val cs = """BT (a\(nested\) \\ two\nlines \101) Tj ET"""
    assert(DocFormats.contentStreamText(cs) === "a(nested) \\ two\nlines A\n")
  }

  test("pdfPages: garbage input degrades to empty, not an exception") {
    assert(DocFormats.pdfPages("not a pdf at all".getBytes) === Nil)
    assert(DocFormats.pdfPages(Array[Byte](0x25, 0x50, 0x44, 0x46)) === Nil)
  }

  test("pdfPages: cyclic /Kids page tree terminates and yields the real page") {
    // Root /Pages lists itself and its own parent among /Kids — a malformed
    // (or malicious) cycle that must not StackOverflow the task; the walk
    // skips visited objects and still reaches the one genuine page.
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [2 0 R 3 0 R 1 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Pages /Kids [2 0 R 4 0 R] >> endobj\n" +
      "4 0 obj << /Type /Page /Parent 3 0 R /Contents 5 0 R >> endobj\n" +
      "5 0 obj << /Length 40 >> stream\n" +
      "BT /F1 12 Tf 72 720 Td (Survivor) Tj ET\n" +
      "endstream endobj\n%%EOF").getBytes(StandardCharsets.ISO_8859_1)
    assert(DocFormats.pdfPages(pdf).map(_._2) === Seq("Survivor"))
  }

  test("docxText: paragraphs join with blank line, entities unescape") {
    val bytes = docx(Seq("First paragraph", "Fish &amp; chips &#33;"))
    assert(DocFormats.docxText(bytes) === "First paragraph\n\nFish & chips !")
    assert(DocFormats.docxText("junk".getBytes) === "")
  }

  test("pptxSlides: one element per slide in slide order, runs concatenate") {
    val bytes = pptx(Seq(
      Seq("Title slide", "subtitle here"),
      Seq("Agenda &amp; goals")))
    val slides = DocFormats.pptxSlides(bytes)
    assert(slides === Seq(
      (1, "Title slide\nsubtitle here"),
      (2, "Agenda & goals")))
    assert(DocFormats.pptxSlides("junk".getBytes) === Nil)
  }

  test("odtText: paragraphs and headings, space/tab/line-break elements, spans strip") {
    val bytes = odt(Seq(
      """Plain<text:span text:style-name="T1"> styled</text:span> run""",
      """Counted<text:s text:c="3"/>spaces and<text:tab/>tab""",
      "Break<text:line-break/>here &amp; entity"))
    val t = DocFormats.odtText(bytes)
    assert(t.contains("Plain styled run"))
    assert(t.contains("Counted   spaces and\ttab"))
    assert(t.contains("Break\nhere & entity"))
    // headings participate in document order too
    val withHeading = odt(Nil).length // keep builder exercised
    assert(withHeading > 0)
    val headXml =
      """<office:text><text:h text:outline-level="1">Title</text:h>
        |<text:p>Body</text:p></office:text>""".stripMargin
    assert(DocFormats.odtParagraphs(headXml) === Seq("Title", "Body"))
  }

  test("xlsxSheets: shared strings, rich text, inline strings, numeric cells") {
    val sheets = DocFormats.xlsxSheets(xlsx())
    assert(sheets.map(_._1) === Seq(1, 2))
    val s1 = sheets.head._2
    assert(s1 === "Region\tRevenue\nEMEA\t1250.5")
    val s2 = sheets(1)._2
    assert(s2 === "Notes & totals\t42")
  }

  test("emlText: headers decode, multipart prefers text/plain, QP and base64 decode") {
    val qpBody = "Caf=C3=A9 budget =E2=82=AC100,=\nline continues"
    val b64 = java.util.Base64.getEncoder.encodeToString(
      "plain part wins".getBytes(StandardCharsets.UTF_8))
    val eml =
      s"""Subject: =?UTF-8?B?${java.util.Base64.getEncoder.encodeToString(
            "Re: Café plan".getBytes(StandardCharsets.UTF_8))}?=
         |From: alex@example.com
         |To: sam@example.com
         |Date: Tue, 1 Jul 2025 10:00:00 +0000
         |MIME-Version: 1.0
         |Content-Type: multipart/alternative; boundary="BOUND42"
         |
         |preamble to ignore
         |--BOUND42
         |Content-Type: text/plain; charset=utf-8
         |Content-Transfer-Encoding: base64
         |
         |$b64
         |--BOUND42
         |Content-Type: text/html; charset=utf-8
         |
         |<html><body><b>html part loses</b></body></html>
         |--BOUND42--
         |epilogue""".stripMargin
    val t = DocFormats.emlText(eml.getBytes(StandardCharsets.UTF_8))
    assert(t.contains("Subject: Re: Café plan"))
    assert(t.contains("From: alex@example.com"))
    assert(t.contains("plain part wins"))
    assert(!t.contains("html part loses"), "text/plain must be preferred")
    // single-part quoted-printable with explicit charset
    val qp =
      s"""Subject: simple
         |Content-Type: text/plain; charset=utf-8
         |Content-Transfer-Encoding: quoted-printable
         |
         |$qpBody""".stripMargin
    val t2 = DocFormats.emlText(qp.getBytes(StandardCharsets.UTF_8))
    assert(t2.contains("Café budget €100,line continues"))
    // html-only falls back to tag-stripped html
    val htmlOnly =
      """Subject: h
        |Content-Type: multipart/alternative; boundary=BB
        |
        |--BB
        |Content-Type: text/html
        |
        |<p>only html here</p>
        |--BB--""".stripMargin
    assert(DocFormats.emlText(htmlOnly.getBytes(StandardCharsets.UTF_8))
      .contains("only html here"))
  }

  test("rtfText: control words, groups, hex and unicode escapes, table skip") {
    // the \ u control word is assembled by concat — a literal 荤 in Scala
    // source would be consumed by the LEXER as a unicode escape, even inside
    // triple quotes
    val rtf = ("""{\rtf1\ansi{\fonttbl{\f0 Times New Roman;}}{\colortbl;\red0;}
      |{\*\generator Fake 1.0;}
      |First line\par Second\tab tabbed\par
      |Caf\'e9 and \""" + """u8364? symbol \{literal\}\par}""").stripMargin.replace("\n", " ")
    val t = DocFormats.rtfText(rtf.getBytes(StandardCharsets.UTF_8))
    assert(t.contains("First line"))
    assert(t.contains("Second\ttabbed"))
    assert(t.contains("Café and € symbol {literal}"))
    assert(!t.contains("Times New Roman"), "font table must be skipped")
    assert(!t.contains("Fake 1.0"), "\\* destinations must be skipped")
    assert(DocFormats.rtfText("not rtf at all".getBytes(StandardCharsets.UTF_8)) === "")
  }

  test("epubChapters: spine order wins, ../ and %20 hrefs resolve, cover excluded") {
    val chapters = DocFormats.epubChapters(epub())
    assert(chapters.map(_._1) === Seq(1, 2))
    // spine says ch2 first even though the manifest lists ch1 first
    assert(chapters(0)._2.contains("It continues loudly."))
    assert(chapters(1)._2.contains("It begins quietly."))
    assert(chapters(1)._2.contains("Chapter One")) // heading text survives
    assert(!chapters(0)._2.contains("color: red"), "style must strip")
    assert(!chapters.exists(_._2.contains("Cover art")), "non-spine item excluded")
  }

  test("epubChapters: falls back to xhtml entries when container.xml is absent") {
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    z.putNextEntry(new ZipEntry("c1.xhtml"))
    z.write("<html><body><p>Orphan chapter</p></body></html>"
      .getBytes(StandardCharsets.UTF_8)); z.closeEntry()
    z.close()
    val chapters = DocFormats.epubChapters(out.toByteArray)
    assert(chapters === Seq((1, "Orphan chapter")))
    assert(DocFormats.epubChapters("not a zip".getBytes(StandardCharsets.UTF_8)) === Nil)
  }

  test("parsers never throw on arbitrary bytes (fuzz: junk in, empty out)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // random bytes, plus adversarial strings containing parser keywords
    val junkGen = Gen.oneOf(
      Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue)),
      Gen.oneOf(
        "%PDF-1.4 1 0 obj stream endstream endobj",
        "%PDF-1.4 1 0 obj << /Type /Catalog /Pages 9 0 R >> endobj",
        "PK not a real zip",
        "<w:document><w:p><w:t>unclosed",
        "1 0 obj << /Filter /FlateDecode >> stream   endstream endobj",
        "{\\rtf1\\u99999999999 \\'zz {unclosed group",
        "Subject: =?bogus?B?###?=\nContent-Type: multipart/mixed; boundary=\n\n--",
        "<text:p>unclosed odt",
        "<row><c t=\"s\"><v>999</v></c></row>",
        "<rootfiles><rootfile full-path=\"missing.opf\"/></rootfiles>",
        "<spine><itemref idref=\"nowhere\"/></spine><item id=\"x\" href=\"../../..\"/>"
      ).map(_.getBytes(StandardCharsets.ISO_8859_1)))
    val prop = Prop.forAll(junkGen) { bytes =>
      // must return cleanly — Nil/"" — never throw
      DocFormats.pdfPages(bytes)
      DocFormats.docxText(bytes)
      DocFormats.pptxSlides(bytes)
      DocFormats.odtText(bytes)
      DocFormats.xlsxSheets(bytes)
      DocFormats.emlText(bytes)
      DocFormats.rtfText(bytes)
      DocFormats.epubChapters(bytes)
      true
    }
    val res = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  // -------------------------------------------------------------- e2e level

  test("files source e2e: PDF chunks carry pageNumber, DOCX text lands") {
    val tmp = Files.createTempDirectory("graft-docfmt")
    Files.write(tmp.resolve("report.pdf"), twoPagePdf())
    Files.write(tmp.resolve("memo.docx"), docx(Seq("Budget memo", "Numbers go up")))
    Files.write(tmp.resolve("deck.pptx"),
      pptx(Seq(Seq("Quarterly deck"), Seq("The numbers slide"))))

    val df = FilesSource.read(spark, tmp.toString)
    val docs = Converters.files(df, new TextSplitter(50, 0))
      .collect().map(r => r.getAs[String]("id") -> r).toMap

    val pdfChunks = docs("report.pdf")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("chunks")
    // header chunk (the relative path) has no page metadata
    assert(pdfChunks.head.getAs[String]("indexedData") === "report.pdf")
    val byPage = pdfChunks.tail.groupBy(
      _.getAs[Map[String, String]]("metadata").getOrElse("pageNumber", "?"))
    assert(byPage.keySet === Set("1", "2"))
    assert(byPage("1").exists(_.getAs[String]("indexedData").contains("Hello PDF")))
    assert(byPage("2").exists(_.getAs[String]("indexedData").contains("Widely spaced")))

    val docxDoc = docs("memo.docx")
    assert(docxDoc.getAs[String]("text").contains("Budget memo"))
    val docxChunks = docxDoc
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("chunks")
    assert(docxChunks.exists(_.getAs[String]("indexedData").contains("Numbers go up")))
    // unpaginated: no pageNumber key on docx chunks
    assert(docxChunks.forall(c =>
      !c.getAs[Map[String, String]]("metadata").contains("pageNumber")))

    val pptxChunks = docs("deck.pptx")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("chunks")
    val slidePages = pptxChunks.tail.map(
      _.getAs[Map[String, String]]("metadata").getOrElse("pageNumber", "?")).toSet
    assert(slidePages === Set("1", "2"))
    assert(pptxChunks.exists(_.getAs[String]("indexedData").contains("numbers slide")))
  }

  test("files source e2e: ODT, XLSX, EML and RTF are picked up and parsed") {
    val tmp = Files.createTempDirectory("graft-docfmt2")
    Files.write(tmp.resolve("notes.odt"),
      odt(Seq("Meeting notes from Tuesday", "Action items follow")))
    Files.write(tmp.resolve("fy.xlsx"), xlsx())
    val eml =
      """Subject: Weekly sync
        |From: a@example.com
        |Content-Type: text/plain; charset=utf-8
        |
        |Minutes attached inline here.""".stripMargin
    Files.write(tmp.resolve("mail.eml"), eml.getBytes(StandardCharsets.UTF_8))
    Files.write(tmp.resolve("legacy.rtf"),
      """{\rtf1\ansi Legacy memo body\par second line\par}"""
        .getBytes(StandardCharsets.UTF_8))

    val df = FilesSource.read(spark, tmp.toString)
    val docs = Converters.files(df, new TextSplitter(80, 0))
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(docs.keySet === Set("notes.odt", "fy.xlsx", "mail.eml", "legacy.rtf"))

    assert(docs("notes.odt").getAs[String]("text").contains("Meeting notes from Tuesday"))
    assert(docs("notes.odt").getAs[String]("text").contains("Action items follow"))

    // spreadsheet sheets arrive as pages: chunks carry sheet numbers
    val xlsxChunks = docs("fy.xlsx")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("chunks")
    val sheetPages = xlsxChunks.tail.map(
      _.getAs[Map[String, String]]("metadata").getOrElse("pageNumber", "?")).toSet
    assert(sheetPages === Set("1", "2"))
    assert(docs("fy.xlsx").getAs[String]("text").contains("EMEA\t1250.5"))

    val mail = docs("mail.eml").getAs[String]("text")
    assert(mail.contains("Subject: Weekly sync") && mail.contains("Minutes attached"))

    assert(docs("legacy.rtf").getAs[String]("text").contains("Legacy memo body"))
    assert(docs("legacy.rtf").getAs[String]("text").contains("second line"))
  }

  test("files source e2e: EPUB chapters arrive as pages in spine order") {
    val tmp = Files.createTempDirectory("graft-docfmt3")
    Files.write(tmp.resolve("novel.epub"), epub())

    val df = FilesSource.read(spark, tmp.toString)
    val docs = Converters.files(df, new TextSplitter(80, 0))
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(docs.keySet === Set("novel.epub"))

    val chunks = docs("novel.epub")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("chunks")
    val pages = chunks.tail.map(
      _.getAs[Map[String, String]]("metadata").getOrElse("pageNumber", "?")).toSet
    assert(pages === Set("1", "2"))
    val text = docs("novel.epub").getAs[String]("text")
    // spine order: ch2's text precedes ch1's
    assert(text.indexOf("It continues loudly.") < text.indexOf("It begins quietly."))
    assert(!text.contains("Cover art"))
  }
}
