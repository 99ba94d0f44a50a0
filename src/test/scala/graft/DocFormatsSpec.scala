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
}
