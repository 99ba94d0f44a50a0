package graft.sources

import graft.functions.TextSplitter
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source converters: raw Jira / Confluence / files payloads → canonical document
  * records (id, url, metadata, text, chunks) — the UDTF-shaped `convert` contract of
  * the reference (/root/reference/main/sources/base_document_converter.py:4-9),
  * re-expressed as declarative column transforms over parsed-JSON DataFrames.
  *
  * Scalar functions map 1:1 to SURVEY §2.8: HTML→text (F2), ADF→text (F3), title
  * path (F4), header chunk (F5), delimiter concat (F6), email lowercase (F7),
  * project key from issue key (F9), folder metadata (F10), URL builders (F11).
  *
  * Scale: converters are per-row column expressions + one splitter UDF — narrow,
  * no shuffle; a 100 TB document feed converts embarrassingly parallel.
  */
object Converters {

  import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

  /** Schema-aware nested access: real payloads omit fields or carry JSON null
    * (which JSON inference types as string), so `a.b.c` resolves to a typed column
    * only when every step exists as a struct field — otherwise a null literal.
    * Mirrors the reference's defensive `.get(...)` chains
    * (jira_document_converter.py:65-98).
    */
  private def pathType(dt: DataType, path: Seq[String]): Option[DataType] = path match {
    case Nil => Some(dt)
    case head +: rest => dt match {
      case st: StructType => st.find(_.name == head).flatMap(f => pathType(f.dataType, rest))
      case _ => None
    }
  }

  private def fieldOrNull(df: DataFrame, path: String*): Column =
    pathType(df.schema, path) match {
      case Some(_) => col(path.mkString("."))
      case None    => lit(null).cast("string")
    }

  /** Like [[fieldOrNull]] but yields an empty typed array when the path is missing
    * or isn't an array (for comments/ancestors lists).
    */
  private def arrayOrEmpty(df: DataFrame, path: String*): (Column, Option[DataType]) =
    pathType(df.schema, path) match {
      case Some(ArrayType(et, _)) => (coalesce(col(path.mkString(".")), array()), Some(et))
      case _ => (array(), None)
    }

  /** F2: HTML → text with the semantics of BeautifulSoup's
    * `get_text(separator="\n", strip=True)` (confluence_document_converter.py:62-68):
    * text nodes stripped and joined with newlines. Regex/state-machine stripper —
    * no HTML lib on the JVM classpath.
    */
  def htmlToText(html: String): String = {
    if (html == null) return ""
    val noScript = html.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val pieces = noScript.split("<[^>]*>")
    pieces.map(decodeEntities).map(_.trim).filter(_.nonEmpty).mkString("\n")
  }

  private def decodeEntities(s: String): String = s
    .replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&#39;", "'").replace("&apos;", "'")
    .replaceAll("&#(\\d+);", "") // rare numeric entities: drop
    .replace("&amp;", "&")

  val htmlToTextUdf = udf(htmlToText _)

  /** F3: Jira Cloud ADF (Atlassian Document Format) tree → text — collect
    * `content[].content[].text` two levels deep, join with newline
    * (jira_cloud_document_converter.py:67-76).
    */
  def adfToText(contentCol: Column): Column =
    array_join(
      flatten(transform(coalesce(contentCol, array()),
        block => transform(
          coalesce(block.getField("content"), array()),
          inline => coalesce(inline.getField("text"), lit(""))))),
      "\n")

  /** F6: join non-empty parts with a delimiter (reference joins doc text parts with
    * a blank line — jira_document_converter.py:62-63).
    */
  def joinNonEmpty(delim: String, parts: Column*): Column =
    array_join(filter(array(parts.map(p => coalesce(p, lit(""))): _*),
      p => length(p) > 0), delim)

  /** Splitter UDF shared by all converters: chunk 0 is the header, the rest split
    * from the body (files_document_converter.py:36-39 and jira :39-51).
    */
  private def chunksUdf(splitter: TextSplitter) =
    udf((header: String, body: String) =>
      (header +: splitter.split(if (body == null) "" else body))
        .map(s => graft.core.Model.Chunk(s)))

  // ---------------------------------------------------------------------- Jira

  /** Jira Server issues (parsed JSON rows shaped like FIXTURES.md §2) → documents.
    * Cites jira_document_converter.py:14-102.
    */
  def jira(issues: DataFrame, splitter: TextSplitter = TextSplitter.default,
           cloud: Boolean = false): DataFrame = {
    def fld(p: String*) = fieldOrNull(issues, p: _*)
    val description =
      if (cloud) adfToText(arrayOrEmpty(issues, "fields", "description", "content")._1)
      else coalesce(fld("fields", "description"), lit(""))
    val (commentsArr, commentElem) = arrayOrEmpty(issues, "fields", "comment", "comments")
    val commentHasAdf = commentElem.exists(et =>
      pathType(et, Seq("body", "content")).isDefined)
    val comments =
      if (cloud && commentHasAdf)
        array_join(transform(commentsArr,
          c => adfToText(c.getField("body").getField("content"))), "\n\n")
      else if (!cloud && commentElem.exists(et => pathType(et, Seq("body")).isDefined))
        array_join(transform(commentsArr,
          c => coalesce(c.getField("body"), lit(""))), "\n\n")
      else lit("")

    val header = concat_ws(" : ", col("key"), fld("fields", "summary")) // F5
    val body = joinNonEmpty("\n\n", description, comments)
    issues.select(
      col("key").as("id"),
      concat(regexp_extract(col("self"), "^(.*?)/rest/api/", 1),
        lit("/browse/"), col("key")).as("url"), // F11
      map_filter(map(
        lit("createdAt"), fld("fields", "created"),
        lit("createdBy"), lower(fld("fields", "reporter", "emailAddress")), // F7
        lit("lastModifiedAt"), fld("fields", "updated"),
        lit("project"), split(col("key"), "-").getItem(0), // F9
        lit("type"), fld("fields", "issuetype", "name"),
        lit("epic"), coalesce(fld("fields", "epic", "key"),
          fld("fields", "parent", "key")),
        lit("priority"), fld("fields", "priority", "name"),
        lit("assignee"), lower(fld("fields", "assignee", "emailAddress")),
        lit("status"), fld("fields", "status", "name")),
        (_, v) => v.isNotNull).as("metadata"),
      joinNonEmpty("\n\n", header, body).as("text"),
      chunksUdf(splitter)(header, body).as("chunks"))
  }

  // ----------------------------------------------------------------- Confluence

  /** Confluence pages (wrapper rows {page, comments[]} per FIXTURES.md §2) →
    * documents. Cites confluence_document_converter.py:17-83. `cloud = true`
    * reads the page from the cloud API's `page.content` nesting
    * (confluence_cloud_document_converter.py:19-30).
    */
  def confluence(pages: DataFrame, splitter: TextSplitter = TextSplitter.default,
                 cloud: Boolean = false): DataFrame = {
    val base: Seq[String] = if (cloud) Seq("page", "content") else Seq("page")
    def fld(p: String*) = fieldOrNull(pages, base ++ p: _*)
    val (ancestors, ancElem) = arrayOrEmpty(pages, base :+ "ancestors": _*)
    val titlePath = array_join( // F4
      concat(
        if (ancElem.exists(et => pathType(et, Seq("title")).isDefined))
          transform(ancestors, a => a.getField("title"))
        else array(),
        array(fld("title"))), " -> ")
    val bodyHtml = fld("body", "storage", "value")
    val (commentsArr, comElem) = arrayOrEmpty(pages, "comments")
    val commentHtml =
      if (comElem.exists(et => pathType(et, Seq("body", "storage", "value")).isDefined))
        transform(commentsArr, c => c.getField("body").getField("storage").getField("value"))
      else array()

    val pagesWithText = pages.select(
      fld("id").cast("string").as("id"),
      concat(regexp_extract(fld("_links", "self"), "^(.*?)/rest/api/", 1),
        fld("_links", "webui")).as("url"), // F11
      map_filter(map(
        lit("createdAt"), fld("history", "createdDate"),
        lit("createdBy"), lower(fld("history", "createdBy", "username")),
        lit("lastModifiedAt"), fld("version", "when"),
        lit("space"), fld("space", "key")),
        (_, v) => v.isNotNull).as("metadata"),
      titlePath.as("header"),
      htmlToTextUdf(bodyHtml).as("bodyText"),
      array_join(transform(commentHtml, h => htmlToTextUdf(h)), "\n\n").as("commentText"))

    pagesWithText.select(
      col("id"), col("url"), col("metadata"),
      joinNonEmpty("\n\n", col("header"), col("bodyText"), col("commentText")).as("text"),
      chunksUdf(splitter)(col("header"),
        joinNonEmpty("\n\n", col("bodyText"), col("commentText"))).as("chunks"))
  }

  // ---------------------------------------------------------------------- Files

  /** Files reader output ({fileRelativePath, fileFullPath, createdTime,
    * modifiedTime, content[{metadata{pageNumber}, text}]}) → documents with
    * folder1..folderN metadata (F10) and per-page chunks carrying pageNumber
    * (files_document_converter.py:16-58).
    */
  def files(filesDf: DataFrame, splitter: TextSplitter = TextSplitter.default): DataFrame = {
    val perPageChunks = udf(
      (relPath: String, pages: Seq[org.apache.spark.sql.Row]) => {
        val header = graft.core.Model.Chunk(relPath)
        val rest = pages.flatMap { r =>
          val pageMeta = Option(r.getAs[org.apache.spark.sql.Row]("metadata"))
            .flatMap(m => Option(m.getAs[Any]("pageNumber")))
            .map(pn => Map("pageNumber" -> pn.toString)).getOrElse(Map.empty[String, String])
          splitter.split(Option(r.getAs[String]("text")).getOrElse(""))
            .map(s => graft.core.Model.Chunk(s, pageMeta))
        }
        header +: rest
      })

    val folders = filter(slice(split(col("fileRelativePath"), "/"), lit(1),
      greatest(size(split(col("fileRelativePath"), "/")) - 1, lit(0))), f => length(f) > 0)
    filesDf.select(
      col("fileRelativePath").as("id"),
      concat(lit("file://"), col("fileFullPath")).as("url"), // F11
      map_concat(
        map(lit("createdAt"), col("createdTime"),
            lit("lastModifiedAt"), col("modifiedTime")),
        map_from_arrays( // F10: folder1..folderN
          transform(folders, (_, i) => concat(lit("folder"), i + 1)),
          folders)).as("metadata"),
      concat_ws("\n\n",
        concat_ws("\n\n", array(col("fileRelativePath"))),
        array_join(transform(coalesce(col("content"), array()),
          c => coalesce(c.getField("text"), lit(""))), "\n\n")).as("text"),
      perPageChunks(col("fileRelativePath"), coalesce(col("content"), array())).as("chunks"))
  }
}
