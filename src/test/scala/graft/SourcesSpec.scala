package graft

import graft.functions.TextSplitter
import graft.sources.{CachedSource, Converters, FilesSource, RestPager}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Converter + source tests over the FIXTURES.md §2 payload shapes. */
class SourcesSpec extends AnyFunSuite with SparkSuite {

  private val splitter = new TextSplitter(100, 20)

  private def jsonDf(rows: String*) = {
    import spark.implicits._
    spark.read.json(rows.toDS)
  }

  // ------------------------------------------------------------------- Jira

  private val jiraIssue =
    """{"key": "PROJ-123",
      | "self": "https://jira.example.com/rest/api/latest/issue/10001",
      | "fields": {
      |   "summary": "Fix login bug",
      |   "description": "Steps to reproduce the issue in detail.",
      |   "comment": {"comments": [{"body": "I can reproduce this."}]},
      |   "created": "2026-01-05T08:00:00.000+0000",
      |   "updated": "2026-02-01T10:30:00.000+0000",
      |   "epic": {"key": "PROJ-100"},
      |   "parent": null,
      |   "status": {"name": "In Progress"},
      |   "priority": {"name": "High"},
      |   "assignee": {"emailAddress": "Dev@Example.com"},
      |   "reporter": {"emailAddress": "qa@example.com"},
      |   "issuetype": {"name": "Bug"}}}""".stripMargin

  test("jira converter: metadata, url, header chunk, text assembly") {
    val out = Converters.jira(jsonDf(jiraIssue), splitter).collect()(0)
    assert(out.getAs[String]("id") === "PROJ-123")
    assert(out.getAs[String]("url") === "https://jira.example.com/browse/PROJ-123")
    val md = out.getAs[Map[String, String]]("metadata")
    assert(md("project") === "PROJ")           // F9
    assert(md("assignee") === "dev@example.com") // F7 lowercased
    assert(md("epic") === "PROJ-100")
    assert(md("type") === "Bug")
    assert(md("createdAt") === "2026-01-05T08:00:00.000+0000")
    val text = out.getAs[String]("text")
    assert(text.startsWith("PROJ-123 : Fix login bug")) // F5 header
    assert(text.contains("Steps to reproduce"))
    assert(text.contains("I can reproduce this."))
    val chunks = out.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("chunks")
    assert(chunks.head.getAs[String]("indexedData") === "PROJ-123 : Fix login bug")
    assert(chunks.size > 1)
  }

  test("jira cloud converter: ADF description and comments") {
    val cloudIssue =
      """{"key": "PROJ-124", "self": "https://x.atlassian.net/rest/api/3/issue/2",
        | "fields": {"summary": "Cloud task",
        |   "created": "2026-01-01T00:00:00.000Z", "updated": "2026-01-02T00:00:00.000Z",
        |   "description": {"content": [{"content": [{"text": "Line one"}, {"text": "Line two"}]}]},
        |   "comment": {"comments": [{"body": {"content": [{"content": [{"text": "A comment"}]}]}}]},
        |   "status": {"name": "Open"}, "priority": null, "assignee": null,
        |   "epic": null, "parent": null,
        |   "reporter": {"emailAddress": "a@b.c"}, "issuetype": {"name": "Task"}}}""".stripMargin
    val out = Converters.jira(jsonDf(cloudIssue), splitter, cloud = true).collect()(0)
    val text = out.getAs[String]("text")
    assert(text.contains("Line one\nLine two")) // F3: two-level ADF collect
    assert(text.contains("A comment"))
    val md = out.getAs[Map[String, String]]("metadata")
    assert(!md.contains("priority") && !md.contains("assignee")) // nulls dropped
  }

  // -------------------------------------------------------------- Confluence

  private val confluencePage =
    """{"page": {
      |   "id": "98765", "title": "Deployment Guide",
      |   "ancestors": [{"title": "Engineering"}, {"title": "Ops"}],
      |   "body": {"storage": {"value": "<p>Run <b>deploy.sh</b> &amp; wait</p>"}},
      |   "version": {"when": "2026-02-01T12:00:00.000Z"},
      |   "history": {"createdDate": "2026-01-01T00:00:00.000Z",
      |               "createdBy": {"username": "JDoe"}},
      |   "space": {"key": "ENG"},
      |   "_links": {"self": "https://conf.example.com/rest/api/content/98765",
      |              "webui": "/display/ENG/Deployment+Guide"}},
      | "comments": [{"body": {"storage": {"value": "<p>Works for me</p>"}}}]}""".stripMargin

  test("confluence converter: title path, html strip, comments") {
    val out = Converters.confluence(jsonDf(confluencePage), splitter).collect()(0)
    assert(out.getAs[String]("id") === "98765")
    assert(out.getAs[String]("url") ===
      "https://conf.example.com/display/ENG/Deployment+Guide") // F11
    val md = out.getAs[Map[String, String]]("metadata")
    assert(md("space") === "ENG")
    assert(md("createdBy") === "jdoe")
    val text = out.getAs[String]("text")
    assert(text.startsWith("Engineering -> Ops -> Deployment Guide")) // F4
    assert(text.contains("Run\ndeploy.sh")) // F2: node-per-line strip
    assert(text.contains("& wait"))         // entity decode
    assert(text.contains("Works for me"))
  }

  test("confluence cloud converter: page.content nesting + missing fields tolerated") {
    val cloudPage =
      """{"page": {"content": {
        |   "id": 4242, "title": "Cloud Page",
        |   "body": {"storage": {"value": "<p>cloud body</p>"}},
        |   "version": {"when": "2026-03-01T00:00:00.000Z"},
        |   "space": {"key": "CLD"},
        |   "_links": {"self": "https://x.atlassian.net/wiki/rest/api/content/4242",
        |              "webui": "/spaces/CLD/pages/4242"}}}}""".stripMargin
    val out = Converters.confluence(jsonDf(cloudPage), splitter, cloud = true).collect()(0)
    assert(out.getAs[String]("id") === "4242")
    assert(out.getAs[String]("url") === "https://x.atlassian.net/wiki/spaces/CLD/pages/4242")
    val md = out.getAs[Map[String, String]]("metadata")
    assert(md("space") === "CLD")
    assert(!md.contains("createdBy")) // no history in payload → dropped, no crash
    assert(out.getAs[String]("text").startsWith("Cloud Page")) // no ancestors → title only
    assert(out.getAs[String]("text").contains("cloud body"))
  }

  test("htmlToText strips scripts and decodes entities") {
    assert(Converters.htmlToText(
      "<div><script>alert(1)</script>Hello &lt;world&gt;</div>") === "Hello <world>")
    assert(Converters.htmlToText("") === "")
    assert(Converters.htmlToText(null) === "")
  }

  // ------------------------------------------------------------------- Files

  test("files source + converter: filters, folder metadata, per-page chunks") {
    val tmp = Files.createTempDirectory("graft-files")
    val sub = Files.createDirectories(tmp.resolve("docs/api"))
    Files.writeString(sub.resolve("intro.md"), "# Intro\n\nSome interesting text here")
    Files.writeString(tmp.resolve("readme.txt"), "top level file")
    Files.writeString(tmp.resolve("skip.exe"), "binary!")
    Files.writeString(tmp.resolve("notes.log"), "excluded by pattern")

    val df = FilesSource.read(spark, tmp.toString,
      includePatterns = Seq(".*"), excludePatterns = Seq(".*\\.log"))
    val rels = df.select("fileRelativePath").collect().map(_.getString(0)).sorted
    assert(rels === Array("docs/api/intro.md", "readme.txt")) // exe + log filtered

    val docs = Converters.files(df, splitter)
    val intro = docs.filter(col("id") === "docs/api/intro.md").collect()(0)
    val md = intro.getAs[Map[String, String]]("metadata")
    assert(md("folder1") === "docs" && md("folder2") === "api") // F10
    assert(!md.contains("folder3"))
    assert(intro.getAs[String]("url").startsWith("file:///"))
    val chunks = intro.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("chunks")
    assert(chunks.head.getAs[String]("indexedData") === "docs/api/intro.md") // header
    assert(chunks.exists(_.getAs[String]("indexedData").contains("interesting")))

    val top = docs.filter(col("id") === "readme.txt").collect()(0)
    assert(!top.getAs[Map[String, String]]("metadata").keys.exists(_.startsWith("folder")))
  }

  test("files source per-format parse dispatch: md, html, json") {
    val tmp = Files.createTempDirectory("graft-fmt")
    Files.writeString(tmp.resolve("guide.md"),
      "# Title\n\nSee [the docs](https://x.example) and **bold** text.\n\n- item one\n- item two\n\n```scala\nval code = 1\n```\n")
    Files.writeString(tmp.resolve("page.html"),
      "<html><head><style>p{color:red}</style></head><body><h1>Heading</h1><p>Para &amp; more</p></body></html>")
    Files.writeString(tmp.resolve("data.json"), """{"k": "json stays raw"}""")

    val byId = FilesSource.read(spark, tmp.toString)
      .select(col("fileRelativePath"), col("content")(0).getField("text").as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    val md = byId("guide.md")
    assert(md.startsWith("Title"))                  // header marker stripped
    assert(md.contains("See the docs and bold text."))  // link label + emphasis kept
    assert(md.contains("item one"))
    assert(!md.contains("```") && md.contains("val code = 1")) // fence stripped, code kept
    assert(!md.contains("#") && !md.contains("**"))

    val html = byId("page.html")
    assert(html.contains("Heading") && html.contains("Para & more"))
    assert(!html.contains("<") && !html.contains("color:red"))

    assert(byId("data.json") === """{"k": "json stays raw"}""")
  }

  test("files source mtime watermark pushdown") {
    val tmp = Files.createTempDirectory("graft-wm")
    Files.writeString(tmp.resolve("old.txt"), "old")
    val future = new java.sql.Timestamp(System.currentTimeMillis() + 3600 * 1000)
    val df = FilesSource.read(spark, tmp.toString, modifiedAfter = Some(future))
    assert(df.count() === 0)
  }

  // --------------------------------------------------------------- RestPager

  test("rest pager: token pagination with retry") {
    var fails = 2
    val pages = Map(
      None            -> RestPager.Page(Seq(1, 2), Some("t1")),
      Some("t1")      -> RestPager.Page(Seq(3, 4), Some("t2")),
      Some("t2")      -> RestPager.Page(Seq(5), None))
    val got = RestPager.readAll[Int]((cursor, _) => {
      if (cursor.contains("t1") && fails > 0) { fails -= 1; sys.error("flaky") }
      pages(cursor)
    }, RestPager.PagerConfig(retries = 3, retryDelayMillis = 1))
    assert(got === Seq(1, 2, 3, 4, 5))
  }

  test("rest pager: degrade to batch-1 and quarantine bad items") {
    // Offset cursors "0".."4"; item at offset 2 is poisoned even at batch size 1.
    def fetch(cursor: Option[String], batch: Int): RestPager.Page[String] = {
      val off = cursor.map(_.toInt).getOrElse(0)
      if (batch > 1) {
        if (off == 0) sys.error("big batch fails") // force degrade immediately
        else RestPager.Page((off until math.min(off + batch, 5)).map("i" + _),
          if (off + batch >= 5) None else Some((off + batch).toString))
      } else {
        if (off == 2) sys.error("poisoned item")
        if (off >= 5) RestPager.Page(Nil, None)
        else RestPager.Page(Seq("i" + off), if (off + 1 >= 5) None else Some((off + 1).toString))
      }
    }
    val got = RestPager.readAll[String](fetch,
      RestPager.PagerConfig(batchSize = 10, retries = 0, retryDelayMillis = 1,
        maxSkippedItemsInRow = 2))
    assert(got === Seq("i0", "i1", "i3", "i4")) // i2 quarantined
  }

  // ------------------------------------------------------------ CachedSource

  test("cached source: read-through, replay, invalidate") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-cache").toString
    val cache = new CachedSource(spark, tmp)
    var materializations = 0
    def src = { materializations += 1; Seq(1, 2, 3).toDF("x") }

    val a = cache.readThrough("cfg1")(src)
    assert(a.count() === 3 && materializations === 1)
    val b = cache.readThrough("cfg1")(src)
    assert(b.count() === 3 && materializations === 1) // replayed, not re-read
    assert(cache.configHash("cfg1") !== cache.configHash("cfg2"))
    cache.invalidate("cfg1")
    cache.readThrough("cfg1")(src)
    assert(materializations === 2)
  }
}
