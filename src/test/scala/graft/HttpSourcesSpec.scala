package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources._
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end REST connector tests against an in-process stub HTTP server:
  * stub → pager → converter → document rows, including the degrade-and-skip
  * path and the Confluence depth=all comments sub-scan with fallback.
  */
class HttpSourcesSpec extends AnyFunSuite with SparkSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val requests = mutable.ArrayBuffer.empty[String]

  private def params(ex: HttpExchange): Map[String, String] = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    q.split('&').filter(_.nonEmpty).map(_.split("=", 2)).map {
      case Array(k, v) => k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
      case Array(k)    => k -> ""
    }.toMap
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def jiraIssue(key: String): String =
    s"""{"key": "$key", "self": "$base/rest/api/latest/issue/$key",
       | "fields": {"summary": "Issue $key", "description": "Body of $key.",
       |   "comment": {"comments": []},
       |   "created": "2026-01-01T00:00:00.000+0000",
       |   "updated": "2026-01-02T00:00:00.000+0000",
       |   "status": {"name": "Open"}, "priority": {"name": "Low"},
       |   "reporter": {"emailAddress": "r@example.com"},
       |   "issuetype": {"name": "Task"}}}""".stripMargin

  private def confluencePage(id: Int, nComments: Int): String = {
    val inline = if (nComments == 0) "[]"
      else s"""[{"body": {"storage": {"value": "<p>inline comment</p>"}}}]"""
    s"""{"id": $id, "title": "Page $id",
       | "body": {"storage": {"value": "<p>Content of page $id</p>"}},
       | "ancestors": [{"title": "Root"}],
       | "history": {"createdDate": "2026-01-01T00:00:00Z", "createdBy": {"username": "Author"}},
       | "version": {"when": "2026-01-03T00:00:00Z"},
       | "space": {"key": "SP"},
       | "children": {"comment": {"size": $nComments, "results": $inline}},
       | "_links": {"self": "$base/rest/api/content/$id", "webui": "/display/SP/Page+$id"}}""".stripMargin
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    base = s"http://127.0.0.1:${server.getAddress.getPort}"

    // --- Jira Server: 5 issues, offset pagination; issue at startAt=3 is
    // poisoned when fetched in a batch of >1 AND ?poison=on (degrade test
    // uses a separate instance flag via query param in jql).
    server.createContext("/rest/api/latest/search", (ex: HttpExchange) => {
      val p = params(ex)
      requests += ex.getRequestURI.toString
      if (!ex.getRequestHeaders.containsKey("Authorization")) {
        respond(ex, 401, """{"error": "auth required"}""")
      } else {
        val startAt = p.getOrElse("startAt", "0").toInt
        val max = p.getOrElse("maxResults", "50").toInt
        val poison = p.getOrElse("jql", "").contains("poison")
        val total = 5
        if (poison && max > 1 && startAt <= 3 && startAt + max > 3) {
          respond(ex, 500, """{"error": "boom"}""")
        } else if (poison && max == 1 && startAt == 3) {
          respond(ex, 500, """{"error": "bad item"}""")
        } else {
          val issues = (startAt until math.min(startAt + max, total))
            .map(i => jiraIssue(s"PRJ-$i")).mkString(",")
          respond(ex, 200, s"""{"total": $total, "issues": [$issues]}""")
        }
      }
    })

    // --- Jira Cloud: token-cursor pagination, 2 pages.
    server.createContext("/rest/api/3/search/jql", (ex: HttpExchange) => {
      val p = params(ex)
      p.get("nextPageToken") match {
        case None =>
          respond(ex, 200,
            s"""{"issues": [${jiraIssue("CLD-1")}, ${jiraIssue("CLD-2")}],
               | "isLast": false, "nextPageToken": "tok-2"}""".stripMargin)
        case Some("tok-2") =>
          respond(ex, 200, s"""{"issues": [${jiraIssue("CLD-3")}], "isLast": true}""")
        case Some(other) => respond(ex, 400, s"""{"error": "bad token $other"}""")
      }
    })

    // --- Confluence Server search: 3 pages of content, offset pagination.
    server.createContext("/rest/api/content/search", (ex: HttpExchange) => {
      val p = params(ex)
      requests += ex.getRequestURI.toString
      val start = p.getOrElse("start", "0").toInt
      val limit = p.getOrElse("limit", "50").toInt
      val total = 3
      val pages = Seq(confluencePage(1, 0), confluencePage(2, 1), confluencePage(3, 2))
      val slice = pages.slice(start, math.min(start + limit, total)).mkString(",")
      respond(ex, 200, s"""{"results": [$slice], "totalSize": $total, "size": ${math.min(limit, total - start)}}""")
    })

    // --- Confluence per-page comments: page 2 serves depth=all fine; page 3's
    // endpoint fails → reader must fall back to inline comments.
    server.createContext("/rest/api/content/2/child/comment", (ex: HttpExchange) => {
      respond(ex, 200,
        """{"results": [
          |  {"body": {"storage": {"value": "<p>deep comment A</p>"}}},
          |  {"body": {"storage": {"value": "<p>deep reply B</p>"}}}],
          | "size": 2}""".stripMargin)
    })
    server.createContext("/rest/api/content/3/child/comment", (ex: HttpExchange) => {
      respond(ex, 500, """{"error": "comment scan broken"}""")
    })

    // --- Confluence Cloud search: cursor pagination via _links.next.
    server.createContext("/wiki/rest/api/search", (ex: HttpExchange) => {
      val p = params(ex)
      def item(id: Int) =
        s"""{"content": ${confluencePage(id, 0)}, "title": "Page $id"}"""
      p.get("cursor") match {
        case None =>
          respond(ex, 200,
            s"""{"results": [${item(10)}, ${item(11)}], "totalSize": 3,
               | "_links": {"next": "/wiki/rest/api/search?cql=x&cursor=cur%2B2"}}""".stripMargin)
        case Some("cur+2") =>
          respond(ex, 200, s"""{"results": [${item(12)}], "totalSize": 3, "_links": {}}""")
        case Some(other) => respond(ex, 400, s"""{"error": "bad cursor $other"}""")
      }
    })

    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def cfg = RestPager.PagerConfig(batchSize = 2, retries = 0, retryDelayMillis = 1)

  // ------------------------------------------------------------------ Jira S1

  test("jira server e2e: stub → pager → converter") {
    val src = JiraSource(base, "project = PRJ", token = Some("tkn"),
      login = None, password = None, config = cfg)
    val issues = src.fetchAll()
    assert(issues.size === 5)
    assert(src.count() === 5)
    val docs = Converters.jira(src.load(spark))
    val ids = docs.select("id").collect().map(_.getString(0)).sorted
    assert(ids === Array("PRJ-0", "PRJ-1", "PRJ-2", "PRJ-3", "PRJ-4"))
    val row = docs.filter(col("id") === "PRJ-2").collect()(0)
    assert(row.getAs[String]("text").contains("Body of PRJ-2."))
    assert(row.getAs[String]("url") === s"$base/browse/PRJ-2")
  }

  test("jira server degrade: failing batch retried one-by-one, bad item skipped") {
    val src = JiraSource(base, "project = PRJ AND poison", token = Some("tkn"),
      login = None, password = None, config = cfg)
    val issues = src.fetchAll()
    // Item at offset 3 is quarantined; the 4 good ones survive.
    val keys = src.load(spark).select("key").collect().map(_.getString(0)).sorted
    assert(keys === Array("PRJ-0", "PRJ-1", "PRJ-2", "PRJ-4"))
    assert(issues.size === 4)
  }

  test("jira server auth is sent and required") {
    val noAuth = new JiraSource(new HttpFetch(base), "q", cfg)
    // The pager degrades then gives up; the root cause is the 401.
    val e = intercept[RuntimeException](noAuth.fetchAll())
    val root = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .collectFirst { case h: Http.HttpStatusException => h }
    assert(root.isDefined && root.get.status === 401)
    assert(root.get.getMessage.contains("\"***\"")) // masked header in details
    intercept[IllegalArgumentException](
      JiraSource(base, "q", token = None, login = Some("u"), password = None))
  }

  test("cached load replays from parquet without re-fetching (S6 over S1)") {
    val src = JiraSource(base, "project = PRJ", token = Some("tkn"),
      login = None, password = None, config = cfg)
    val cache = new CachedSource(spark,
      java.nio.file.Files.createTempDirectory("graft-http-cache").toString)
    val cfgKey = "jira|" + base + "|project = PRJ"
    val before = requests.size
    assert(src.loadCached(spark, cache, cfgKey).count() === 5)
    val afterFirst = requests.size
    assert(afterFirst > before) // first load hits the stub
    assert(src.loadCached(spark, cache, cfgKey).count() === 5)
    assert(requests.size === afterFirst) // replay: no new HTTP requests
  }

  // ------------------------------------------------------------- Jira Cloud S2

  test("jira cloud e2e: nextPageToken pagination to isLast") {
    val src = JiraCloudSource(base, "project = CLD", "e@x.com", "tok",
      config = cfg, requireCloudHost = false)
    val docs = Converters.jira(src.load(spark))
    assert(docs.select("id").collect().map(_.getString(0)).sorted ===
      Array("CLD-1", "CLD-2", "CLD-3"))
    intercept[IllegalArgumentException](
      JiraCloudSource("http://not-cloud.example.com", "q", "e@x.com", "tok"))
  }

  // ------------------------------------------- Confluence Server S3 (+comments)

  test("confluence server e2e: CQL paging, inline comments, title path") {
    val src = new ConfluenceSource(new HttpFetch(base), "space = SP", config = cfg)
    assert(src.cql === "type=page AND (space = SP)")
    val docs = Converters.confluence(src.load(spark))
    assert(docs.count() === 3)
    val p3 = docs.filter(col("id") === "3").collect()(0)
    assert(p3.getAs[String]("text").startsWith("Root -> Page 3")) // F4 title path
    assert(p3.getAs[String]("text").contains("inline comment"))
  }

  test("confluence depth=all sub-scan with graceful fallback") {
    val src = new ConfluenceSource(new HttpFetch(base), "", readAllComments = true,
      config = cfg)
    assert(src.cql === "type=page")
    val rows = src.load(spark)
    val texts = Converters.confluence(rows).select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!texts("1").contains("comment"))           // no comments
    assert(texts("2").contains("deep comment A"))     // depth=all succeeded
    assert(texts("2").contains("deep reply B"))
    assert(texts("3").contains("inline comment"))     // sub-scan 500 → fallback
  }

  // ------------------------------------------------------ Confluence Cloud S4

  test("confluence cloud e2e: _links.next cursor pagination, content nesting") {
    val src = new ConfluenceCloudSource(new HttpFetch(base), "space = SP", config = cfg)
    val docs = Converters.confluence(src.load(spark), cloud = true)
    assert(docs.select("id").collect().map(_.getString(0)).sorted ===
      Array("10", "11", "12"))
  }
}
