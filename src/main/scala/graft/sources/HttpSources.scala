package graft.sources

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

import scala.jdk.CollectionConverters._
import scala.util.Try

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Live HTTP wiring for the REST connectors (S1–S4). [[RestPager]] supplies the
  * pagination / retry / degrade-and-skip engine; this file supplies the actual
  * fetch functions over `java.net.http` plus the per-API envelope parsing:
  *
  *  - Jira Server: offset pages over /rest/api/latest/search
  *    (jira_document_reader.py:61-90)
  *  - Jira Cloud: nextPageToken/isLast over /rest/api/3/search/jql
  *    (jira_cloud_document_reader.py:66-106)
  *  - Confluence Server: CQL offset pages over /rest/api/content/search, plus the
  *    per-page depth=all comments sub-scan with graceful fallback
  *    (confluence_document_reader.py:42-139)
  *  - Confluence Cloud: cursor from _links.next over /wiki/rest/api/search
  *    (confluence_cloud_document_reader.py:112-161)
  *
  * Items come back as raw JSON strings; [[RestSource.load]] parallelizes them
  * into a DataFrame via `spark.read.json`, after which the [[Converters]] take
  * over. The driver-side fetch matches the reference's architecture — REST
  * pagination is sequential per source by protocol; Spark parallelism starts at
  * parse/convert/index time.
  */
object Http {

  /** Non-2xx response, with Authorization masked like the reference's
    * raise_for_status_with_details (utils/requests.py:18-49).
    */
  final class HttpStatusException(val status: Int, val url: String, val body: String)
    extends RuntimeException(
      s"""HTTP request failed: {"request": {"url": "$url", "headers": {"Authorization": "***"}}, "response": {"status": $status, "body": ${Json.quote(body)}}}""")

  val mapper = new ObjectMapper()
}

private[sources] object Json {
  def quote(s: String): String =
    Http.mapper.writeValueAsString(if (s == null) "" else s)
}

/** Minimal GET-JSON client: query-param encoding, bearer or basic auth, fixed
  * timeout, status check with masked details.
  */
final class HttpFetch(
    baseUrl: String,
    bearerToken: Option[String] = None,
    basicAuth: Option[(String, String)] = None,
    timeoutSeconds: Int = 60,
    extraHeaders: Map[String, String] = Map.empty) {

  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds.toLong))
    .build()

  private def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8)

  def url(path: String, params: Seq[(String, String)]): String = {
    val q = params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    if (q.isEmpty) s"$baseUrl$path" else s"$baseUrl$path?$q"
  }

  def getJson(path: String, params: Seq[(String, String)]): JsonNode = {
    val u = url(path, params)
    val builder = HttpRequest.newBuilder(URI.create(u))
      .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
      .header("Accept", "application/json")
      .GET()
    bearerToken.foreach(t => builder.header("Authorization", s"Bearer $t"))
    basicAuth.foreach { case (user, pass) =>
      val cred = Base64.getEncoder.encodeToString(
        s"$user:$pass".getBytes(StandardCharsets.UTF_8))
      builder.header("Authorization", s"Basic $cred")
    }
    extraHeaders.foreach { case (k, v) => builder.header(k, v) }
    val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new Http.HttpStatusException(resp.statusCode(), u, resp.body())
    Http.mapper.readTree(resp.body())
  }
}

/** A paged REST source producing raw item-JSON strings. */
trait RestSource {
  def fetchAll(): Seq[String]

  /** Fetched items → DataFrame with inferred schema, ready for [[Converters]]. */
  def load(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val items = fetchAll()
    if (items.isEmpty) spark.emptyDataFrame
    else spark.read.json(spark.createDataset(items))
  }

  /** [[load]] through the S6 read-through cache: the same `config` key replays
    * the staged parquet without touching the REST API (the reference's
    * document_cache_reader_decorator composed over any reader the same way).
    */
  def loadCached(spark: SparkSession, cache: CachedSource, config: String): DataFrame =
    cache.readThrough(config)(load(spark))

  protected def nodeText(n: JsonNode): String = Http.mapper.writeValueAsString(n)
}

/** S1 — Jira Server: JQL offset pagination; continues while startAt < total
  * (jira_document_reader.py:61-73, batch.py:18-52). Requires a bearer token or
  * login/password, like the reference's constructor check.
  */
final class JiraSource(
    http: HttpFetch, jql: String,
    config: RestPager.PagerConfig = RestPager.PagerConfig()) extends RestSource {

  // The field list the reference always requests (jira_document_reader.py:35).
  val fields = "summary,description,comment,created,updated,epic,parent,status,priority,assignee,reporter,issuetype"

  def fetchAll(): Seq[String] =
    RestPager.readAll[String]((cursor, batchSize) => {
      val startAt = cursor.map(_.toLong).getOrElse(0L)
      val resp = http.getJson("/rest/api/latest/search", Seq(
        "jql" -> jql, "startAt" -> startAt.toString,
        "maxResults" -> batchSize.toString, "fields" -> fields))
      val issues = resp.path("issues").elements().asScala.toVector
      val total = resp.path("total").asLong(0L)
      val next = startAt + issues.size
      // Empty-page guard: a server that under-reports pages must not spin.
      val nextCursor =
        if (issues.nonEmpty && next < total) Some(next.toString) else None
      RestPager.Page(issues.map(nodeText), nextCursor)
    }, config)

  def count(): Long =
    http.getJson("/rest/api/latest/search",
      Seq("jql" -> jql, "startAt" -> "0", "maxResults" -> "1"))
      .path("total").asLong(0L)
}

object JiraSource {
  /** Constructor guard of the reference (jira_document_reader.py:21-23). */
  def apply(baseUrl: String, jql: String, token: Option[String],
            login: Option[String], password: Option[String],
            config: RestPager.PagerConfig = RestPager.PagerConfig()): JiraSource = {
    require(token.isDefined || (login.isDefined && password.isDefined),
      "Either 'token' or both 'login' and 'password' must be provided.")
    new JiraSource(
      new HttpFetch(baseUrl, bearerToken = token,
        basicAuth = login.zip(password)), jql, config)
  }
}

/** S2 — Jira Cloud: token-cursor pagination; done when isLast (default true)
  * (jira_cloud_document_reader.py:66-81).
  */
final class JiraCloudSource(
    http: HttpFetch, jql: String,
    config: RestPager.PagerConfig = RestPager.PagerConfig()) extends RestSource {

  val fields = "summary,description,comment,created,updated,epic,parent,status,priority,assignee,reporter,issuetype"

  def fetchAll(): Seq[String] =
    RestPager.readAll[String]((cursor, _) => {
      val params = Seq("jql" -> jql, "fields" -> fields) ++
        cursor.map("nextPageToken" -> _)
      val resp = http.getJson("/rest/api/3/search/jql", params)
      val issues = resp.path("issues").elements().asScala.toVector
      val isLast = !resp.has("isLast") || resp.get("isLast").asBoolean(true)
      val nextCursor =
        if (isLast) None
        else Option(resp.get("nextPageToken")).filter(!_.isNull).map(_.asText)
      RestPager.Page(issues.map(nodeText), nextCursor)
    }, config)
}

object JiraCloudSource {
  /** Cloud constructor guards (jira_cloud_document_reader.py:20-26). */
  def apply(baseUrl: String, jql: String, email: String, apiToken: String,
            config: RestPager.PagerConfig = RestPager.PagerConfig(),
            requireCloudHost: Boolean = true): JiraCloudSource = {
    require(email.nonEmpty && apiToken.nonEmpty,
      "Both 'email' and 'api_token' must be provided for Jira Cloud.")
    if (requireCloudHost)
      require(baseUrl.endsWith(".atlassian.net"),
        "Base URL must be a Jira Cloud URL (ending with .atlassian.net)")
    new JiraCloudSource(
      new HttpFetch(baseUrl, basicAuth = Some((email, apiToken))), jql, config)
  }
}

/** Shared Confluence machinery: CQL page query building, the {page, comments}
  * wrapper the converters consume, and the depth=all comments sub-scan with
  * graceful fallback (confluence_document_reader.py:42-107).
  */
abstract class ConfluenceSourceBase(
    http: HttpFetch, userQuery: String, readAllComments: Boolean,
    config: RestPager.PagerConfig) extends RestSource {

  /** type=page AND (<user query>) — build_page_query (confluence_document_reader.py:70-75). */
  val cql: String =
    if (userQuery == null || userQuery.isEmpty) "type=page"
    else s"type=page AND ($userQuery)"

  // First-level comments ride along in `expand`; depth=all needs the sub-scan
  // (confluence_document_reader.py:33-35).
  protected def expand: String =
    if (readAllComments) "body.storage,ancestors,version,space,history,children.comment"
    else "body.storage,ancestors,version,space,history,children.comment.body.storage"

  /** Path prefix ("" for Server, "/wiki" for Cloud). */
  protected def apiPrefix: String
  /** The search endpoint path. */
  protected def searchPath: String
  /** The node holding the page content within a search item ("" = item itself;
    * Cloud items nest it under `content`).
    */
  protected def contentNode(item: JsonNode): JsonNode

  private def inlineComments(item: JsonNode): Vector[JsonNode] =
    contentNode(item).path("children").path("comment").path("results")
      .elements().asScala.toVector

  /** depth=all paged comment read; on any failure, falls back to the inline
    * first-level results (confluence_document_reader.py:103-107). The paged
    * read mirrors the reference's envelope contract, including using the
    * response `size` as the batch total.
    */
  private def allComments(item: JsonNode): Vector[JsonNode] = {
    val content = contentNode(item)
    if (content.path("children").path("comment").path("size").asInt(0) == 0)
      return Vector.empty
    if (!readAllComments) return inlineComments(item)
    val id = content.path("id").asText()
    Try {
      RestPager.readAll[JsonNode]((cursor, batchSize) => {
        val startAt = cursor.map(_.toLong).getOrElse(0L)
        val resp = http.getJson(s"$apiPrefix/rest/api/content/$id/child/comment", Seq(
          "limit" -> batchSize.toString, "start" -> startAt.toString,
          "expand" -> "body.storage", "depth" -> "all"))
        val results = resp.path("results").elements().asScala.toVector
        val total = resp.path("size").asLong(0L)
        val next = startAt + results.size
        RestPager.Page(results,
          if (results.nonEmpty && next < total) Some(next.toString) else None)
      }, config).toVector
    }.getOrElse(inlineComments(item))
  }

  /** Wrap a search item as the {"page": ..., "comments": [...]} row the
    * converters read (confluence_document_reader.py:42-47).
    */
  protected def wrap(item: JsonNode): String = {
    val node = Http.mapper.createObjectNode()
    node.set[JsonNode]("page", item)
    val arr = node.putArray("comments")
    allComments(item).foreach(arr.add)
    Http.mapper.writeValueAsString(node)
  }
}

/** S3 — Confluence Server: CQL offset pages; continues while start < totalSize. */
final class ConfluenceSource(
    http: HttpFetch, userQuery: String, readAllComments: Boolean = false,
    config: RestPager.PagerConfig = RestPager.PagerConfig(batchSize = 50))
  extends ConfluenceSourceBase(http, userQuery, readAllComments, config) {

  protected def apiPrefix = ""
  protected def searchPath = "/rest/api/content/search"
  protected def contentNode(item: JsonNode): JsonNode = item

  def fetchAll(): Seq[String] =
    RestPager.readAll[String]((cursor, batchSize) => {
      val startAt = cursor.map(_.toLong).getOrElse(0L)
      val resp = http.getJson(searchPath, Seq(
        "cql" -> cql, "limit" -> batchSize.toString,
        "start" -> startAt.toString, "expand" -> expand))
      val results = resp.path("results").elements().asScala.toVector
      val total = resp.path("totalSize").asLong(0L)
      val next = startAt + results.size
      RestPager.Page(results.map(wrap),
        if (results.nonEmpty && next < total) Some(next.toString) else None)
    }, config)
}

/** S4 — Confluence Cloud: /wiki/rest/api/search with the cursor parsed from
  * _links.next (confluence_cloud_document_reader.py:147-161). Search items nest
  * the page under `content`.
  */
final class ConfluenceCloudSource(
    http: HttpFetch, userQuery: String, readAllComments: Boolean = false,
    config: RestPager.PagerConfig = RestPager.PagerConfig(batchSize = 50))
  extends ConfluenceSourceBase(http, userQuery, readAllComments, config) {

  protected def apiPrefix = "/wiki"
  protected def searchPath = "/wiki/rest/api/search"
  protected def contentNode(item: JsonNode): JsonNode = item.path("content")

  /** cursor param of the _links.next URL; None when absent (end of scan). */
  private[sources] def parseCursor(resp: JsonNode): Option[String] = {
    val next = resp.path("_links").path("next")
    if (next.isMissingNode || next.isNull) None
    else next.asText().split('?').lift(1).flatMap(_.split('&')
      .map(_.split("=", 2))
      .collectFirst { case Array("cursor", v) =>
        java.net.URLDecoder.decode(v, StandardCharsets.UTF_8) })
  }

  def fetchAll(): Seq[String] =
    RestPager.readAll[String]((cursor, batchSize) => {
      val resp = http.getJson(searchPath, Seq(
        "cql" -> cql, "limit" -> batchSize.toString,
        "expand" -> expand) ++ cursor.map("cursor" -> _))
      val results = resp.path("results").elements().asScala.toVector
      RestPager.Page(results.map(wrap),
        if (results.isEmpty) None else parseCursor(resp))
    }, config)
}
