package graft.api

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.core.CollectionManager
import graft.functions.{Formatting, HashingEmbedder}
import org.apache.spark.sql.SparkSession

/** MCP (Model Context Protocol) stdio adapter over [[CollectionManager]] — the
  * reference's primary AI-agent surface, re-expressed:
  * search/fetch/suggest tools, collection discovery + allowlist validation, default 50 /
  * cap 100 chunks (collection_search_unified_mcp_adapter.py:21-22,193-227 and
  * collection_search_mcp_stdio_adapter.py), json / json_with_indent / toon output.
  *
  * Protocol: JSON-RPC 2.0, one message per line on stdin/stdout (the MCP stdio
  * transport). Logs go to stderr — Spark's default log4j target — so they never
  * corrupt the protocol stream. [[McpServer.handleLine]] is a pure
  * request→response function, so the protocol surface golden-tests without a
  * process boundary (McpServerSpec).
  */
final class McpServer(
    manager: CollectionManager,
    allowedCollections: Option[Seq[String]] = None,
    format: String = "toon",
    defaultNumberOfChunks: Int = 50,
    maxNumberOfChunks: Int = 100,
    rrfK: Int = 60) {

  private val mapper = new ObjectMapper()

  /** Discovery + allowlist validation
    * (collection_search_unified_mcp_adapter.py:52-82,162-168).
    */
  val available: Seq[String] = {
    val discovered = manager.list()
    val names = allowedCollections match {
      case Some(allowed) =>
        val missing = allowed.toSet -- discovered.toSet
        require(missing.isEmpty,
          s"Error: collections not found: ${missing.toSeq.sorted.mkString(", ")}, " +
            s"available: ${discovered.sorted.mkString(", ")}")
        discovered.filter(allowed.contains)
      case None => discovered
    }
    require(names.nonEmpty, "Error: no collections found.")
    names
  }

  private def availableList = available.sorted.mkString(", ")

  // ------------------------------------------------------------------- tools

  private val searchDescription =
    """Search in a collection of documents.
      |
      |# Typical use cases
      |- User asks to search in a specific collection;
      |- User asks to search in a system for which there is a dedicated collection.
      |
      |# Search summarization
      |- Attach a reference (citation such as a page URL, issue key, or file path) to each piece of information;
      |- If you were not able to find relevant information, say that you don't know instead of making something up;
      |- Be concise yet complete.""".stripMargin

  private val fetchDescription =
    """Fetch a document content from a collection by its id.
      |
      |# Typical use cases
      |- User provides an id or url of a document - fetch the document and use as context.
      |- After using search_in_collection, you need more context from a found document.
      |
      |id means: Confluence: page id. Jira: issue key (e.g. PROJ-123). Files: relative path.""".stripMargin

  private def collectionFieldDescription: String =
    s"Collection name must be one of: $availableList"

  private val filterFieldDescription =
    """Filter expression to narrow results.
      |Syntax: field operator "value". Operators: =, !=, >, >=, <, <=.
      |Combine conditions with and / or; use parentheses for grouping.
      |Example: space = "X" and lastModifiedAt > "2026-01-01"""".stripMargin

  private def schema(required: Seq[String], props: (String, (String, String))*): ObjectNode = {
    val s = mapper.createObjectNode()
    s.put("type", "object")
    val p = s.putObject("properties")
    props.foreach { case (name, (tpe, desc)) =>
      val f = p.putObject(name)
      f.put("type", tpe)
      f.put("description", desc)
    }
    val req = s.putArray("required")
    required.foreach(req.add)
    s
  }

  private def toolsJson: ObjectNode = {
    val result = mapper.createObjectNode()
    val tools = result.putArray("tools")

    val search = tools.addObject()
    search.put("name", "search_in_collection")
    search.put("description", searchDescription)
    search.set[JsonNode]("inputSchema", schema(Seq("collection"),
      "collection" -> ("string", collectionFieldDescription),
      "query" -> ("string", "Search query text for vector similarity and keyword search."),
      "filter" -> ("string", filterFieldDescription),
      "match" -> ("string",
        "Optional boolean-MATCH restriction (same grammar as " +
          "match_in_collection): only chunks satisfying it can rank."),
      "numberOfChunks" -> ("integer",
        s"Number of best matched document chunks to return. Default: $defaultNumberOfChunks. Max allowed: $maxNumberOfChunks.")))

    // extension beyond the reference's search/fetch pair: did-you-mean over
    // the collection's own BM25 vocabulary, for agents to self-correct a
    // query that returned nothing before giving up
    val suggest = tools.addObject()
    suggest.put("name", "suggest_terms")
    suggest.put("description",
      """Suggest correctly-spelled terms from a collection's own vocabulary.
        |
        |# Typical use cases
        |- search_in_collection returned no results: check the query terms for
        |  typos against what the collection actually contains, then retry the
        |  search with the suggested spellings.""".stripMargin)
    suggest.set[JsonNode]("inputSchema", schema(Seq("collection", "terms"),
      "collection" -> ("string", collectionFieldDescription),
      "terms" -> ("string", "Comma-separated terms to check/correct.")))

    // extension: precise boolean retrieval for agents that know exactly
    // which terms must (not) co-occur — complements the ranked hybrid search
    val matchT = tools.addObject()
    matchT.put("name", "match_in_collection")
    matchT.put("description",
      """Boolean keyword MATCH over a collection's text index.
        |
        |Query grammar: terms combine with AND / OR / NOT (NOT binds
        |tightest, then AND, then OR), parentheses group, adjacency is an
        |implicit AND, a double-quoted segment matches as an exact phrase,
        |a trailing star makes a prefix atom (vec* matches vector,
        |vectors, ...; "vec sear"* prefixes the LAST phrase token), and
        |NEAR(a "b c", n) matches its operands (terms, quoted phrases,
        |either with a trailing-star prefix) within an n-token window
        |(default 10); a leading caret anchors an atom to the first
        |token of the text (^key, ^ta*, ^"the fast") — e.g.:
        |spark AND ("hash join" OR NEAR(broadcast "sort mer"*, 6))
        |NOT python. At least one positive term is required. Results are
        |BM25-ranked and carry a highlight snippet of the matching
        |text.""".stripMargin)
    matchT.set[JsonNode]("inputSchema", schema(Seq("collection", "query"),
      "collection" -> ("string", collectionFieldDescription),
      "query" -> ("string", "Boolean query (AND/OR/NOT, parens, quoted phrases)."),
      "filter" -> ("string",
        "Optional metadata filter, same DSL as search_in_collection — only " +
          "documents passing the filter can match."),
      "group_documents" -> ("boolean",
        "If true, roll chunk matches up to documents (each document ranked " +
          "by its best chunk). Default: false (chunk-level results).")))

    val fetch = tools.addObject()
    fetch.put("name", "fetch_from_collection")
    fetch.put("description", fetchDescription)
    fetch.set[JsonNode]("inputSchema", schema(Seq("collection", "id"),
      "collection" -> ("string", collectionFieldDescription),
      "id" -> ("string", "Document identifier."),
      "startLine" -> ("integer", "First line number to return (1-based, inclusive). Default: 1."),
      "endLine" -> ("integer", "Last line number to return (1-based, inclusive). Default: 250.")))
    result
  }

  private def formatted(df: org.apache.spark.sql.DataFrame, label: String): String =
    format match {
      case "json"             => Formatting.json(df)
      case "json_with_indent" => Formatting.jsonIndent(df)
      case _                  => Formatting.toon(df, label)
    }

  /** Validation order and messages mirror the unified adapter (:200-205). */
  private[api] def searchTool(collection: String, query: String,
                              filter: Option[String], numberOfChunks: Int,
                              matchQuery: Option[String] = None): String = {
    if (!available.contains(collection))
      return s"Error: collection '$collection' is not available. Available: $availableList"
    if (query.isEmpty && filter.isEmpty)
      return "Error: at least one of 'query' or 'filter' must be provided."
    if (numberOfChunks > maxNumberOfChunks)
      return s"Error: numberOfChunks ($numberOfChunks) exceeds maximum allowed ($maxNumberOfChunks)."
    formatted(manager.search(collection, query,
      maxChunks = numberOfChunks, maxDocs = numberOfChunks,
      metadataFilter = filter, includeMatchedChunkContent = true,
      rrfK = rrfK, matchQuery = matchQuery), "documents")
  }

  private[api] def suggestTool(collection: String, terms: String): String = {
    if (!available.contains(collection))
      return s"Error: collection '$collection' is not available. Available: $availableList"
    val ts = terms.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    if (ts.isEmpty) return "Error: 'terms' must contain at least one term."
    formatted(manager.suggestTerms(collection, ts).orderBy("q", "rank"),
      "suggestions")
  }

  private[api] def matchTool(collection: String, query: String,
                             filter: Option[String] = None,
                             groupDocuments: Boolean = false): String = {
    if (!available.contains(collection))
      return s"Error: collection '$collection' is not available. Available: $availableList"
    if (query.trim.isEmpty) return "Error: 'query' must be non-empty."
    // snippets on by default: an MCP agent needs context next to the ids
    if (groupDocuments)
      formatted(manager.booleanSearchDocs(collection, query,
        metadataFilter = filter, includeSnippet = true), "documents")
    else formatted(manager.booleanSearch(collection, query,
      metadataFilter = filter, includeSnippet = true), "matches")
  }

  private[api] def fetchTool(collection: String, id: String,
                             startLine: Int, endLine: Int): String = {
    if (!available.contains(collection))
      return s"Error: collection '$collection' is not available. Available: $availableList"
    formatted(manager.fetch(collection, id, startLine, endLine), "document")
  }

  // ---------------------------------------------------------------- protocol

  private def textResult(text: String, isError: Boolean): ObjectNode = {
    val r = mapper.createObjectNode()
    val content = r.putArray("content")
    val item = content.addObject()
    item.put("type", "text")
    item.put("text", text)
    if (isError) r.put("isError", true)
    r
  }

  private def callTool(params: JsonNode): ObjectNode = {
    val name = params.path("name").asText("")
    val args = params.path("arguments")
    def str(k: String): Option[String] =
      Option(args.get(k)).filter(n => !n.isNull).map(_.asText)
    def int(k: String, dflt: Int): Int =
      Option(args.get(k)).filter(_.isNumber).map(_.asInt).getOrElse(dflt)
    try {
      name match {
        case "search_in_collection" =>
          textResult(searchTool(
            str("collection").getOrElse(""), str("query").getOrElse(""),
            str("filter").filter(_.nonEmpty),
            int("numberOfChunks", defaultNumberOfChunks),
            str("match").filter(_.nonEmpty)), isError = false)
        case "fetch_from_collection" =>
          textResult(fetchTool(
            str("collection").getOrElse(""), str("id").getOrElse(""),
            int("startLine", 1), int("endLine", 250)), isError = false)
        case "suggest_terms" =>
          textResult(suggestTool(
            str("collection").getOrElse(""), str("terms").getOrElse("")),
            isError = false)
        case "match_in_collection" =>
          textResult(matchTool(
            str("collection").getOrElse(""), str("query").getOrElse(""),
            str("filter").filter(_.nonEmpty),
            Option(args.get("group_documents")).exists(_.asBoolean(false))),
            isError = false)
        case other =>
          textResult(s"Error: unknown tool '$other'", isError = true)
      }
    } catch {
      case e: Exception => textResult(s"Error: ${e.getMessage}", isError = true)
    }
  }

  private def initializeResult(req: JsonNode): ObjectNode = {
    val r = mapper.createObjectNode()
    r.put("protocolVersion",
      req.path("params").path("protocolVersion").asText("2025-06-18"))
    r.putObject("capabilities").putObject("tools")
    val info = r.putObject("serverInfo")
    info.put("name", "documents-search-unified")
    info.put("version", "1.0")
    r
  }

  private def rpcResult(id: JsonNode, result: JsonNode): String = {
    val r = mapper.createObjectNode()
    r.put("jsonrpc", "2.0")
    r.set[JsonNode]("id", id)
    r.set[JsonNode]("result", result)
    mapper.writeValueAsString(r)
  }

  private def rpcError(id: JsonNode, code: Int, message: String): String = {
    val r = mapper.createObjectNode()
    r.put("jsonrpc", "2.0")
    if (id == null) r.putNull("id") else r.set[JsonNode]("id", id)
    val e = r.putObject("error")
    e.put("code", code)
    e.put("message", message)
    mapper.writeValueAsString(r)
  }

  /** One JSON-RPC message in → optional response out (None for notifications). */
  def handleLine(line: String): Option[String] = {
    val req =
      try mapper.readTree(line)
      catch { case _: Exception => return Some(rpcError(null, -32700, "Parse error")) }
    val id = req.get("id")
    val method = req.path("method").asText("")
    if (id == null || id.isNull) None // notification (e.g. notifications/initialized)
    else method match {
      case "initialize"  => Some(rpcResult(id, initializeResult(req)))
      case "tools/list"  => Some(rpcResult(id, toolsJson))
      case "tools/call"  => Some(rpcResult(id, callTool(req.path("params"))))
      case "ping"        => Some(rpcResult(id, mapper.createObjectNode()))
      case other         => Some(rpcError(id, -32601, s"Method not found: $other"))
    }
  }
}

/** Streamable-HTTP transport: POST /mcp carries one JSON-RPC message per
  * request (the unified adapter's `--http` mode,
  * collection_search_unified_mcp_adapter.py:24-28). Notifications get 202 with
  * an empty body; responses are application/json.
  */
object McpHttpTransport {
  def serve(server: McpServer, port: Int): com.sun.net.httpserver.HttpServer = {
    val http = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)
    http.createContext("/mcp", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        if (ex.getRequestMethod != "POST") {
          ex.sendResponseHeaders(405, -1)
        } else {
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          server.handleLine(body) match {
            case Some(resp) =>
              val bytes = resp.getBytes(StandardCharsets.UTF_8)
              ex.getResponseHeaders.set("Content-Type", "application/json")
              ex.sendResponseHeaders(200, bytes.length.toLong)
              ex.getResponseBody.write(bytes)
            case None => ex.sendResponseHeaders(202, -1) // notification
          }
        }
      } finally ex.close()
    })
    http.start()
    http
  }
}

/** Entry point — stdio by default, HTTP with `--http`:
  * {{{
  *   graft.api.McpStdioAdapter [--data-dir D] [--collections a,b,c]
  *     [--format json|json_with_indent|toon] [--default-chunks 50] [--max-chunks 100]
  *     [--rrfK 60] [--http true] [--http-port 8000]
  * }}}
  */
object McpStdioAdapter {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-mcp")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR") // stderr via Spark's default appender
    val manager = new CollectionManager(
      spark, opts.getOrElse("data-dir", "./data/collections"), HashingEmbedder.default)
    val server = new McpServer(
      manager,
      opts.get("collections").map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)),
      opts.getOrElse("format", "toon"),
      opts.get("default-chunks").map(_.toInt).getOrElse(50),
      opts.get("max-chunks").map(_.toInt).getOrElse(100),
      opts.get("rrfK").map(_.toInt).getOrElse(60))

    if (opts.get("http").contains("true")) {
      val port = opts.get("http-port").map(_.toInt).getOrElse(8000)
      McpHttpTransport.serve(server, port)
      System.err.println(s"[mcp] serving streamable-http on :$port/mcp")
      Thread.currentThread.join() // serve until killed
    } else {
      val out = new java.io.PrintStream(System.out, true, StandardCharsets.UTF_8)
      scala.io.Source.stdin.getLines().foreach { line =>
        if (line.trim.nonEmpty) server.handleLine(line).foreach(out.println)
      }
    }
    spark.stop()
  }
}
