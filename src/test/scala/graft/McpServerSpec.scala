package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.api.McpServer
import graft.core.CollectionManager
import graft.functions.{HashingEmbedder, TextSplitter}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Golden request/response tests for the MCP stdio adapter: protocol handshake,
  * tool listing, search/fetch calls with the reference's validation messages and
  * 50/100 default/cap (collection_search_unified_mcp_adapter.py:21-22,193-227).
  */
class McpServerSpec extends AnyFunSuite with SparkSuite {

  private val mapper = new ObjectMapper()

  private lazy val cm: CollectionManager = {
    val tmp = Files.createTempDirectory("graft-mcp").toString
    new CollectionManager(
      spark, tmp, new HashingEmbedder(dim = 16), new TextSplitter(50, 10))
  }

  private lazy val server: McpServer = {
    import spark.implicits._
    cm.create("wiki", Seq(
      ("d1", "https://wiki/d1", Map("space" -> "ENG"),
        "spark query engine\nwith vector search\nand bm25 ranking"),
      ("d2", "https://wiki/d2", Map("space" -> "OPS"),
        "deployment guide for the ops team\nrun the deploy script"))
      .toDF("id", "url", "metadata", "text"))
    cm.buildPhraseIndex("wiki") // match_in_collection's quoted atoms need it
    new McpServer(cm, format = "json")
  }

  private def call(line: String) = {
    val resp = server.handleLine(line)
    assert(resp.isDefined, s"expected a response for: $line")
    mapper.readTree(resp.get)
  }

  private def toolText(resp: com.fasterxml.jackson.databind.JsonNode): String = {
    assert(resp.path("result").path("isError").asBoolean(false) === false)
    resp.path("result").path("content").get(0).path("text").asText
  }

  test("initialize handshake and notification silence") {
    val init = call("""{"jsonrpc":"2.0","id":1,"method":"initialize","params":{"protocolVersion":"2025-03-26","capabilities":{}}}""")
    assert(init.path("jsonrpc").asText === "2.0")
    assert(init.path("id").asInt === 1)
    assert(init.path("result").path("protocolVersion").asText === "2025-03-26")
    assert(init.path("result").path("capabilities").has("tools"))
    assert(init.path("result").path("serverInfo").path("name").asText === "documents-search-unified")
    // notifications get no response
    assert(server.handleLine("""{"jsonrpc":"2.0","method":"notifications/initialized"}""").isEmpty)
  }

  test("tools/list exposes search, suggest, match, and fetch with schemas") {
    val resp = call("""{"jsonrpc":"2.0","id":2,"method":"tools/list"}""")
    val tools = resp.path("result").path("tools")
    assert(tools.size === 4)
    val names = (0 until tools.size).map(tools.get(_).path("name").asText).toSet
    assert(names === Set("search_in_collection", "suggest_terms",
      "match_in_collection", "fetch_from_collection"))
    val search = (0 until tools.size).map(tools.get)
      .find(_.path("name").asText == "search_in_collection").get
    assert(search.path("inputSchema").path("properties").has("numberOfChunks"))
    assert(search.path("inputSchema").path("required").get(0).asText === "collection")
    assert(search.path("inputSchema").path("properties").path("collection")
      .path("description").asText.contains("wiki"))
  }

  test("search tool: results with matched chunks, filter narrowing") {
    val resp = call("""{"jsonrpc":"2.0","id":3,"method":"tools/call","params":{"name":"search_in_collection","arguments":{"collection":"wiki","query":"vector search"}}}""")
    val text = toolText(resp)
    assert(text.contains("https://wiki/d1"))

    val filtered = call("""{"jsonrpc":"2.0","id":4,"method":"tools/call","params":{"name":"search_in_collection","arguments":{"collection":"wiki","query":"deploy","filter":"space = \"OPS\""}}}""")
    val ftext = toolText(filtered)
    assert(ftext.contains("https://wiki/d2") && !ftext.contains("https://wiki/d1"))
  }

  test("search tool validation: reference's error messages, 100-chunk cap") {
    assert(toolText(call("""{"jsonrpc":"2.0","id":5,"method":"tools/call","params":{"name":"search_in_collection","arguments":{"collection":"nope","query":"x"}}}"""))
      === "Error: collection 'nope' is not available. Available: wiki")
    assert(toolText(call("""{"jsonrpc":"2.0","id":6,"method":"tools/call","params":{"name":"search_in_collection","arguments":{"collection":"wiki"}}}"""))
      === "Error: at least one of 'query' or 'filter' must be provided.")
    assert(toolText(call("""{"jsonrpc":"2.0","id":7,"method":"tools/call","params":{"name":"search_in_collection","arguments":{"collection":"wiki","query":"x","numberOfChunks":101}}}"""))
      === "Error: numberOfChunks (101) exceeds maximum allowed (100).")
  }

  test("fetch tool: line-range slice by document id") {
    val resp = call("""{"jsonrpc":"2.0","id":8,"method":"tools/call","params":{"name":"fetch_from_collection","arguments":{"collection":"wiki","id":"d1","startLine":2,"endLine":2}}}""")
    val text = toolText(resp)
    assert(text.contains("with vector search"))
    assert(!text.contains("bm25 ranking"))
  }

  test("suggest tool: did-you-mean from the collection vocabulary, allowlist + empty-terms errors") {
    val resp = call("""{"jsonrpc":"2.0","id":14,"method":"tools/call","params":{"name":"suggest_terms","arguments":{"collection":"wiki","terms":"vecotr, depoly"}}}""")
    val text = toolText(resp)
    assert(text.contains("\"vector\""))
    assert(text.contains("\"deploy\""))
    assert(toolText(call("""{"jsonrpc":"2.0","id":15,"method":"tools/call","params":{"name":"suggest_terms","arguments":{"collection":"nope","terms":"x"}}}"""))
      .startsWith("Error: collection 'nope' is not available"))
    assert(toolText(call("""{"jsonrpc":"2.0","id":16,"method":"tools/call","params":{"name":"suggest_terms","arguments":{"collection":"wiki","terms":" , "}}}"""))
      .startsWith("Error: 'terms'"))
  }

  test("match tool: boolean MATCH with a quoted phrase, allowlist + empty-query errors") {
    val resp = call("""{"jsonrpc":"2.0","id":17,"method":"tools/call","params":{"name":"match_in_collection","arguments":{"collection":"wiki","query":"\"vector search\" NOT bm25"}}}""")
    val text = toolText(resp)
    assert(text.contains("chunkId"), text)
    assert(toolText(call("""{"jsonrpc":"2.0","id":18,"method":"tools/call","params":{"name":"match_in_collection","arguments":{"collection":"nope","query":"x"}}}"""))
      .startsWith("Error: collection 'nope' is not available"))
    assert(toolText(call("""{"jsonrpc":"2.0","id":19,"method":"tools/call","params":{"name":"match_in_collection","arguments":{"collection":"wiki","query":"  "}}}"""))
      .startsWith("Error: 'query'"))
  }

  test("match tool: filter DSL gates candidates; group_documents rolls up to documents") {
    // "search OR deploy" matches both docs; the OPS filter keeps d2's chunks only
    val filtered = toolText(call("""{"jsonrpc":"2.0","id":20,"method":"tools/call","params":{"name":"match_in_collection","arguments":{"collection":"wiki","query":"search OR deploy","filter":"space = \"OPS\""}}}"""))
    assert(filtered.contains("chunkId"), filtered)
    val opsChunks = cm.chunks("wiki")
      .filter(org.apache.spark.sql.functions.col("documentId") === "d2")
      .collect().map(_.getAs[Long]("chunkId")).toSet
    val ids = mapper.readTree(filtered)
    assert(ids.size > 0, filtered)
    (0 until ids.size).foreach { i =>
      assert(opsChunks.contains(ids.get(i).path("chunkId").asLong), filtered)
    }
    // the MCP surface always carries a highlight snippet — the context an
    // agent shows next to the id (positive atoms highlighted, so the
    // snippet window contains one of them)
    (0 until ids.size).foreach { i =>
      val s = ids.get(i).path("snippet").asText("")
      assert(s.contains("search") || s.contains("deploy"), filtered)
    }
    // doc-level roll-up returns documentId rows, best chunk carries the doc
    val docs = toolText(call("""{"jsonrpc":"2.0","id":21,"method":"tools/call","params":{"name":"match_in_collection","arguments":{"collection":"wiki","query":"search OR deploy","group_documents":true}}}"""))
    assert(docs.contains("documentId"), docs)
    assert(docs.contains("d1") && docs.contains("d2"), docs)
    assert(docs.contains("snippet"), docs)
  }

  test("search tool: optional boolean-MATCH restriction gates the hybrid ranking") {
    // ungated: both docs rank; gated by MATCH "deploy": only d2 can appear
    val all = toolText(call("""{"jsonrpc":"2.0","id":22,"method":"tools/call","params":{"name":"search_in_collection","arguments":{"collection":"wiki","query":"spark deploy"}}}"""))
    assert(all.contains("d1") && all.contains("d2"), all)
    val gated = toolText(call("""{"jsonrpc":"2.0","id":23,"method":"tools/call","params":{"name":"search_in_collection","arguments":{"collection":"wiki","query":"spark deploy","match":"deploy NOT spark"}}}"""))
    assert(!gated.contains("\"d1\"") && gated.contains("d2"), gated)
  }

  test("match tool honors the server's toon format like search (uniform agent surface)") {
    // r14 VERDICT ask 6: the MCP agent surface is format-uniform — a server
    // configured for toon renders MATCH results as toon rows, not JSON
    val toonServer = new McpServer(cm, format = "toon")
    val resp = toonServer.handleLine("""{"jsonrpc":"2.0","id":40,"method":"tools/call","params":{"name":"match_in_collection","arguments":{"collection":"wiki","query":"\"vector search\""}}}""")
    val text = mapper.readTree(resp.get)
      .path("result").path("content").get(0).path("text").asText
    assert(text.contains("matches[") && text.contains("{chunkId,"), text)
    assert(!text.contains("\"chunkId\":"), text)
  }

  test("protocol errors: parse error, unknown method, unknown tool") {
    val bad = mapper.readTree(server.handleLine("{not json").get)
    assert(bad.path("error").path("code").asInt === -32700)
    val unknown = call("""{"jsonrpc":"2.0","id":9,"method":"bogus/method"}""")
    assert(unknown.path("error").path("code").asInt === -32601)
    val badTool = call("""{"jsonrpc":"2.0","id":10,"method":"tools/call","params":{"name":"no_such_tool","arguments":{}}}""")
    assert(badTool.path("result").path("isError").asBoolean === true)
  }

  test("http transport: POST /mcp round-trips tool calls, 202 for notifications") {
    val http = graft.api.McpHttpTransport.serve(server, 0)
    try {
      val port = http.getAddress.getPort
      val client = java.net.http.HttpClient.newHttpClient()
      def post(body: String) = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"http://127.0.0.1:$port/mcp"))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())

      val resp = post("""{"jsonrpc":"2.0","id":1,"method":"tools/call","params":{"name":"search_in_collection","arguments":{"collection":"wiki","query":"vector search"}}}""")
      assert(resp.statusCode === 200)
      assert(mapper.readTree(resp.body).path("result").path("content").get(0)
        .path("text").asText.contains("https://wiki/d1"))

      val note = post("""{"jsonrpc":"2.0","method":"notifications/initialized"}""")
      assert(note.statusCode === 202)
    } finally http.stop(0)
  }

  test("allowlist validation fails loudly for missing collections") {
    val tmp = Files.createTempDirectory("graft-mcp2").toString
    val cm = new CollectionManager(
      spark, tmp, new HashingEmbedder(dim = 16), new TextSplitter(50, 10))
    val e = intercept[IllegalArgumentException](
      new McpServer(cm, allowedCollections = Some(Seq("ghost"))))
    assert(e.getMessage.contains("no collections found") ||
      e.getMessage.contains("collections not found"))
  }
}
