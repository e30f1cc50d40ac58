package graft.api

import java.io.{BufferedReader, InputStream, InputStreamReader, OutputStream, PrintWriter}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper

/** Line-delimited JSON-RPC 2.0 + MCP binding for [[Serve]] — the
  * transport of the reference's MCP server (serve.py's FastMCP
  * session). MCP's wire format is JSON-RPC over stdio, and this
  * adapter speaks both layers from the public spec, no SDK:
  *
  *  - MCP lifecycle: `initialize` (echoes the client's
  *    protocolVersion, declares the tools capability + serverInfo),
  *    `notifications/initialized` (accepted, no response), `ping`.
  *  - MCP tools: `tools/list` returns `{name, description,
  *    inputSchema}` entries generated from [[Serve.toolSpecs]];
  *    `tools/call` takes `{name, arguments}` and wraps the tool's
  *    output in the MCP `content: [{type:"text", text}]` envelope,
  *    with tool-level failures flagged `isError: true` (per MCP,
  *    execution errors live in the result so the model can see them —
  *    protocol errors use JSON-RPC error objects).
  *  - Direct binding (pre-MCP shape, kept for simple callers):
  *    `method` = tool name, `params` = flat object coerced to the
  *    string args Serve.call takes; raw tool JSON as the result.
  *
  * Per JSON-RPC: parse failures → -32700, unknown methods → -32601,
  * bad params → -32602. Requests without an `id` are notifications —
  * executed, no response. Uses Jackson from Spark's own classpath; no
  * protocol library.
  */
final class JsonRpcServe(serve: Serve) {
  private val mapper = new ObjectMapper()

  /** MCP protocol revision this server was written against; initialize
    * echoes the client's requested version (the lifecycle/tools subset
    * spoken here is stable across published revisions). */
  private val defaultProtocolVersion = "2025-03-26"

  /** Serve until EOF. Blocking; run on a dedicated thread if the
    * caller needs to keep working. */
  def loop(in: InputStream, out: OutputStream): Unit = {
    val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
    val writer = new PrintWriter(new java.io.OutputStreamWriter(out, StandardCharsets.UTF_8), true)
    Iterator.continually(reader.readLine()).takeWhile(_ != null)
      .map(_.trim).filter(_.nonEmpty)
      .foreach(line => handle(line).foreach(writer.println))
  }

  /** One request line → one response line (None for notifications). */
  def handle(line: String): Option[String] = {
    val node =
      try mapper.readTree(line)
      catch { case scala.util.control.NonFatal(_) =>
        return Some("""{"jsonrpc":"2.0","id":null,"error":{"code":-32700,"message":"parse error"}}""")
      }
    // per JSON-RPC 2.0: only an ABSENT id is a notification — an
    // explicit "id":null still demands a response
    val id = if (node.has("id")) Some(node.get("id").toString) else None
    val method = Option(node.get("method")).map(_.asText()).getOrElse("")
    def respond(body: String): Option[String] =
      id.map(i => s"""{"jsonrpc":"2.0","id":$i,$body}""")
    method match {
      case "initialize" =>
        val pv = Option(node.get("params"))
          .flatMap(p => Option(p.get("protocolVersion")))
          .filter(_.isTextual).map(_.asText())
          .getOrElse(defaultProtocolVersion)
        respond(s""""result":{"protocolVersion":${mapper.writeValueAsString(pv)},""" +
          s""""capabilities":{"tools":{"listChanged":false},"prompts":{"listChanged":false},""" +
          s""""resources":{"listChanged":false}},""" +
          s""""serverInfo":{"name":"graft","version":"0.4.0"}}""")
      case "notifications/initialized" =>
        // lifecycle notification: accepted silently. A (non-conforming)
        // client that attached an id still gets the response JSON-RPC
        // owes every non-notification request.
        respond(""""result":{}""")
      case "ping" =>
        respond(""""result":{}""")
      case "resources/list" =>
        val entries = McpResources.statics.map(s =>
          s"""{"uri":${mapper.writeValueAsString(s.uri)},""" +
            s""""name":${mapper.writeValueAsString(s.name)},""" +
            s""""description":${mapper.writeValueAsString(s.description)},""" +
            s""""mimeType":${mapper.writeValueAsString(s.mime)}}""").mkString(",")
        respond(s""""result":{"resources":[$entries]}""")
      case "resources/templates/list" =>
        val entries = McpResources.templates.map(t =>
          s"""{"uriTemplate":${mapper.writeValueAsString(t.uriTemplate)},""" +
            s""""name":${mapper.writeValueAsString(t.name)},""" +
            s""""description":${mapper.writeValueAsString(t.description)},""" +
            s""""mimeType":${mapper.writeValueAsString(t.mime)}}""").mkString(",")
        respond(s""""result":{"resourceTemplates":[$entries]}""")
      case "resources/read" =>
        val uri = Option(node.get("params")).filter(_.isObject)
          .flatMap(o => Option(o.get("uri"))).filter(_.isTextual)
          .map(_.asText()).getOrElse("")
        McpResources.read(serve, uri) match {
          case None =>
            respond(s""""error":{"code":-32002,"message":${
              mapper.writeValueAsString(s"resource not found: $uri")}}""")
          case Some((mime, body)) =>
            respond(s""""result":{"contents":[{"uri":${mapper.writeValueAsString(uri)},""" +
              s""""mimeType":${mapper.writeValueAsString(mime)},""" +
              s""""text":${mapper.writeValueAsString(body)}}]}""")
        }
      case "prompts/list" =>
        val entries = Prompts.specs.map { s =>
          val args = s.args.map(a =>
            s"""{"name":${mapper.writeValueAsString(a.name)},""" +
              s""""description":${mapper.writeValueAsString(a.description)},""" +
              s""""required":${a.required}}""").mkString(",")
          s"""{"name":${mapper.writeValueAsString(s.name)},""" +
            s""""description":${mapper.writeValueAsString(s.description)},""" +
            s""""arguments":[$args]}"""
        }.mkString(",")
        respond(s""""result":{"prompts":[$entries]}""")
      case "prompts/get" =>
        val p = Option(node.get("params")).filter(_.isObject)
        val name = p.flatMap(o => Option(o.get("name"))).filter(_.isTextual)
          .map(_.asText()).getOrElse("")
        val args = p.flatMap(o => Option(o.get("arguments"))).filter(_.isObject)
          .map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty[String, String])
        // Client-supplied argument strings reach toInt/toLong inside the
        // prompt builders; a malformed value must produce an error document,
        // not kill the serve loop (same contract Serve.call gives tools).
        (try Right(Prompts.get(serve.engine, name, args)) catch {
          case _: NumberFormatException =>
            Left(-32602 -> s"invalid prompt argument for $name: expected a number")
          case scala.util.control.NonFatal(e) =>
            Left(-32603 -> s"prompt $name failed: ${e.getMessage}")
        }) match {
          case Left((code, msg)) =>
            respond(s""""error":{"code":$code,"message":${mapper.writeValueAsString(msg)}}""")
          case Right(None) =>
            respond(s""""error":{"code":-32602,"message":${
              mapper.writeValueAsString(s"unknown prompt: $name")}}""")
          case Right(Some(text)) =>
            val desc = Prompts.specs.find(_.name == name).map(_.description).getOrElse("")
            respond(s""""result":{"description":${mapper.writeValueAsString(desc)},""" +
              s""""messages":[{"role":"user","content":{"type":"text",""" +
              s""""text":${mapper.writeValueAsString(text)}}}]}""")
        }
      case "tools/list" =>
        val entries = Serve.toolSpecs.map(toolListEntry).mkString(",")
        respond(s""""result":{"tools":[$entries]}""")
      case "tools/call" =>
        val p = Option(node.get("params")).filter(_.isObject)
        val name = p.flatMap(o => Option(o.get("name"))).filter(_.isTextual)
          .map(_.asText()).getOrElse("")
        if (!serve.tools.contains(name))
          return respond(s""""error":{"code":-32602,"message":${
            mapper.writeValueAsString(s"unknown tool: $name")}}""")
        val argNode = p.flatMap(o => Option(o.get("arguments"))).filter(_.isObject)
        callTool(name, argNode.map(_.properties().asScala.toSeq).getOrElse(Seq.empty)) match {
          case Left(badParams) => respond(badParams)
          case Right(json) =>
            // MCP envelope: the tool's document rides as one text
            // content block; a tool-level error document (the call ran,
            // the tool refused) is flagged isError so the model sees it.
            val isErr =
              try {
                val t = mapper.readTree(json); t.isObject && t.has("error")
              } catch { case scala.util.control.NonFatal(_) => false }
            respond(s""""result":{"content":[{"type":"text","text":${
              mapper.writeValueAsString(json)}}],"isError":$isErr}""")
        }
      case m if serve.tools.contains(m) =>
        val params = Option(node.get("params")).filter(_.isObject)
          .map(_.properties().asScala.toSeq).getOrElse(Seq.empty)
        callTool(m, params) match {
          case Left(badParams) => respond(badParams)
          case Right(json) => respond(s""""result":$json""")
        }
      case m =>
        val msg = mapper.writeValueAsString(s"method not found: $m")
        respond(s""""error":{"code":-32601,"message":$msg}""")
    }
  }

  /** Dispatch one tool with raw JSON params: coerces scalar values to
    * Serve's string args, rejects container values (they would be
    * silently flattened to "" by asText and serve WRONG — unfiltered —
    * results), normalizes the output to one compact JSON document.
    * Left = a ready "error":{...} body (-32602). */
  private def callTool(m: String,
      params: Seq[java.util.Map.Entry[String, com.fasterxml.jackson.databind.JsonNode]])
      : Either[String, String] = {
    val structured = params.filter(e => e.getValue.isContainerNode)
    if (structured.nonEmpty)
      return Left(s""""error":{"code":-32602,"message":${
        mapper.writeValueAsString("params must be flat scalars; got object/array for: " +
          structured.map(_.getKey).mkString(", "))}}""")
    val args = params.map(e => e.getKey -> e.getValue.asText()).toMap
    val result = serve.call(m, args)
    // report returns markdown, not JSON — wrap it. Everything else is
    // a JSON document, but possibly PRETTY-printed (Formatters emits
    // multi-line arrays) — re-serialize compact, because the framing
    // here is one response per LINE.
    Right(
      if (m == "report")
        mapper.writeValueAsString(mapper.createObjectNode().put("markdown", result))
      else
        try mapper.writeValueAsString(mapper.readTree(result))
        catch { case scala.util.control.NonFatal(_) =>
          mapper.writeValueAsString(result) })
  }

  /** One MCP tools/list entry: {name, description, inputSchema} with a
    * JSON-Schema object generated from the ToolSpec. */
  private def toolListEntry(spec: Serve.ToolSpec): String = {
    val props = spec.params.map { p =>
      s"${mapper.writeValueAsString(p.name)}:{"+
        s""""type":"${p.tpe}","description":${mapper.writeValueAsString(p.description)}}"""
    }.mkString(",")
    val required = spec.params.filter(_.required)
      .map(p => mapper.writeValueAsString(p.name)).mkString(",")
    s"""{"name":${mapper.writeValueAsString(spec.name)},""" +
      s""""description":${mapper.writeValueAsString(spec.description)},""" +
      s""""inputSchema":{"type":"object","properties":{$props},"required":[$required]}}"""
  }
}
