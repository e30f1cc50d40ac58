package graft.api

import java.io.{BufferedReader, InputStream, InputStreamReader, OutputStream, PrintWriter}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper

/** Line-delimited JSON-RPC 2.0 binding for [[Serve]] — the transport
  * half of the reference's MCP server (serve.py's FastMCP session;
  * MCP's own wire format is JSON-RPC over stdio, so this adapter IS
  * the protocol shape minus the MCP SDK handshake, which isn't
  * available in this environment). One request per line in, one
  * response per line out:
  *
  *   {"jsonrpc":"2.0","id":1,"method":"status","params":{}}
  *   → {"jsonrpc":"2.0","id":1,"result":{...tool JSON...}}
  *
  * `method` is the tool name; `params` is a flat object whose values
  * are coerced to the string args Serve.call takes. `tools/list`
  * returns the registry. Per JSON-RPC: parse failures → -32700,
  * unknown methods → -32601, tool-level failures stay inside `result`
  * as the standard error document (the call itself succeeded).
  * Requests without an `id` are notifications — executed, no response.
  * Uses Jackson from Spark's own classpath; no protocol library.
  */
final class JsonRpcServe(serve: Serve) {
  private val mapper = new ObjectMapper()

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
      case "tools/list" =>
        respond(s""""result":{"tools":[${serve.tools.map("\"" + _ + "\"").mkString(",")}]}""")
      case m if serve.tools.contains(m) =>
        val params = Option(node.get("params")).filter(_.isObject)
          .map(_.properties().asScala.toSeq).getOrElse(Seq.empty)
        // Serve's args are flat strings; an object/array param would be
        // silently flattened to "" by asText() — reject it instead of
        // serving wrong (unfiltered) results
        val structured = params.filter(e => e.getValue.isContainerNode)
        if (structured.nonEmpty)
          return respond(s""""error":{"code":-32602,"message":${
            mapper.writeValueAsString("params must be flat strings; got object/array for: " +
              structured.map(_.getKey).mkString(", "))}}""")
        val args = params.map(e => e.getKey -> e.getValue.asText()).toMap
        val result = serve.call(m, args)
        // report returns markdown, not JSON — wrap it. Everything else
        // is a JSON document, but possibly PRETTY-printed (Formatters
        // emits multi-line arrays) — re-serialize compact, because the
        // framing here is one response per LINE.
        val json = if (m == "report") mapper.writeValueAsString(
            mapper.createObjectNode().put("markdown", result))
          else
            try mapper.writeValueAsString(mapper.readTree(result))
            catch { case scala.util.control.NonFatal(_) =>
              mapper.writeValueAsString(result) }
        respond(s""""result":$json""")
      case m =>
        val msg = mapper.writeValueAsString(s"method not found: $m")
        respond(s""""error":{"code":-32601,"message":$msg}""")
    }
  }
}
