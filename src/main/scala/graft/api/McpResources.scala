package graft.api

/** MCP resources (reference serve.py:3700-3795): read-only `blq://`
  * URIs over the same analytics the tools serve — static resources
  * (status, runs, events, errors, warnings, commands, guide) plus
  * templated ones (event/{ref}, errors/{run_serial},
  * warnings/{run_serial}). Resources are the MCP surface an agent
  * host can attach as context without a tool call; each read
  * dispatches to the corresponding [[Serve]] tool, so the guard rails
  * (read-only SQL, path escapes, ref resolution) are shared, not
  * duplicated.
  */
object McpResources {

  final case class Static(uri: String, name: String, description: String,
      mime: String)
  final case class Template(uriTemplate: String, name: String, description: String,
      mime: String)

  val statics: Seq[Static] = Seq(
    Static("blq://status", "status", "Current status of all sources.", "application/json"),
    Static("blq://runs", "runs", "Recent run history (last 100).", "application/json"),
    Static("blq://events", "events", "Events of the most recent run.", "application/json"),
    Static("blq://errors", "errors", "Recent errors across all runs.", "application/json"),
    Static("blq://warnings", "warnings", "Recent warnings across all runs.", "application/json"),
    Static("blq://commands", "commands", "Registered commands.", "application/json"),
    Static("blq://guide", "guide", "Agent usage guide for the graft tools.", "text/markdown"))

  val templates: Seq[Template] = Seq(
    Template("blq://event/{ref}", "event", "Single event details by ref.", "application/json"),
    Template("blq://errors/{run_serial}", "errors-for-run",
      "Errors for a specific run.", "application/json"),
    Template("blq://warnings/{run_serial}", "warnings-for-run",
      "Warnings for a specific run.", "application/json"))

  /** Resolve one URI to (mimeType, body); None = unknown URI. Run-
    * scoped reads go through the query tool's filter mini-language so
    * ref/serial handling matches the tool surface exactly. */
  def read(serve: Serve, uri: String): Option[(String, String)] = uri match {
    case "blq://status" => Some(("application/json", serve.call("status")))
    case "blq://runs" =>
      Some(("application/json", serve.call("history", Map("limit" -> "100"))))
    case "blq://events" => Some(("application/json", serve.call("events")))
    case "blq://errors" =>
      Some(("application/json", serve.call("errors", Map("limit" -> "50"))))
    case "blq://warnings" =>
      Some(("application/json", serve.call("warnings", Map("limit" -> "50"))))
    case "blq://commands" => Some(("application/json", serve.call("commands")))
    case "blq://guide" => Some(("text/markdown", guide))
    case EventRef(ref) =>
      Some(("application/json", serve.call("event", Map("ref" -> ref))))
    case RunScoped(kind, serial) =>
      val sev = if (kind == "errors") "error" else "warning"
      Some(("application/json", serve.call("query",
        Map("filter" -> s"severity=$sev;run_serial=$serial", "limit" -> "100"))))
    case _ => None
  }

  private val EventRef = "^blq://event/(.+)$".r
  private val RunScoped = "^blq://(errors|warnings)/(\\d+)$".r

  /** The blq://guide fallback text, adapted to graft's tool names
    * (reference ships its SKILL.md; the quick-reference shape is the
    * public fallback in serve.py:3786-3812). */
  val guide: String =
    """# graft Quick Reference
      |
      |## Key Tools
      |- status() - Overview of all sources
      |- commands() - Registered commands
      |- errors(limit=N) / warnings(limit=N) - Recent diagnostics
      |- event(ref) - Error details (ref like "build:1:3")
      |- source_context(ref) - Source lines around an event
      |- diff(run1, run2) - Compare runs
      |- run(name, args...) - Run a registered command template
      |- info(ref) / last() - Run details
      |- query(filter, select, limit) - Filter mini-language over events
      |- sql(q) - Read-only SQL over the registered views
      |
      |## Workflow
      |1. commands() or status() to see current state
      |2. errors() to get recent errors
      |3. event(ref) + source_context(ref) to understand issues
      |4. After fixes: diff(run1, run2) to verify
      |""".stripMargin
}
