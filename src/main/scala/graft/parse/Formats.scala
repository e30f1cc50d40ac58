package graft.parse

import graft.model.Severity

/** Built-in format parsers — the subset of duck_hunt's 100+ formats the
  * reference's own tests exercise (FIXTURES.md §3), plus a generic
  * fallback. Pattern knowledge is from the public output formats of the
  * tools themselves; no reference code is reproduced.
  */
object GccParser extends LogParser {
  val format = "gcc_text"
  val tool = "gcc"
  // src/main.c:15:5: error: message
  private val diag = """^([^:\s]+):(\d+):(?:(\d+):)?\s*(error|warning|note|fatal error):\s*(.*)$""".r
  // three real-world ld shapes: `file.c:42: undefined reference to ...`,
  // the relocation form `file.c:(.text+0x15): undefined reference ...`,
  // and the `/usr/bin/ld: file.c:(.text+0x15): ...` prefix modern
  // binutils emits.
  private val linker =
    """^(?:/[^\s:]*ld:\s*)?([^:\s]+):(?:(\d+):|\(\.[\w.]+\+0x[0-9a-fA-F]+\):)?\s*undefined reference to\s*(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined || linker.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, col, sev, msg) =>
        val severity = if (sev == "fatal error") Severity.Error else sev
        out += mk(idx, i + 1, severity, msg, raw, "compile",
          file = Some(file), line = Some(line.toInt),
          col = Option(col).map(_.toInt))
        idx += 1
      case linker(file, line, sym) =>
        out += mk(idx, i + 1, Severity.Error, s"undefined reference to $sym",
          raw, "link", file = Some(file), line = Option(line).map(_.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object MypyParser extends LogParser {
  val format = "mypy_text"
  val tool = "mypy"
  // src/a.py:12: error: Incompatible types ... [assignment]
  private val diag = """^([^:\s]+):(\d+)(?::(\d+))?:\s*(error|warning|note):\s*(.*?)(?:\s+\[([a-z0-9-]+)\])?$""".r
  private val summary = """^Found \d+ errors? in \d+ files?.*$""".r

  def sniff(lines: Array[String]): Int = {
    val d = lines.count(l => diag.findFirstIn(l).isDefined)
    // mypy output is distinguished from gcc by its summary line / [code] tags
    val bonus = lines.count(l => summary.findFirstIn(l).isDefined || l.matches(""".*\[[a-z-]+\]\s*$"""))
    d + bonus
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, col, sev, msg, code) =>
        out += mk(idx, i + 1, sev, msg, raw, "type-check",
          code = Option(code), file = Some(file), line = Some(line.toInt),
          col = Option(col).map(_.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object PytestParser extends LogParser {
  val format = "pytest_text"
  val tool = "pytest"
  // FAILED tests/test_x.py::test_name - AssertionError: ...
  // (test id group spans spaces for parametrized ids; the first
  // " - " separates id from message)
  private val result = """^(FAILED|PASSED|ERROR|SKIPPED|XFAIL|XPASS)\s+([^\s:]+)::(.+?)(?:\s+-\s+(.*))?$""".r
  // -v / verbose reporter puts the status AFTER the id (and often a
  // trailing percent gauge): tests/test_x.py::test_name PASSED  [ 42%].
  // The id group is (.+?), not (\S+?): parametrized ids render their
  // params verbatim and may contain spaces — test_parse[two words].
  private val verbose =
    """^([^\s:]+)::(.+?)\s+(FAILED|PASSED|ERROR|SKIPPED|XFAIL|XPASS)(?:\s+\[\s*\d+%\])?\s*$""".r
  private val sessionStart = """^=+ test session starts =+$""".r
  private val shortSummary = """^=+ short test summary info =+$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => result.findFirstIn(l).isDefined ||
      verbose.findFirstIn(l).isDefined ||
      sessionStart.findFirstIn(l).isDefined || shortSummary.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    val seen = scala.collection.mutable.Set[String]()
    // keys that will get a (message-bearing) short-summary line — the
    // verbose inline line for the same test defers to it
    val summaryKeys = content.linesIterator.collect {
      case result(status, file, test, _) => s"$file::$test::$status"
    }.toSet
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case result(status, file, test, msg) if !seen.contains(s"$file::$test::$status") =>
        seen += s"$file::$test::$status"
        val sev = status match {
          case "FAILED" | "ERROR" => Severity.TestFail
          case "PASSED" | "XPASS" => Severity.TestPass
          case _ => Severity.Info
        }
        out += mk(idx, i + 1, sev,
          Option(msg).getOrElse(s"$status $file::$test"), raw, "test",
          test = Some(test), file = Some(file))
        idx += 1
      // verbose-reporter line; the shared `seen` key dedups against the
      // short-summary line for the same (test, status) so -v runs with
      // a trailing summary don't double-count
      case verbose(file, test, status)
          if !seen.contains(s"$file::$test::$status") &&
            !summaryKeys.contains(s"$file::$test::$status") =>
        seen += s"$file::$test::$status"
        val sev = status match {
          case "FAILED" | "ERROR" => Severity.TestFail
          case "PASSED" | "XPASS" => Severity.TestPass
          case _ => Severity.Info
        }
        out += mk(idx, i + 1, sev, s"$status $file::$test", raw, "test",
          test = Some(test), file = Some(file))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

/** ESLint "stylish" text output: a file header line followed by
  * `  line:col  severity  message  rule-id` rows. */
object EslintParser extends LogParser {
  val format = "eslint_text"
  val tool = "eslint"
  private val fileHeader = """^(/[^\s:]+|[A-Za-z]?[^\s:]*\.(?:js|jsx|ts|tsx|mjs|cjs|vue))$""".r
  private val diag = """^\s+(\d+):(\d+)\s+(error|warning)\s+(.*?)\s+([@a-z0-9/-]+)$""".r

  def sniff(lines: Array[String]): Int = {
    val d = lines.count(l => diag.findFirstIn(l).isDefined)
    if (d > 0 && lines.exists(l => fileHeader.findFirstIn(l).isDefined)) d + 1 else 0
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var currentFile: Option[String] = None
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case fileHeader(f) => currentFile = Some(f)
      case diag(line, col, sev, msg, rule) =>
        out += mk(idx, i + 1, sev, msg, raw, "lint",
          rule = Some(rule), file = currentFile,
          line = Some(line.toInt), col = Some(col.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object CargoParser extends LogParser {
  val format = "cargo_build"
  val tool = "cargo"
  // error[E0308]: mismatched types   /   warning: unused variable: `x`
  private val head = """^(error|warning)(?:\[([A-Z]\d+)\])?:\s*(.*)$""".r
  private val loc = """^\s*-->\s*([^:\s]+):(\d+):(\d+)\s*$""".r
  private val compiling = """^\s*(Compiling|Finished|Checking)\s.*$""".r

  def sniff(lines: Array[String]): Int = {
    val hits = lines.count(l => loc.findFirstIn(l).isDefined || compiling.findFirstIn(l).isDefined)
    if (hits > 0) hits + lines.count(l => head.findFirstIn(l).isDefined) else 0
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val lines = content.linesIterator.toArray
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var i = 0
    while (i < lines.length) {
      lines(i) match {
        case head(sev, code, msg) =>
          // location is on the following `--> file:line:col` line if present
          val (file, line, col) = lines.drop(i + 1).take(3)
            .collectFirst { case loc(f, l, c) => (Some(f), Some(l.toInt), Some(c.toInt)) }
            .getOrElse((None, None, None))
          out += mk(idx, i + 1, sev, msg, lines(i), "compile",
            code = Option(code), file = file, line = line, col = col)
          idx += 1
        case _ =>
      }
      i += 1
    }
    out.result()
  }
}

object MakeParser extends LogParser {
  val format = "make_error"
  val tool = "make"
  // make: *** [target] Error 2
  private val err = """^make(?:\[\d+\])?:\s*\*\*\*\s*\[([^\]]+)\]\s*Error\s*(\d+).*$""".r
  private val noRule = """^make(?:\[\d+\])?:\s*\*\*\*\s*(No rule to make target.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => err.findFirstIn(l).isDefined || noRule.findFirstIn(l).isDefined ||
      l.startsWith("make[") || l.startsWith("make:"))

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case err(target, code) =>
        out += mk(idx, i + 1, Severity.Error,
          s"target '$target' failed with error $code", raw, "build", code = Some(code))
        idx += 1
      case noRule(msg) =>
        out += mk(idx, i + 1, Severity.Error, msg, raw, "build")
        idx += 1
      case _ =>
    }
    out.result()
  }
}

/** Fallback: any `file:line[:col]: message` plus keyword-classified lines
  * ("error"/"warning" anywhere). Never wins auto-detect against a
  * specific format (sniff is heavily damped). */
object GenericParser extends LogParser {
  val format = "generic_lint"
  val tool = "generic"
  private val located = """^([^:\s]+):(\d+)(?::(\d+))?:\s*(.*)$""".r
  private val keyword = """(?i)\b(error|warning|failed|failure)\b""".r

  def sniff(lines: Array[String]): Int = {
    val n = lines.count(l => located.findFirstIn(l).isDefined || keyword.findFirstIn(l).isDefined)
    n / 4 // damped: only wins when nothing specific matches
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case located(file, line, col, msg) =>
        val sev = if (keyword.findFirstIn(msg).exists(_.toLowerCase.startsWith("warn")))
          Severity.Warning else Severity.Error
        out += mk(idx, i + 1, sev, msg, raw, "generic",
          file = Some(file), line = Some(line.toInt), col = Option(col).map(_.toInt))
        idx += 1
      case raw2 if keyword.findFirstIn(raw2).isDefined =>
        val sev = if (keyword.findFirstIn(raw2).exists(_.toLowerCase.startsWith("warn")))
          Severity.Warning else Severity.Error
        out += mk(idx, i + 1, sev, raw2.trim, raw2, "generic")
        idx += 1
      case _ =>
    }
    out.result()
  }
}
