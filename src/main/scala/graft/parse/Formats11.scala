package graft.parse

import graft.model.Severity

/** Eleventh wave of format parsers — build-system and formatter tier:
  * ninja, autotools configure, protoc, GitLab CI, isort, gofmt,
  * rustfmt, meson. Pattern knowledge is from the tools' public output
  * formats; no reference code is reproduced.
  */

object NinjaParser extends LogParser {
  val format = "ninja_build"
  val tool = "ninja"
  // [12/345] CC obj/foo.o   /  FAILED: obj/foo.o
  // ninja: build stopped: subcommand failed.
  private val progress = """^\[(\d+)/(\d+)\]\s+(.*)$""".r
  private val failed = """^FAILED:\s*(.*)$""".r
  private val stopped = """^ninja: (?:build stopped|error):\s*(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => progress.findFirstIn(l).isDefined) +
      lines.count(l => failed.findFirstIn(l).isDefined ||
        stopped.findFirstIn(l).isDefined) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case failed(target) =>
        out += mk(idx, i + 1, Severity.Error, s"FAILED: $target", raw, "build",
          file = Some(target.split("\\s+").headOption.getOrElse(target)))
        idx += 1
      case stopped(msg) =>
        out += mk(idx, i + 1, Severity.Error, msg, raw, "build")
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object ConfigureParser extends LogParser {
  val format = "configure_text"
  val tool = "configure"
  // checking for gcc... yes  /  configure: error: C compiler cannot create executables
  private val check = """^checking (?:for )?(.*)\.\.\.\s*(.*)$""".r
  private val err = """^configure: error:\s*(.*)$""".r
  private val warn = """^configure: WARNING:\s*(.*)$""".r

  def sniff(lines: Array[String]): Int = {
    val c = lines.count(l => check.findFirstIn(l).isDefined)
    if (c == 0) 0
    else c + lines.count(l => err.findFirstIn(l).isDefined ||
      warn.findFirstIn(l).isDefined) * 2
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case err(msg) =>
        out += mk(idx, i + 1, Severity.Error, msg, raw, "configure")
        idx += 1
      case warn(msg) =>
        out += mk(idx, i + 1, Severity.Warning, msg, raw, "configure")
        idx += 1
      case check(what, "no") =>
        out += mk(idx, i + 1, Severity.Info, s"missing: $what", raw, "configure")
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object ProtocParser extends LogParser {
  val format = "protoc_text"
  val tool = "protoc"
  // api/user.proto:12:3: Expected ";".
  // api/user.proto: warning: Import common.proto is unused.
  private val diag = """^([^:\s]+\.proto):(\d+):(\d+):\s*(.*)$""".r
  private val fileDiag = """^([^:\s]+\.proto):\s*(?:(warning|error):\s*)?(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined) * 2 +
      lines.count(l => fileDiag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, msg) =>
        out += mk(idx, i + 1, Severity.Error, msg, raw, "compile",
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case fileDiag(file, sev, msg) =>
        out += mk(idx, i + 1,
          if (sev == "warning") Severity.Warning else Severity.Error,
          msg, raw, "compile", file = Some(file))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object GitlabCiParser extends LogParser {
  val format = "gitlab_ci"
  val tool = "gitlab-ci"
  // section_start:1691836800:build_script\r... / ERROR: Job failed: exit code 1
  private val section = """^section_(?:start|end):\d+:[\w-]+.*$""".r
  private val jobErr = """^ERROR: Job failed(?:.*?):\s*(.*)$""".r
  private val runnerLine = """^Running with gitlab-runner .*$""".r
  private val warn = """^WARNING:\s*(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => section.findFirstIn(l).isDefined ||
      runnerLine.findFirstIn(l).isDefined) * 2 +
      lines.count(l => jobErr.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case jobErr(msg) =>
        out += mk(idx, i + 1, Severity.Error, s"job failed: $msg", raw, "ci")
        idx += 1
      case warn(msg) if !raw.startsWith("WARNING: Cache") =>
        out += mk(idx, i + 1, Severity.Warning, msg, raw, "ci")
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object IsortParser extends LogParser {
  val format = "isort_text"
  val tool = "isort"
  // ERROR: /app/models.py Imports are incorrectly sorted and/or formatted.
  // Fixing /app/views.py
  private val err =
    """^ERROR:\s*(\S+\.py)\s+Imports are incorrectly sorted.*$""".r
  private val fixing = """^Fixing\s+(\S+\.py)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => err.findFirstIn(l).isDefined ||
      fixing.findFirstIn(l).isDefined) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case err(file) =>
        out += mk(idx, i + 1, Severity.Warning, s"imports unsorted: $file",
          raw, "format", file = Some(file))
        idx += 1
      case fixing(file) =>
        out += mk(idx, i + 1, Severity.Info, s"fixed: $file", raw, "format",
          file = Some(file))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object GofmtParser extends LogParser {
  val format = "gofmt_text"
  val tool = "gofmt"
  // gofmt -l just prints file names; diff mode prints "diff -u a.go.orig a.go"
  private val bare = """^(\S+\.go)$""".r
  private val diffHead = """^diff -u.*\.go.*$""".r

  def sniff(lines: Array[String]): Int = {
    val b = lines.count(l => bare.findFirstIn(l).isDefined)
    // every line being a .go path is the -l signature; any other
    // content means this isn't gofmt output
    if (b > 0 && b == lines.count(_.trim.nonEmpty)) b * 2
    else lines.count(l => diffHead.findFirstIn(l).isDefined) * 2
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case bare(file) =>
        out += mk(idx, i + 1, Severity.Warning, s"needs gofmt: $file", raw,
          "format", file = Some(file))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object RustfmtParser extends LogParser {
  val format = "rustfmt_text"
  val tool = "rustfmt"
  // Diff in /src/main.rs at line 4:
  private val diff = """^Diff in (\S+\.rs) at line (\d+):\s*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diff.findFirstIn(l).isDefined) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diff(file, line) =>
        out += mk(idx, i + 1, Severity.Warning, s"needs rustfmt: $file",
          raw, "format", file = Some(file), line = Some(line.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object MesonParser extends LogParser {
  val format = "meson_build"
  val tool = "meson"
  // meson.build:12:0: ERROR: Dependency "zlib" not found
  private val diag =
    """^([^:\s]*meson\.build):(\d+):(\d+):\s*(ERROR|WARNING):\s*(.*)$""".r
  private val header = """^The Meson build system.*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined) * 2 +
      lines.count(l => header.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, sev, msg) =>
        out += mk(idx, i + 1, sev.toLowerCase, msg, raw, "build",
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}
