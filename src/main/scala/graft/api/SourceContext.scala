package graft.api

import java.nio.file.{Files, Path, Paths}

/** Source-file context for events (P10 + the inspect surface it
  * guards; reference output.py:844-868 `resolve_under_root` and
  * output.py:871-920 `read_source_context`, services/inspect.py:42).
  *
  * `ref_file` comes out of parsed compiler/test output and is
  * UNTRUSTED: a crafted absolute path or `..` traversal must not read
  * files outside the project tree. Absolute paths that legitimately
  * live inside the root (compilers often emit them) stay allowed.
  */
object SourceContext {

  /** Resolve `refFile` against `root`, refusing anything that escapes
    * it. Returns the real (symlink-resolved) path iff it lies at or
    * under the resolved root; None otherwise — including on any IO or
    * path-syntax error (never throw on untrusted input). */
  def resolveUnderRoot(root: String, refFile: String): Option[Path] =
    try {
      val rootReal = Paths.get(root).toRealPath()
      val candidate = Paths.get(refFile)
      val base = if (candidate.isAbsolute) candidate
        else rootReal.resolve(candidate)
      // normalize first so `a/../../x` is judged on where it LANDS;
      // toRealPath additionally collapses symlink escapes when the
      // target exists (the only case a read follows anyway).
      val resolved = if (Files.exists(base)) base.toRealPath()
        else base.normalize()
      if (resolved.startsWith(rootReal)) Some(resolved) else None
    } catch { case _: Exception => None }

  /** Read `context` lines around 1-indexed `refLine` of `refFile`
    * (resolved strictly under `refRoot`), formatted with line numbers
    * and a `>` marker on the referenced line. None when the file is
    * missing, the line is out of range, or the path escapes the root. */
  def readSourceContext(refFile: String, refLine: Int, refRoot: String,
      context: Int = 5): Option[String] =
    resolveUnderRoot(refRoot, refFile)
      .filter(Files.isRegularFile(_))
      .flatMap { p =>
        try {
          val lines = new String(Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8).linesIterator.toVector
          if (refLine < 1 || refLine > lines.size) None
          else {
            val start = math.max(0, refLine - context - 1)
            val end = math.min(lines.size, refLine + context)
            val body = (start until end).map { i =>
              val marker = if (i + 1 == refLine) ">" else " "
              f"$marker ${i + 1}%5d | ${lines(i)}"
            }
            Some(body.mkString("\n"))
          }
        } catch { case _: Exception => None }
      }
}
