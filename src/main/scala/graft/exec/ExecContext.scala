package graft.exec

import java.nio.charset.StandardCharsets
import java.util.concurrent.TimeUnit
import scala.jdk.CollectionConverters._

/** Execution-context capture for the command source (S8, SURVEY.md
  * §2.1): git state, CI-provider environment, and a curated env-var
  * snapshot, denormalized onto every attempt/invocation row so
  * history/diff queries can group by branch, commit, or CI provider.
  *
  * Behavior spec: /root/reference/src/blq/git.py:236-288 (subprocess
  * git with timeout, None on any failure), commands/core.py:2151-2266
  * (CI provider table + short-key renaming + generic `CI` fallback),
  * and commands/core.py:378-417 (DEFAULT_CAPTURE_ENV).
  *
  * All capture is driver-side and best-effort: a missing git binary, a
  * non-repo cwd, or a hung subprocess degrade to None — never to a
  * failed run. Nothing here touches Spark; the captured values ride
  * the existing Invocation/Attempt fields into the store.
  */
object ExecContext {

  final case class GitContext(
      commit: Option[String],
      branch: Option[String],
      dirty: Option[Boolean])

  object GitContext { val empty: GitContext = GitContext(None, None, None) }

  /** Everything the write paths denormalize onto a run. */
  final case class Captured(
      git: GitContext,
      ci: Option[Map[String, String]],
      environment: Option[Map[String, String]])

  object Captured { val empty: Captured = Captured(GitContext.empty, None, None) }

  /** CI provider detection table: detection env var → (provider name,
    * vars to capture). Ordered — first detected provider wins, like the
    * reference's dict iteration (core.py:2152). */
  val CiProviders: Seq[(String, (String, Seq[String]))] = Seq(
    "GITHUB_ACTIONS" -> ("github", Seq(
      "GITHUB_RUN_ID", "GITHUB_RUN_NUMBER", "GITHUB_WORKFLOW", "GITHUB_JOB",
      "GITHUB_REF", "GITHUB_SHA", "GITHUB_REPOSITORY", "GITHUB_ACTOR",
      "GITHUB_EVENT_NAME", "GITHUB_PR_NUMBER")),
    "GITLAB_CI" -> ("gitlab", Seq(
      "CI_JOB_ID", "CI_PIPELINE_ID", "CI_COMMIT_SHA", "CI_COMMIT_REF_NAME",
      "CI_PROJECT_PATH", "CI_MERGE_REQUEST_IID", "GITLAB_USER_LOGIN")),
    "JENKINS_URL" -> ("jenkins", Seq(
      "BUILD_NUMBER", "BUILD_ID", "JOB_NAME", "BUILD_URL", "GIT_COMMIT",
      "GIT_BRANCH", "CHANGE_ID")),
    "CIRCLECI" -> ("circleci", Seq(
      "CIRCLE_BUILD_NUM", "CIRCLE_WORKFLOW_ID", "CIRCLE_JOB", "CIRCLE_SHA1",
      "CIRCLE_BRANCH", "CIRCLE_PR_NUMBER", "CIRCLE_PROJECT_REPONAME")),
    "TRAVIS" -> ("travis", Seq(
      "TRAVIS_BUILD_ID", "TRAVIS_BUILD_NUMBER", "TRAVIS_JOB_ID",
      "TRAVIS_COMMIT", "TRAVIS_BRANCH", "TRAVIS_PULL_REQUEST",
      "TRAVIS_REPO_SLUG")),
    "BUILDKITE" -> ("buildkite", Seq(
      "BUILDKITE_BUILD_ID", "BUILDKITE_BUILD_NUMBER", "BUILDKITE_JOB_ID",
      "BUILDKITE_COMMIT", "BUILDKITE_BRANCH", "BUILDKITE_PULL_REQUEST",
      "BUILDKITE_PIPELINE_SLUG")),
    "AZURE_PIPELINES" -> ("azure", Seq(
      "BUILD_BUILDID", "BUILD_BUILDNUMBER", "BUILD_SOURCEVERSION",
      "BUILD_SOURCEBRANCH", "SYSTEM_PULLREQUEST_PULLREQUESTID",
      "BUILD_REPOSITORY_NAME")))

  private val ShortKeyPrefixes =
    Seq("GITHUB_", "CI_", "CIRCLE_", "TRAVIS_", "BUILDKITE_", "BUILD_")

  /** Env vars snapshotted onto every run (core.py:378-417): toolchain
    * and CI markers a build's outcome actually depends on. */
  val DefaultCaptureEnv: Seq[String] = Seq(
    "PATH", "HOME", "USER", "SHELL",
    "PYTHONPATH", "VIRTUAL_ENV", "CONDA_DEFAULT_ENV", "CONDA_PREFIX",
    "CC", "CXX", "CFLAGS", "CXXFLAGS", "LDFLAGS", "LD_LIBRARY_PATH",
    "MAKEFLAGS", "CMAKE_PREFIX_PATH",
    "NODE_PATH", "NPM_CONFIG_PREFIX",
    "CARGO_HOME", "RUSTUP_HOME",
    "GOPATH", "GOROOT",
    "JAVA_HOME", "CLASSPATH",
    "CI", "GITHUB_ACTIONS", "GITLAB_CI", "JENKINS_URL")

  /** Run `git args…` in `cwd`; Some(trimmed stdout) on exit 0, None on
    * nonzero exit, timeout, or a missing binary. Output is drained on a
    * separate thread so a large `status --porcelain` can never deadlock
    * the pipe against the timeout wait. */
  def runGit(cwd: Option[String], timeoutMs: Long, args: String*): Option[String] =
    try {
      val pb = new ProcessBuilder(("git" +: args).asJava)
      cwd.foreach(d => pb.directory(new java.io.File(d)))
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val proc = pb.start()
      proc.getOutputStream.close()
      val buf = new java.io.ByteArrayOutputStream()
      val drain = new Thread(() => {
        try proc.getInputStream.transferTo(buf) catch { case _: Exception => }
      })
      drain.setDaemon(true)
      drain.start()
      if (!proc.waitFor(timeoutMs, TimeUnit.MILLISECONDS)) {
        proc.destroyForcibly(); proc.waitFor(); None
      } else {
        drain.join(timeoutMs)
        if (proc.exitValue() == 0)
          Some(new String(buf.toByteArray, StandardCharsets.UTF_8).trim)
        else None
      }
    } catch { case _: Exception => None }

  /** Commit / branch / dirty of the repo containing `cwd`
    * (git.py:236-288: rev-parse HEAD, rev-parse --abbrev-ref HEAD,
    * status --porcelain non-emptiness). */
  def gitContext(cwd: Option[String] = None, timeoutMs: Long = 2000): GitContext =
    GitContext(
      commit = runGit(cwd, timeoutMs, "rev-parse", "HEAD"),
      branch = runGit(cwd, timeoutMs, "rev-parse", "--abbrev-ref", "HEAD"),
      dirty = runGit(cwd, timeoutMs, "status", "--porcelain").map(_.nonEmpty))

  /** Detect the CI provider from `env` and capture its context vars
    * under short lowercase keys (GITHUB_RUN_ID → run_id); a bare `CI`
    * var with no recognized provider yields {provider: unknown}. None
    * outside CI. */
  def ciContext(env: Map[String, String] = sys.env): Option[Map[String, String]] =
    CiProviders.collectFirst {
      case (detectVar, (provider, vars)) if env.get(detectVar).exists(_.nonEmpty) =>
        Map("provider" -> provider) ++ vars.flatMap { v =>
          env.get(v).map { value =>
            val short = ShortKeyPrefixes.find(v.startsWith)
              .map(p => v.substring(p.length)).getOrElse(v)
            short.toLowerCase -> value
          }
        }
    }.orElse(
      if (env.get("CI").exists(_.nonEmpty))
        Some(Map("provider" -> "unknown", "ci" -> "true"))
      else None)

  /** Snapshot of the vars in `names` that are present; None when none
    * are (the reference stores NULL, not {}). */
  def captureEnvironment(names: Seq[String] = DefaultCaptureEnv,
      env: Map[String, String] = sys.env): Option[Map[String, String]] = {
    val m = names.flatMap(n => env.get(n).map(n -> _)).toMap
    if (m.isEmpty) None else Some(m)
  }

  /** Full capture for a run starting in `cwd`. */
  def capture(cwd: Option[String] = None): Captured =
    Captured(gitContext(cwd), ciContext(), captureEnvironment())
}
