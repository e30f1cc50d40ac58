package graft.api

/** Annotator plugin discovery (the JVM analog of the reference's
  * `entry_points(group='blq.annotators')` discovery + eager/lazy split,
  * ext/annotator.py:184-224): implementations are concrete classes with
  * a no-arg constructor, advertised through
  * `META-INF/services/graft.api.AnnotatorProvider` and discovered with
  * `java.util.ServiceLoader` — a third-party jar on the classpath can
  * contribute annotators without any code change here.
  *
  * `eager` mirrors the reference's split: eager annotators run inside
  * the ingest write path ([[Annotators.apply]] before the append);
  * non-eager ones are applied at read time / by maintenance jobs via
  * the side-table join ([[Annotators.annotateFromSide]]).
  */
trait AnnotatorProvider {
  def name: String
  def eager: Boolean
  def annotator: Annotators.Annotator
}

object AnnotatorProvider {

  /** Discover all providers on the classpath. Mirrors
    * `load_annotators`: a provider that fails to construct is logged
    * and skipped — one broken plugin must not take down ingest. */
  def loadAll(): Seq[AnnotatorProvider] = {
    val it = java.util.ServiceLoader.load(classOf[AnnotatorProvider]).iterator()
    val out = Seq.newBuilder[AnnotatorProvider]
    var more = true
    var errors = 0
    while (more && errors < 100) {
      // BOTH calls sit inside the guard: ServiceLoader's lazy iterator
      // throws from hasNext() too (Class.forName on a services entry
      // whose class is missing), not only from next()'s constructor.
      // The error budget bounds the loop should an implementation ever
      // re-throw for the same entry instead of advancing past it.
      try {
        more = it.hasNext
        if (more) out += it.next()
      } catch {
        case e: java.util.ServiceConfigurationError =>
          errors += 1
          System.err.println(s"[graft] skipping broken annotator provider: ${e.getMessage}")
      }
    }
    out.result()
  }

  /** Discovered annotators, optionally restricted to eager ones
    * (mirrors `run_annotators(eager_only=...)`). */
  def annotators(eagerOnly: Boolean = false): Seq[Annotators.Annotator] =
    loadAll().filter(p => !eagerOnly || p.eager).map(_.annotator)
}

/** Late (side-table) annotator plugins: enrichments that cannot be a
  * pure Column — they call out of the JVM (git blame) or read external
  * state — and therefore run as bounded driver-side maintenance jobs
  * producing (event_id, annotation_json) for
  * [[Annotators.annotateFromSide]]. Discovered via ServiceLoader on
  * `META-INF/services/graft.api.SideAnnotatorProvider`, same contract
  * as [[AnnotatorProvider]]. */
trait SideAnnotatorProvider {
  def name: String
  def sideTable(store: graft.store.EventStore): org.apache.spark.sql.DataFrame
}

object SideAnnotatorProvider {
  def loadAll(): Seq[SideAnnotatorProvider] = {
    val it = java.util.ServiceLoader.load(classOf[SideAnnotatorProvider]).iterator()
    val out = Seq.newBuilder[SideAnnotatorProvider]
    var more = true
    var errors = 0
    while (more && errors < 100) {
      try {
        more = it.hasNext
        if (more) out += it.next()
      } catch {
        case e: java.util.ServiceConfigurationError =>
          errors += 1
          System.err.println(s"[graft] skipping broken side-annotator provider: ${e.getMessage}")
      }
    }
    out.result()
  }
}

/** Git blame enrichment as a discoverable plugin (reference
  * git.py:150-208 via `blq info`): repo root comes from the
  * `graft.annotate.gitRoot` system property (default: the process
  * cwd), since ServiceLoader plugins are no-arg constructed. */
final class GitBlameAnnotatorProvider extends SideAnnotatorProvider {
  val name = "git_blame"
  def sideTable(store: graft.store.EventStore): org.apache.spark.sql.DataFrame =
    GitAnnotator.sideTable(store,
      sys.props.getOrElse("graft.annotate.gitRoot",
        sys.props.getOrElse("user.dir", ".")))
}

/** Built-in providers, registered through the same META-INF/services
  * mechanism external jars would use — the discovery path in tests is
  * the real one, not a shortcut. */
final class SeverityEscalatorProvider extends AnnotatorProvider {
  val name = "severity_escalator"
  val eager = true
  def annotator: Annotators.Annotator = Annotators.severityEscalator
}

final class FlakyTestTaggerProvider extends AnnotatorProvider {
  val name = "flaky_test_tagger"
  val eager = false
  def annotator: Annotators.Annotator = Annotators.flakyTestTagger
}
