package graft.plans

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, In, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Partition-pruning optimizer rule for invocation-scoped event
  * queries — the Spark-native substitute for the reference's ART index
  * on `events.invocation_id` (bird_schema.sql events indexes): raw
  * parquet has no secondary index, but events are date-partitioned and
  * the tiny invocations dimension knows each invocation's date.
  *
  * `Analytics.eventsForRun` already applies this lookup by hand; the
  * rule extends the same optimization to ARBITRARY user SQL
  * (`SELECT ... FROM events WHERE invocation_id = '…'`) by rewriting
  *
  * {{{ Filter(invocation_id = 'x', events-relation) }}}
  * into
  * {{{ Filter(invocation_id = 'x' AND date = <x's date>, …) }}}
  *
  * whose date conjunct FileSourceStrategy then turns into a partition
  * filter — one partition scanned instead of the whole history. At
  * 100 TB that is the difference between a point lookup and a full
  * table scan.
  *
  * Stores opt in via [[register]] (EventStore does it on construction):
  * path of the events table + an id→date lookup backed by the
  * invocations dimension. Conservative by design: unknown ids, an
  * existing date predicate, or an unregistered relation leave the plan
  * untouched — the rewrite is only ever an additional conjunct implied
  * by the store's write invariant (an event row carries its
  * invocation's date), so correctness never depends on the lookup
  * being complete.
  */
object InvocationDatePruning extends Rule[LogicalPlan] with PredicateHelper {

  /** What a store contributes: a per-id date lookup plus a liveness
    * flag. The registry holds it WEAKLY — a store (and the
    * SparkSession its lookup closes over) must not be retained for
    * the JVM lifetime just because it once registered, and a stale
    * entry for a stopped session must disable pruning, not fail the
    * querying session. */
  trait DateSource {
    def invocationDate(id: String): Option[String]
    def active: Boolean
  }

  private val registry =
    new ConcurrentHashMap[String, java.lang.ref.WeakReference[DateSource]]()

  private def normalize(p: String): String =
    p.replaceFirst("^file:/*", "/").stripSuffix("/")

  /** Register a store's events table path with its date source. */
  def register(eventsPath: String, source: DateSource): Unit =
    registry.put(normalize(eventsPath), new java.lang.ref.WeakReference(source))

  private def lookupFor(rel: LogicalRelation): Option[DateSource] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.iterator.flatMap { rp =>
          val key = normalize(rp.toUri.getPath)
          Option(registry.get(key)).flatMap { ref =>
            val src = ref.get()
            if (src == null) { registry.remove(key, ref); None }
            else if (!src.active) None
            else Some(src)
          }
        }.nextOption()
      case _ => None
    }

  /** invocation-id literals from one equality/IN conjunct on `attr`. */
  private def idLiterals(conjunct: Expression,
      attr: AttributeReference): Seq[String] = conjunct match {
    case EqualTo(a: AttributeReference, Literal(v: UTF8String, StringType))
        if a.semanticEquals(attr) => Seq(v.toString)
    case EqualTo(Literal(v: UTF8String, StringType), a: AttributeReference)
        if a.semanticEquals(attr) => Seq(v.toString)
    case In(a: AttributeReference, vs)
        if a.semanticEquals(attr) &&
          vs.nonEmpty && vs.forall {
            case Literal(_: UTF8String, StringType) => true; case _ => false
          } =>
      vs.map { case Literal(v: UTF8String, StringType) => v.toString }
    case _ => Seq.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, rel: LogicalRelation) =>
      (rel.output.find(_.name == "date"),
        rel.output.find(_.name == "invocation_id"),
        lookupFor(rel)) match {
        case (Some(dAttr), Some(iAttr), Some(src))
            if dAttr.dataType == DateType =>
          val conjuncts = splitConjunctivePredicates(cond)
          val ids = conjuncts.flatMap(idLiterals(_, iAttr.asInstanceOf[AttributeReference])).distinct
          val alreadyPruned = conjuncts.exists(_.references.contains(dAttr))
          if (ids.isEmpty || alreadyPruned) f
          else {
            // a lookup failure (stopped session, IO) must degrade to
            // "no prune", never fail the querying plan
            def safe(id: String): Option[String] =
              try src.invocationDate(id) catch { case _: Exception => None }
            val resolved = ids.map(id => id -> safe(id))
            val dates = resolved.flatMap(_._2).distinct
            // every id must resolve, or the prune could drop rows for
            // ids the lookup has not (yet) seen
            if (dates.isEmpty || resolved.exists(_._2.isEmpty)) f
            else {
              val dLits = dates.map(d => Literal.create(java.sql.Date.valueOf(d), DateType))
              val pred = if (dLits.size == 1) EqualTo(dAttr, dLits.head)
                else In(dAttr, dLits)
              f.copy(condition = And(cond, pred))
            }
          }
        case _ => f
      }
  }
}
