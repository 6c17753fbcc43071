package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.DoubleType

/** Materialized summary-table rewrite — the aggregation-navigator
  * pattern every 100 TB warehouse leans on: a pre-aggregated table
  * keyed by a dimension set answers any coarser aggregate over the
  * fact WITHOUT scanning the fact, because algebraic aggregates
  * compose (sum-of-sums, min-of-mins, count as sum-of-counts, avg as
  * merged-sum / merged-count).
  *
  * [[SummaryRegistry]] holds the registered summaries (fact path →
  * summary plan + dims + measures); [[RewriteAggregateToSummary]] is
  * the optimizer rule (injected via `SparkSessionExtensions` in
  * [[GraftExtensions]]) that redirects matching aggregates. The match
  * is conservative and all-or-nothing: bare dim-attribute groupings
  * (any subset, including global), aggregates drawn from
  * sum/count/min/max/avg over covered measures (arbitrarily nested in
  * scalar expressions, e.g. `round(sum(x), 2)`), an optional
  * dims-only filter — anything else leaves the plan untouched.
  *
  * Correctness contract: the summary covers the fact exactly (same
  * rows, no filter at build time) and the rewrite preserves every
  * output attribute's name, exprId, and dataType, so parent plan nodes
  * resolve unchanged.
  */
object SummaryRegistry {

  /** `plan` is the ANALYZED scan of the summary parquet; `dims` the
    * grouping columns; `measures` the covered fact columns — for each
    * measure `m` the summary has `sum_m`/`min_m`/`max_m`/`cnt_m`
    * (non-null count, the avg denominator), plus one `cnt` row-count
    * column.
    */
  final case class Summary(
      factPath: String, mvPath: String, plan: LogicalPlan,
      dims: Set[String], measures: Set[String])

  private val reg = new ConcurrentHashMap[String, Summary]()

  def register(s: Summary): Unit = reg.put(normalize(s.factPath), s)
  def clear(): Unit = reg.clear()

  /** Swap in a freshly analyzed plan for every summary stored at
    * `mvPath` — a registered plan pins the parquet file listing it was
    * analyzed with, so a refresh (merge/rebuild) that replaces the
    * summary's files must re-register or covered queries would read
    * deleted files.
    */
  def refreshByMvPath(mvPath: String, fresh: LogicalPlan): Unit =
    reg.replaceAll((_, s) =>
      if (normalize(s.mvPath) == normalize(mvPath)) s.copy(plan = fresh) else s)

  def lookup(rootPaths: Seq[String]): Option[Summary] =
    rootPaths.map(normalize) match {
      case Seq(p) => Option(reg.get(p))
      case _ => None // multi-root scans are never a registered fact
    }

  /** Path equality across `file:` / bare-path spellings. */
  private def normalize(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")
}

object RewriteAggregateToSummary extends Rule[LogicalPlan] {

  import SummaryRegistry.Summary

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      destructure(agg.child).flatMap { case (filt, lr) =>
        SummaryRegistry
          .lookup(pathsOf(lr))
          .flatMap(rewrite(agg, filt, _))
      }.getOrElse(agg)
  }

  /** Accept Aggregate → [Project(attrs)]* → [Filter]* → Relation and
    * collect the filter conjunction. Column-pruning Projects are
    * attribute-only; anything computed disqualifies the shape.
    */
  private def destructure(p: LogicalPlan): Option[(Option[Expression], LogicalRelation)] =
    p match {
      case lr: LogicalRelation => Some((None, lr))
      case Project(ps, ch) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        destructure(ch)
      case Filter(cond, ch) =>
        destructure(ch).map { case (f, lr) =>
          (Some(f.map(And(_, cond)).getOrElse(cond)), lr)
        }
      case _ => None
    }

  private def pathsOf(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
      fs.location.rootPaths.map(_.toString)
    case _ => Seq.empty
  }

  private def rewrite(agg: Aggregate, filt: Option[Expression], s: Summary): Option[LogicalPlan] = {
    // fresh attribute instances per rewrite site so two scans of the
    // same summary in one query can't collide on exprIds
    val mvPlan = s.plan.transformUp { case r: LogicalRelation => r.newInstance() }
    val mv: Map[String, Attribute] = mvPlan.output.map(a => a.name -> a).toMap

    def dimAttr(a: AttributeReference): Option[Attribute] =
      if (s.dims.contains(a.name)) mv.get(a.name) else None

    // rewrite one aggregate call to its partial-merge form
    def mergeAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      def merged(f: AggregateFunction): Expression =
        ae.copy(aggregateFunction = f)
      ae.aggregateFunction match {
        case Sum(c: AttributeReference, _) if s.measures.contains(c.name) =>
          mv.get(s"sum_${c.name}").map(m => merged(Sum(m)))
        case Min(c: AttributeReference) if s.measures.contains(c.name) =>
          mv.get(s"min_${c.name}").map(m => merged(Min(m)))
        case Max(c: AttributeReference) if s.measures.contains(c.name) =>
          mv.get(s"max_${c.name}").map(m => merged(Max(m)))
        case c: Count if c.children.forall(_.foldable) =>
          // coalesce to 0: Sum over a zero-row summary (empty fact,
          // global aggregate) is NULL where count(*) must be 0
          mv.get("cnt").map(m => Coalesce(Seq(merged(Sum(m)), Literal(0L))))
        case Average(c: AttributeReference, _) if s.measures.contains(c.name) =>
          // denominator is the measure's NON-NULL count (cnt_m), not
          // the row count — avg ignores NULLs. One original aggregate
          // becomes TWO here — each needs its own fresh resultId
          // (toAggregateExpression), because two AggregateExpressions
          // sharing a resultId bind to one slot in the physical
          // aggregate and the quotient reads x/x
          for (sm <- mv.get(s"sum_${c.name}"); cm <- mv.get(s"cnt_${c.name}"))
            yield Divide(
              Cast(Sum(sm).toAggregateExpression(), DoubleType),
              Cast(Sum(cm).toAggregateExpression(), DoubleType))
        case _ => None
      }
    }

    // all-or-nothing expression rewrite: aggregates merge, dim attrs
    // remap, any other attribute reference disqualifies the whole plan.
    // Non-deterministic expressions (rand(), spark_partition_id(),
    // input_file_name()) also disqualify: they are attribute-free, so
    // the generic case would pass them through — but a `rand() < 0.5`
    // filter evaluated per summary GROUP is not the per-fact-ROW
    // sample the query asked for.
    def rw(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => mergeAgg(ae)
      case a: AttributeReference => dimAttr(a)
      case other if other.deterministic =>
        val ch = other.children.map(rw)
        if (ch.forall(_.isDefined)) Some(other.withNewChildren(ch.map(_.get)))
        else None
      case _ => None
    }

    val newGroupings: Option[Seq[Expression]] =
      traverse(agg.groupingExpressions.map {
        case a: AttributeReference => dimAttr(a)
        case _ => None
      })

    val newResults: Option[Seq[NamedExpression]] =
      traverse(agg.aggregateExpressions.map {
        case a: AttributeReference =>
          // grouping column surfaced directly: alias keeps identity
          dimAttr(a).map(m => Alias(m, a.name)(exprId = a.exprId))
        case al: Alias =>
          rw(al.child).collect {
            case c if c.dataType == al.child.dataType =>
              Alias(c, al.name)(exprId = al.exprId)
          }
        case _ => None
      })

    val newFilter: Option[Option[Expression]] = filt match {
      case None => Some(None)
      case Some(cond) => rw(cond).map(Some(_))
    }

    for (g <- newGroupings; r <- newResults; f <- newFilter) yield {
      val child = f.map(Filter(_, mvPlan)).getOrElse(mvPlan)
      Aggregate(g, r, child)
    }
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}
