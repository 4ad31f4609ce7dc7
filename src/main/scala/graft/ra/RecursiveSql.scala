package graft.ra

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{Distinct, LogicalPlan, SubqueryAlias, Union, UnresolvedWith}
import org.apache.spark.sql.graftbridge.PlanBridge

/** `WITH RECURSIVE … UNION …` — BOTH set-semantics spellings.
  *
  * Spark 4.1 executes the `UNION ALL` form natively (UnionLoop) but
  * rejects the `UNION` (distinct) form at analysis time
  * (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE) — yet distinct recursion is
  * exactly what cyclic closures need (UNION ALL on a cycle never
  * terminates). The reference's WITH RECURSIVE accepts both (standard
  * SQL; DuckDB likewise).
  *
  * This front end parses the text with Spark's own parser (the GRAMMAR
  * accepts both spellings — only the analyzer rejects distinct), then
  * compiles each UNION-distinct recursive CTE onto [[RA.fixpoint]]'s
  * semi-naive loop at the PLAN level: base = the non-recursive branch,
  * step = the recursive branch with the self-reference substituted by
  * the running frontier. Non-recursive CTEs are inlined; queries with
  * no distinct-recursive CTE go to Spark untouched (native UnionLoop
  * for UNION ALL recursion).
  *
  * Supported recursive shape: linear recursion `base UNION step` where
  * only `step` references the CTE (the same restriction Spark's native
  * UnionLoop enforces for UNION ALL; mutual/non-linear recursion is
  * [[RA.fixpointN]]'s / the datalog front end's job). */
object RecursiveSql {

  def sql(spark: SparkSession, query: String): DataFrame = {
    val plan = PlanBridge.parsePlan(spark, query)
    rewritePlan(spark, plan).getOrElse(PlanBridge.ofRows(spark, plan))
  }

  /** Plan-level entry for delegating parsers ([[graft.server.GraftSqlParser]]):
    * Some(compiled result) when `plan` is a WITH containing a
    * UNION-distinct recursive CTE — the shape Spark's analyzer would
    * reject — None otherwise (including native UNION ALL recursion,
    * which must stay with Spark's UnionLoop). */
  def rewritePlan(spark: SparkSession, plan: LogicalPlan): Option[DataFrame] =
    plan match {
      case w: UnresolvedWith if w.cteRelations.exists { case (n, sa, _) =>
          isDistinctRecursive(n, sa) } =>
        Some(compile(spark, w))
      case _ => None
    }

  private def isDistinctRecursive(name: String, sa: SubqueryAlias): Boolean =
    unwrapAliases(sa.child)._2 match {
      case Distinct(u: Union) => refersTo(u, name)
      case _ => false
    }

  private def unwrapAliases(p: LogicalPlan): (Option[Seq[String]], LogicalPlan) =
    p match {
      case a: UnresolvedSubqueryColumnAliases => (Some(a.outputColumnNames), a.child)
      case other => (None, other)
    }

  /** Number of references to CTE `name` in `p` (subqueries included).
    * Distinguishes linear recursion (exactly one in the step) from
    * non-linear — substituting a frontier for TWO references would
    * silently compute Δ×Δ instead of the (Δ×all)∪(all×Δ) a non-linear
    * rule needs, so non-linear must be rejected, never mis-run. */
  private def refCount(p: LogicalPlan, name: String): Int = {
    var n = 0
    def walk(q: LogicalPlan): Unit = {
      q.foreach {
        case u: UnresolvedRelation
          if u.multipartIdentifier.size == 1 &&
            u.multipartIdentifier.head.equalsIgnoreCase(name) => n += 1
        case node => node.expressions.foreach(_.foreach {
          case se: SubqueryExpression => walk(se.plan)
          case _ =>
        })
      }
    }
    walk(p)
    n
  }

  private def refersTo(p: LogicalPlan, name: String): Boolean =
    refCount(p, name) > 0

  /** Inline every name in `defs` (single-part references only —
    * qualified names belong to the catalog), descending into expression
    * subqueries. */
  private def substitute(plan: LogicalPlan,
                         defs: Map[String, LogicalPlan]): LogicalPlan =
    plan match {
      case u: UnresolvedRelation if u.multipartIdentifier.size == 1 &&
          defs.contains(u.multipartIdentifier.head.toLowerCase) =>
        defs(u.multipartIdentifier.head.toLowerCase)
      case other =>
        other.mapChildren(substitute(_, defs)).transformExpressionsUp {
          case se: SubqueryExpression => se.withNewPlan(substitute(se.plan, defs))
        }
    }

  private def compile(spark: SparkSession, w: UnresolvedWith): DataFrame = {
    var defs = Map.empty[String, LogicalPlan]
    for ((name, sa, _) <- w.cteRelations) {
      val (aliases, inner) = unwrapAliases(sa.child)
      val compiled: LogicalPlan =
        if (!refersTo(inner, name)) {
          val spliced = substitute(inner, defs)
          aliases.fold(spliced)(a =>
            UnresolvedSubqueryColumnAliases(a, spliced))
        } else inner match {
          case Distinct(Union(Seq(l, r), false, false))
              if refCount(l, name) == 0 && refCount(r, name) == 1 =>
            val base0 = PlanBridge.ofRows(spark, substitute(l, defs))
            val base = aliases.fold(base0)(a => base0.toDF(a: _*))
            val step: DataFrame => DataFrame = frontier => {
              // the fixpoint's frontier carries the STEP's output names
              // after the first iteration — the CTE's declared columns
              // are what the self-reference resolves against
              val named = frontier.toDF(base.columns: _*)
              val frPlan = SubqueryAlias(name, PlanBridge.logicalPlan(named))
              PlanBridge.ofRows(spark,
                substitute(r, defs + (name.toLowerCase -> frPlan)))
            }
            PlanBridge.logicalPlan(RA.fixpoint(base, step))
          case Union(_, _, _) | Distinct(Union(_, _, _)) =>
            throw new IllegalArgumentException(
              s"recursive CTE '$name': only LINEAR recursion is supported " +
                "(exactly one self-reference, in the recursive branch — " +
                "non-linear/mutual recursion belongs to the datalog front " +
                "end's fixpointN; UNION ALL mixed with distinct-recursive " +
                "CTEs in one WITH is not supported either)")
          case _ => throw new IllegalArgumentException(
            s"recursive CTE '$name' is not of the form base UNION step")
        }
      defs += name.toLowerCase -> SubqueryAlias(name, compiled)
    }
    PlanBridge.ofRows(spark, substitute(w.child, defs))
  }
}
