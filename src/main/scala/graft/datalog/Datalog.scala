package graft.datalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ra.RA

/** Datalog front-end: a Scala ADT mirroring the reference's EDN-datalog
  * surface (xtdb/core2 `core2.datalog`, /root/reference/README.adoc:15),
  * compiled to the same relational combinators the SQL-shaped queries
  * use — exactly the reference's architecture, where both front-ends
  * compile to one logical plan (SURVEY.md §3.2).
  *
  * Mapping (each clause type → RA):
  *   - triple pattern `[e a v]`   → 2-col scan of attribute a; shared
  *     logic variables across clauses → natural equi-joins
  *   - predicate clause           → filter Column over bound vars
  *   - expression binding         → project-extend
  *   - `not-join`                 → left-anti join
  *   - `or-join`                  → union-distinct of compiled branches
  *   - recursive rule             → [[RA.fixpoint]] (semi-naive)
  *   - `:find` aggregates         → group-by over the non-agg find vars
  *
  * Compilation is pure DataFrame construction — Catalyst sees one
  * declarative plan per query (join reordering, pushdown, broadcast
  * selection all apply; the datalog layer adds zero execution machinery).
  */
object Datalog {

  // ---- terms & clauses ----------------------------------------------------
  sealed trait Term
  /** logic variable */
  final case class V(name: String) extends Term
  /** constant */
  final case class C(value: Any) extends Term

  sealed trait Clause
  /** triple pattern `[e a v]`: entity e has attribute a with value v. */
  final case class Triple(e: Term, a: String, v: Term) extends Clause
  /** predicate over bound variables — keeps only TRUE (3VL). */
  final case class Pred(vars: Seq[String], f: Seq[Column] => Column) extends Clause
  /** expression binding: compute `out` from bound variables. */
  final case class Bind(out: String, vars: Seq[String], f: Seq[Column] => Column) extends Clause
  /** not-join: drop bindings with a match in the sub-query (on `vars`). */
  final case class NotJoin(vars: Seq[String], clauses: Seq[Clause]) extends Clause
  /** or-join: bindings matching ANY branch (unified on `vars`). */
  final case class OrJoin(vars: Seq[String], branches: Seq[Seq[Clause]]) extends Clause
  /** rule invocation, possibly recursive. */
  final case class RuleCall(name: String, args: Seq[Term]) extends Clause

  /** One rule: named, with parameter list and one or more bodies
    * (bodies union). A body may recursively call its own rule (linear
    * recursion) — compiled through the fixpoint operator. */
  final case class Rule(name: String, params: Seq[String], bodies: Seq[Seq[Clause]])

  /** `:find` element: a variable, an aggregate over one, or a pull. */
  sealed trait Find
  final case class FVar(name: String) extends Find
  final case class FAgg(fn: String, v: String, as: String) extends Find
  /** pull-style projection `(pull ?v [attrs…])`: the entity bound to
    * `v` materializes as ONE struct column of the named attributes
    * (absent attribute → NULL field) — the reference datalog's document
    * fetch. Not combinable with aggregates. */
  final case class FPull(v: String, attrs: Seq[String], as: String) extends Find

  /** `in`: externally-bound parameters (the reference's `:in` clause) —
    * each (name, value) becomes a pre-bound logic variable visible to
    * top-level clauses (joined/filtered like any other binding). */
  final case class Query(find: Seq[Find], where: Seq[Clause],
                         rules: Seq[Rule] = Nil,
                         in: Seq[(String, Any)] = Nil)

  /** Attribute resolver: attribute name → 2-col DataFrame `(_e, _v)`.
    * The Spark analog of the reference's scan-per-attribute over the
    * document store. */
  type AttrSource = String => DataFrame

  /** Entity tables → attribute sources: every non-id column `c` of
    * `table` (id column `idCol`) becomes attribute `c` with `_e = idCol`. */
  def attrsOf(tables: (DataFrame, String)*): AttrSource = {
    val pairs = tables.flatMap { case (df, idCol) =>
      df.columns.filterNot(_ == idCol).map(c => c -> (df, idCol))
    }
    // last-wins toMap would silently shadow an attribute shared by two
    // tables, resolving triples against the wrong relation — require
    // globally unique attribute names (the document model's namespace)
    val dups = pairs.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"ambiguous attribute name(s) across entity tables: ${dups.mkString(", ")}" +
        " — rename the columns (e.g. prefix with the entity type)")
    val index: Map[String, (DataFrame, String)] = pairs.toMap
    attr => {
      val (df, idCol) = index.getOrElse(attr,
        throw new IllegalArgumentException(s"unknown attribute: $attr"))
      df.select(col(idCol).as("_e"), col(attr).as("_v"))
    }
  }

  // ---- compiler -----------------------------------------------------------

  def run(q: Query, attrs: AttrSource): DataFrame = {
    val ruleIndex = q.rules.map(r => r.name -> r).toMap
    val init = if (q.in.isEmpty) None else Some {
      val spark = org.apache.spark.sql.SparkSession.active
      q.in.foldLeft(spark.range(1).select()) {
        case (df, (n, v)) => df.withColumn(n, lit(v))
      }
    }
    val rel = compileClauses(q.where, attrs, ruleIndex, init)

    val aggs = q.find.collect { case a: FAgg => a }
    val keys = q.find.collect { case FVar(n) => n }
    val pulls = q.find.collect { case p: FPull => p }
    require(aggs.isEmpty || pulls.isEmpty,
      "pull and aggregates cannot mix in one :find")
    if (pulls.nonEmpty) {
      // left-join each pulled attribute on the entity var, then pack
      val joined = pulls.foldLeft(rel) { (acc, p) =>
        p.attrs.foldLeft(acc) { (a2, attr) =>
          a2.join(attrs(attr).select(col("_e").as(p.v),
            col("_v").as(s"_pull_${p.as}_$attr")), Seq(p.v), "left")
        }
      }
      val packed = pulls.foldLeft(joined) { (acc, p) =>
        acc.withColumn(p.as, struct(
          p.attrs.map(a => col(s"_pull_${p.as}_$a").as(a)): _*))
      }
      packed.select(q.find.map {
        case FVar(n) => col(n)
        case FPull(_, _, as) => col(as)
        case _ => throw new IllegalStateException
      }: _*)
    } else if (aggs.isEmpty) rel.select(keys.map(col): _*)
    else {
      val aggCols = aggs.map { a =>
        val c = col(a.v)
        (a.fn match {
          case "count" => count(c)
          case "count-distinct" => count_distinct(c)
          case "sum" => sum(c)
          case "avg" => avg(c)
          case "min" => min(c)
          case "max" => max(c)
          case other => throw new IllegalArgumentException(s"agg: $other")
        }).as(a.as)
      }
      RA.groupBy(rel, keys.map(col), aggCols)
        .select((keys.map(col) ++ aggs.map(a => col(a.as))): _*)
    }
  }

  /** Compile a conjunction into a DataFrame whose columns are the bound
    * logic variables. */
  private def compileClauses(clauses: Seq[Clause], attrs: AttrSource,
                             rules: Map[String, Rule],
                             init: Option[DataFrame] = None): DataFrame = {
    val dfs = clauses.foldLeft(init) { (accOpt, clause) =>
      Some(addClause(accOpt, clause, attrs, rules))
    }
    dfs.getOrElse(throw new IllegalArgumentException("empty :where"))
  }

  private def naturalJoin(acc: DataFrame, rel: DataFrame): DataFrame = {
    val shared = acc.columns.intersect(rel.columns).toSeq
    if (shared.isEmpty) acc.crossJoin(rel)
    else acc.join(rel, shared)
  }

  private def addClause(acc: Option[DataFrame], clause: Clause,
                        attrs: AttrSource, rules: Map[String, Rule]): DataFrame =
    clause match {
      case Triple(e, a, v) =>
        // document model: a NULL value means the attribute is ABSENT on
        // that entity, so the pattern does not bind (matching the
        // reference's schemaless EAV semantics, not SQL outer-join NULLs)
        var rel = attrs(a).filter(col("_v").isNotNull)
        // constants filter; variables rename
        e match {
          case C(value) => rel = rel.filter(col("_e") === lit(value))
          case V(n) => rel = rel.withColumnRenamed("_e", n)
        }
        v match {
          case C(value) => rel = rel.filter(col("_v") === lit(value))
          case V(n) =>
            // [?x a ?x] self-unification: filter on equality, then DROP
            // _v (renaming would duplicate the column name)
            if (rel.columns.contains(n))
              rel = rel.filter(col("_v") === col(n)).drop("_v")
            else rel = rel.withColumnRenamed("_v", n)
        }
        val keep = rel.columns.filterNot(c => c == "_e" || c == "_v")
        val r = rel.select(keep.map(col): _*)
        acc.fold(r)(naturalJoin(_, r))

      case Pred(vars, f) =>
        val a = acc.getOrElse(
          throw new IllegalArgumentException("predicate before any pattern"))
        a.filter(f(vars.map(a(_))))

      case Bind(out, vars, f) =>
        val a = acc.getOrElse(
          throw new IllegalArgumentException("binding before any pattern"))
        a.withColumn(out, f(vars.map(a(_))))

      case NotJoin(vars, sub) =>
        val a = acc.getOrElse(
          throw new IllegalArgumentException("not-join before any pattern"))
        val s = compileClauses(sub, attrs, rules).select(vars.map(col): _*)
        a.join(s, vars, "left_anti")

      case OrJoin(vars, branches) =>
        val u = branches.map(b =>
            compileClauses(b, attrs, rules).select(vars.map(col): _*))
          .reduce(_ unionByName _).distinct()
        acc.fold(u)(naturalJoin(_, u))

      case RuleCall(name, args) =>
        val rule = rules.getOrElse(name,
          throw new IllegalArgumentException(s"unknown rule: $name"))
        val rel = compileRule(rule, attrs, rules)
        // unify rule params with call-site args
        var r = rel.toDF(rule.params: _*)
        args.zip(rule.params).foreach {
          case (C(value), p) => r = r.filter(col(p) === lit(value))
          case (V(n), p) => if (n != p) r = r.withColumnRenamed(p, n)
        }
        val outCols = args.collect { case V(n) => n }
        val proj = r.select(outCols.map(col): _*)
        acc.fold(proj)(naturalJoin(_, proj))
    }

  /** Compile a (possibly recursive) rule to a relation of its params.
    * Bodies that call the rule itself are the recursive step (linear
    * recursion, semi-naive via RA.fixpoint); the rest are the base. */
  private def compileRule(rule: Rule, attrs: AttrSource,
                          rules: Map[String, Rule]): DataFrame = {
    def isRec(b: Seq[Clause]) = b.exists {
      case RuleCall(n, _) => n == rule.name
      case _ => false
    }
    val (recBodies, baseBodies) = rule.bodies.partition(isRec)
    require(baseBodies.nonEmpty, s"rule ${rule.name}: no non-recursive body")
    // Non-linear recursion (two self-calls in one body) would need
    // (delta × all) ∪ (all × delta) semi-naive deltas; substituting the
    // frontier for BOTH calls silently loses old×new derivations —
    // reject instead of returning an incomplete fixpoint.
    recBodies.foreach { b =>
      val selfCalls = b.count {
        case RuleCall(n, _) => n == rule.name
        case _ => false
      }
      require(selfCalls == 1,
        s"rule ${rule.name}: only linear recursion (one self-call per " +
          s"body) is supported; found $selfCalls")
    }

    val base = baseBodies.map(b => compileClauses(b, attrs, rules - rule.name)
        .select(rule.params.map(col): _*))
      .reduce(_ unionByName _)

    if (recBodies.isEmpty) base.distinct()
    else RA.fixpoint(base, frontier => {
      recBodies.map { b =>
        // replace the self-call clause with the frontier bindings
        val replaced = b.map {
          case RuleCall(n, args) if n == rule.name =>
            var f = frontier.toDF(rule.params: _*)
            args.zip(rule.params).foreach {
              case (C(value), p) => f = f.filter(col(p) === lit(value))
              case (V(n), p) => if (n != p) f = f.withColumnRenamed(p, n)
            }
            FrontierClause(f.select(args.collect { case V(n) => n }.map(col): _*))
          case other => other
        }
        compileFrontierBody(replaced, attrs, rules - rule.name)
          .select(rule.params.map(col): _*)
      }.reduce(_ unionByName _)
    })
  }

  /** internal marker: a pre-compiled relation injected into a body. */
  private final case class FrontierClause(rel: DataFrame) extends Clause

  private def compileFrontierBody(clauses: Seq[Clause], attrs: AttrSource,
                                  rules: Map[String, Rule]): DataFrame =
    clauses.foldLeft(Option.empty[DataFrame]) { (accOpt, clause) =>
      Some(clause match {
        case FrontierClause(rel) => accOpt.fold(rel)(naturalJoin(_, rel))
        case other => addClause(accOpt, other, attrs, rules)
      })
    }.getOrElse(throw new IllegalArgumentException("empty body"))
}
