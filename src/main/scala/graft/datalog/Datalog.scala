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
  /** plain `not`: negation unifying on every variable the sub-clauses
    * share with the bindings so far (the reference's implicit form;
    * `not-join` is the explicit one). */
  final case class Not(clauses: Seq[Clause]) extends Clause
  /** plain `or`: disjunction unifying on the variables ALL branches
    * bind (the reference requires branches to bind the same vars). */
  final case class Or(branches: Seq[Seq[Clause]]) extends Clause
  /** rule invocation, possibly recursive. */
  final case class RuleCall(name: String, args: Seq[Term]) extends Clause
  /** subquery clause `(q {:find … :where …} ?in…)` destructured to `bind`
    * names. Decorrelated set-oriented evaluation — the sub-query runs
    * ONCE, seeded with the DISTINCT outer bindings of `inVars`;
    * aggregates in the sub-`:find` group per in-binding; results
    * natural-join back on the in vars (no per-outer-row re-execution —
    * the Spark-shaped equivalent of the reference planner's subquery
    * decorrelation, SURVEY.md §4). Outer rows with an empty sub-result
    * drop, the reference's relational-binding semantics. */
  final case class SubQuery(find: Seq[Find], where: Seq[Clause],
                            inVars: Seq[String], bind: Seq[String]) extends Clause

  /** One rule: named, with parameter list and one or more bodies
    * (bodies union). Bodies may call their own rule or other rules
    * recursively — linear, NON-LINEAR (two self-calls) and MUTUAL
    * recursion all compile via multi-relation semi-naive fixpoint
    * ([[graft.ra.RA.fixpointN]]). Recursion under not-join is rejected
    * (non-stratified). */
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

  /** `in`: externally-bound parameters (the reference's `:in` clause).
    * The VALUE's shape selects the binding form, mirroring the
    * reference's scalar / collection / relation bindings:
    *   - plain value          → scalar binding `?name`
    *   - `Iterable[_]`        → collection binding `[?name ...]`
    *     (a SET of alternatives — duplicates collapse)
    *   - `DataFrame`          → relation binding `[[?a ?b] ...]`: its
    *     COLUMN NAMES are the logic variables (the tuple name is
    *     documentation); rows join like any other clause
    * All bindings cross-combine, then unify with the body by natural
    * join — exactly how triple clauses bind. */
  /** `keys`: rename the find outputs (the reference's `:keys` — result
    * maps keyed by these names). `orderBy`: (find-column, ascending)
    * pairs; `limit`/`offset` complete the reference's query-map pagination
    * surface (applied AFTER ordering, as `:top` does). */
  final case class Query(find: Seq[Find], where: Seq[Clause],
                         rules: Seq[Rule] = Nil,
                         in: Seq[(String, Any)] = Nil,
                         keys: Seq[String] = Nil,
                         orderBy: Seq[(String, Boolean)] = Nil,
                         limit: Option[Int] = None,
                         offset: Int = 0)

  /** Attribute resolver: attribute name → 2-col DataFrame `(_e, _v)`.
    * The Spark analog of the reference's scan-per-attribute over the
    * document store. */
  type AttrSource = String => DataFrame

  /** An attr source that can ENUMERATE its attributes — what wildcard
    * pull `(pull ?e [*])` needs. [[attrsOf]] always returns one. */
  trait CatalogedAttrSource extends (String => DataFrame) {
    def attributes: Seq[String]
  }

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
    new CatalogedAttrSource {
      override val attributes: Seq[String] = pairs.map(_._1)
      override def apply(attr: String): DataFrame = {
        val (df, idCol) = index.getOrElse(attr,
          throw new IllegalArgumentException(s"unknown attribute: $attr"))
        df.select(col(idCol).as("_e"), col(attr).as("_v"))
      }
    }
  }

  // ---- compiler -----------------------------------------------------------

  def run(q: Query, attrs: AttrSource): DataFrame = {
    val ruleIndex = q.rules.map(r => r.name -> r).toMap
    val init = if (q.in.isEmpty) None else Some {
      val spark = org.apache.spark.sql.SparkSession.active
      val scalars = q.in.filter {
        case (_, _: DataFrame) | (_, _: Iterable[_]) => false
        case _ => true
      }
      val base =
        if (scalars.isEmpty) Nil
        else Seq(scalars.foldLeft(spark.range(1).select()) {
          case (df, (n, v)) => df.withColumn(n, lit(v))
        })
      val shaped = q.in.collect {
        case (_, rel: DataFrame) => rel
        case (n, vs: Iterable[_]) =>
          // collection binding is a SET of alternatives
          spark.range(1)
            .select(explode(array(vs.toSeq.map(lit): _*)).as(n)).distinct()
      }
      (base ++ shaped).reduce(_ crossJoin _)
    }
    val rel = compileClauses(q.where, attrs, ruleIndex, init)

    val aggs = q.find.collect { case a: FAgg => a }
    val keys = q.find.collect { case FVar(n) => n }
    val pulls = q.find.collect { case p: FPull => p }
    require(aggs.isEmpty || pulls.isEmpty,
      "pull and aggregates cannot mix in one :find")
    val projected = if (pulls.nonEmpty) {
      // wildcard pull expands to the source's full attribute catalog
      // (name order) — the reference's `(pull ?e [*])` document fetch
      val expanded = pulls.map { p =>
        if (p.attrs != Seq("*")) p
        else attrs match {
          case c: CatalogedAttrSource => p.copy(attrs = c.attributes.sorted)
          case _ => throw new IllegalArgumentException(
            "(pull ?e [*]) needs a CatalogedAttrSource (use Datalog.attrsOf)")
        }
      }
      // left-join each pulled attribute on the entity var, then pack
      val joined = expanded.foldLeft(rel) { (acc, p) =>
        p.attrs.foldLeft(acc) { (a2, attr) =>
          a2.join(attrs(attr).select(col("_e").as(p.v),
            col("_v").as(s"_pull_${p.as}_$attr")), Seq(p.v), "left")
        }
      }
      val packed = expanded.foldLeft(joined) { (acc, p) =>
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
      val aggCols = aggs.map(a => aggFn(a.fn, col(a.v)).as(a.as))
      RA.groupBy(rel, keys.map(col), aggCols)
        .select((keys.map(col) ++ aggs.map(a => col(a.as))): _*)
    }
    finishQuery(q, projected)
  }

  /** `:order-by` / `:offset` / `:limit` / `:keys` post-processing —
    * ordering binds to the find-element names BEFORE any `:keys`
    * renaming (the reference's query-map semantics). */
  private def finishQuery(q: Query, projected: DataFrame): DataFrame = {
    val ordered =
      if (q.orderBy.isEmpty) projected
      else projected.orderBy(q.orderBy.map {
        case (n, asc) => if (asc) col(n).asc else col(n).desc
      }: _*)
    val paged = (q.offset, q.limit) match {
      case (0, None) => ordered
      case (off, lim) =>
        require(q.orderBy.nonEmpty,
          ":limit/:offset without :order-by would be nondeterministic")
        val o = if (off > 0) ordered.offset(off) else ordered
        lim.fold(o)(o.limit)
    }
    if (q.keys.isEmpty) paged
    else {
      require(q.keys.length == paged.columns.length,
        s":keys arity ${q.keys.length} != find arity ${paged.columns.length}")
      paged.toDF(q.keys: _*)
    }
  }

  private def aggFn(fn: String, c: Column): Column = fn match {
    case "count" => count(c)
    case "count-distinct" => count_distinct(c)
    case "sum" => sum(c)
    case "avg" => avg(c)
    case "min" => min(c)
    case "max" => max(c)
    case other => throw new IllegalArgumentException(s"agg: $other")
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
        val proj = bindCall(compileRule(rule, attrs, rules), rule.params, args)
        acc.fold(proj)(naturalJoin(_, proj))

      case SubQuery(find, where, inVars, bind) =>
        require(find.length == bind.length,
          "subquery: bind arity must match :find arity")
        val a = acc.getOrElse(
          throw new IllegalArgumentException("subquery before any pattern"))
        val seed =
          if (inVars.isEmpty) None
          else Some(a.select(inVars.map(col): _*).distinct())
        val rel = compileClauses(where, attrs, rules, seed)
        val aggs = find.collect { case x: FAgg => x }
        val computed =
          if (aggs.isEmpty) rel
          else {
            // aggregates group per in-binding (and per sub-:find var) —
            // the decorrelated form of "the subquery runs per outer row"
            val keys = (inVars ++ find.collect { case FVar(n) => n }).distinct
            RA.groupBy(rel, keys.map(col), aggs.map(x => aggFn(x.fn, col(x.v)).as(x.as)))
          }
        val outCols = inVars.map(col) ++ find.zip(bind).map {
          case (FVar(n), b) => col(n).as(b)
          case (FAgg(_, _, as), b) => col(as).as(b)
          case (_: FPull, _) =>
            throw new IllegalArgumentException("subquery: pull not supported")
        }
        naturalJoin(a, computed.select(outCols: _*).distinct())

      case Not(sub) =>
        val a = acc.getOrElse(
          throw new IllegalArgumentException("not before any pattern"))
        val vars = a.columns.toSeq.filter(varsIn(sub).contains)
        require(vars.nonEmpty,
          "not: sub-clauses share no variable with the outer bindings — " +
            "use not-join with an explicit var list")
        addClause(Some(a), NotJoin(vars, sub), attrs, rules)

      case Or(branches) =>
        val common = branches.map(varsIn).reduce(_ intersect _)
        require(common.nonEmpty, "or: branches bind no common variable")
        addClause(acc, OrJoin(common.toSeq.sorted, branches), attrs, rules)

      case FrontierClause(rel) =>
        // internal marker, only valid inside compileFrontierBody
        acc.fold(rel)(naturalJoin(_, rel))
    }

  /** Variables a clause list makes visible to its surroundings. */
  private def varsIn(cs: Seq[Clause]): Set[String] = cs.flatMap {
    case Triple(e, _, v) => Seq(e, v).collect { case V(n) => n }
    case Pred(vs, _) => vs
    case Bind(out, vs, _) => out +: vs
    case NotJoin(vs, _) => vs
    case OrJoin(vs, _) => vs
    case Not(sub) => varsIn(sub)
    case Or(bs) => bs.map(varsIn).reduce(_ intersect _)
    case RuleCall(_, args) => args.collect { case V(n) => n }
    case SubQuery(_, _, inVars, bind) => inVars ++ bind
    case FrontierClause(rel) => rel.columns.toSeq
  }.toSet

  /** Unify a compiled rule relation's params with call-site args:
    * constants filter, repeated variables unify (equality), the rest
    * rename; projects to the call's distinct variable names. */
  private def bindCall(rel: DataFrame, params: Seq[String], args: Seq[Term]): DataFrame = {
    require(args.length == params.length,
      s"rule call arity ${args.length} != params ${params.length}")
    // temp names avoid collisions between param names and arg var names
    var r = rel.toDF(params.map("_arg_" + _): _*)
    args.zip(params).foreach { case (a, p0) =>
      val p = "_arg_" + p0
      a match {
        case C(value) => r = r.filter(col(p) === lit(value))
        case V(n) =>
          // repeated var across args, e.g. (sg ?x ?x): unify by equality
          if (r.columns.contains(n)) r = r.filter(col(p) === col(n)).drop(p)
          else r = r.withColumnRenamed(p, n)
      }
    }
    r.select(args.collect { case V(n) => n }.distinct.map(col): _*)
  }

  /** All rule names invoked anywhere in `clauses`, including nested
    * not-join / or-join / subquery bodies. */
  private def callsIn(clauses: Seq[Clause]): Seq[String] = clauses.flatMap {
    case RuleCall(n, _) => Seq(n)
    case NotJoin(_, sub) => callsIn(sub)
    case OrJoin(_, branches) => branches.flatMap(callsIn)
    case Not(sub) => callsIn(sub)
    case Or(branches) => branches.flatMap(callsIn)
    case SubQuery(_, where, _, _) => callsIn(where)
    case _ => Nil
  }

  /** The strongly-connected component of `entry` in the rule-call graph
    * — empty iff `entry` is not (self- or mutually) recursive. */
  private def sccOf(entry: String, rules: Map[String, Rule]): Set[String] = {
    val direct: Map[String, Set[String]] = rules.map { case (n, r) =>
      n -> r.bodies.flatMap(callsIn).toSet.intersect(rules.keySet)
    }
    def reach(from: String): Set[String] = {
      var seen = Set.empty[String]
      var stack = direct.getOrElse(from, Set.empty).toList
      while (stack.nonEmpty) {
        val h = stack.head; stack = stack.tail
        if (!seen(h)) { seen += h; stack = direct.getOrElse(h, Set.empty).toList ::: stack }
      }
      seen
    }
    val fromEntry = reach(entry)
    if (!fromEntry(entry)) Set.empty
    else fromEntry.filter(n => reach(n)(entry))
  }

  /** Compile a (possibly recursive) rule to a relation of its params.
    * Non-recursive rules are plain body unions. Recursive rules compile
    * with their whole strongly-connected component through
    * [[RA.fixpointN]] — covering linear, non-linear (several self-calls
    * per body) and mutually recursive rule sets. */
  private def compileRule(rule: Rule, attrs: AttrSource,
                          rules: Map[String, Rule]): DataFrame = {
    val group = sccOf(rule.name, rules)
    if (group.isEmpty)
      rule.bodies.map(b => compileClauses(b, attrs, rules - rule.name)
          .select(rule.params.map(col): _*))
        .reduce(_ unionByName _).distinct()
    else compileScc(group.toSeq.sorted, attrs, rules)(rule.name)
  }

  /** Semi-naive evaluation of one strongly-connected set of rules:
    * per iteration, each recursive body expands to ONE VARIANT PER
    * recursive-call position — that position reads the callee's DELTA,
    * every other recursive call reads the full accumulator — i.e. the
    * (Δ×all) ∪ (all×Δ) rewriting, so old×new derivations are never
    * lost. Each variant is a declarative join plan; Catalyst plans every
    * iteration independently (broadcasts the usually-small delta). */
  private def compileScc(members: Seq[String], attrs: AttrSource,
                         rules: Map[String, Rule]): Map[String, DataFrame] = {
    val inScc = members.toSet
    // AUTO-LIFT disjunctive recursion: a recursive call under or /
    // or-join is legal datalog but the delta substitution needs plain
    // conjunctions — distribute each such disjunction into one body per
    // branch (union-through-join is exact relational algebra), renaming
    // or-join branch-LOCAL variables fresh so inlining cannot capture
    // outer vars of the same name.
    val lifted: Map[String, Rule] = members.map { n =>
      val r = rules(n)
      n -> r.copy(bodies = r.bodies.flatMap(b => liftDisjunctions(b, inScc)))
    }.toMap
    // what remains non-conjunctive is genuinely rejected: a recursive
    // call under not/not-join is non-stratified negation-through-
    // recursion, and under a subquery the grouping would have to see a
    // moving input.
    val outerRules = rules -- inScc
    val parts = members.map { n =>
      val r = lifted(n)
      r.bodies.foreach(_.foreach {
        case NotJoin(_, sub) => require(callsIn(sub).forall(!inScc(_)),
          s"rule $n: recursive call under not-join is not stratified")
        case SubQuery(_, w, _, _) => require(callsIn(w).forall(!inScc(_)),
          s"rule $n: recursive call inside a subquery is unsupported")
        case Not(sub) => require(callsIn(sub).forall(!inScc(_)),
          s"rule $n: recursive call under not is not stratified")
        case _ => ()
      })
      val (rec, base) = r.bodies.partition(_.exists {
        case RuleCall(c, _) => inScc(c)
        case _ => false
      })
      (r, base, rec)
    }
    require(parts.exists(_._2.nonEmpty),
      s"recursive rule set ${members.mkString(", ")}: no non-recursive body")

    val bases: Seq[Option[DataFrame]] = parts.map { case (r, base, _) =>
      if (base.isEmpty) None
      else Some(base.map(b => compileClauses(b, attrs, outerRules)
          .select(r.params.map(col): _*))
        .reduce(_ unionByName _))
    }

    val accs = RA.fixpointN(bases, (accVec, deltaVec) => {
      val accOf = members.zip(accVec).toMap
      val deltaOf = members.zip(deltaVec).toMap
      parts.map { case (r, _, recBodies) =>
        val variants = recBodies.flatMap { b =>
          val recPositions = b.zipWithIndex.collect {
            case (RuleCall(n, _), i) if inScc(n) => i
          }
          recPositions.flatMap { di =>
            // resolve every recursive call; a variant referencing a
            // relation with no facts yet contributes nothing — skip it
            val resolved = b.zipWithIndex.foldLeft(
              Option(Vector.empty[Clause])) {
              case (None, _) => None
              case (Some(cs), (RuleCall(n, cargs), i)) if inScc(n) =>
                (if (i == di) deltaOf(n) else accOf(n))
                  .map(rel => cs :+ FrontierClause(
                    bindCall(rel, rules(n).params, cargs)))
              case (Some(cs), (other, _)) => Some(cs :+ other)
            }
            resolved.map(cs => compileFrontierBody(cs, attrs, outerRules)
              .select(r.params.map(col): _*))
          }
        }
        if (variants.isEmpty) None else Some(variants.reduce(_ unionByName _))
      }
    })
    members.zip(accs).map {
      case (n, Some(rel)) => n -> rel
      case (n, None) =>
        // a member that never derived facts: the empty relation (typed
        // columns are unknowable in the schemaless model; NullType
        // columns join to nothing, which is exactly the semantics)
        val spark = org.apache.spark.sql.SparkSession.active
        n -> spark.range(0).select(rules(n).params.map(p => lit(null).as(p)): _*)
    }.toMap
  }

  private val liftId = new java.util.concurrent.atomic.AtomicLong()

  /** Distribute `or`/`or-join` clauses whose branches contain in-SCC
    * recursive calls into one conjunctive body per branch. Repeats until
    * no recursive disjunction remains (nested or-inside-or lifts too).
    * `or` branches bind the same variables by contract, so they inline
    * as-is; `or-join` branch vars OUTSIDE the declared unify vars are
    * branch-local — renamed fresh so inlining can't capture outer vars. */
  private def liftDisjunctions(body: Seq[Clause],
                               inScc: Set[String]): Seq[Seq[Clause]] = {
    val idx = body.indexWhere {
      case Or(bs) => bs.flatMap(callsIn).exists(inScc)
      case OrJoin(_, bs) => bs.flatMap(callsIn).exists(inScc)
      case _ => false
    }
    if (idx < 0) Seq(body)
    else {
      val (pre, rest) = body.splitAt(idx)
      val suffix = rest.tail
      val branches: Seq[Seq[Clause]] = rest.head match {
        // plain `or` unifies on the vars ALL branches bind; `or-join` on
        // its declared vars — anything else is branch-local
        case Or(bs) => rescope(bs, bs.map(varsIn).reduce(_ intersect _))
        case OrJoin(unify, bs) => rescope(bs, unify.toSet)
        case _ => throw new IllegalStateException("indexWhere lied")
      }
      branches.flatMap(b => liftDisjunctions(pre ++ b ++ suffix, inScc))
    }
  }

  /** Rename each branch's vars OUTSIDE `keep` fresh (branch scope). */
  private def rescope(bs: Seq[Seq[Clause]],
                      keep: Set[String]): Seq[Seq[Clause]] =
    bs.map { b =>
      val local = varsIn(b) -- keep
      if (local.isEmpty) b
      else renameVars(b, local.map(v =>
        v -> s"${v}__lift${liftId.incrementAndGet()}").toMap)
    }

  /** Consistently rename logic variables across a clause tree. */
  private def renameVars(cs: Seq[Clause], m: Map[String, String]): Seq[Clause] = {
    def rT(t: Term): Term = t match {
      case V(n) if m.contains(n) => V(m(n))
      case other => other
    }
    def rS(n: String): String = m.getOrElse(n, n)
    cs.map {
      case Triple(e, a, v) => Triple(rT(e), a, rT(v))
      case Pred(vs, f) => Pred(vs.map(rS), f)
      case Bind(out, vs, f) => Bind(rS(out), vs.map(rS), f)
      case NotJoin(vs, sub) => NotJoin(vs.map(rS), renameVars(sub, m))
      case OrJoin(vs, bs) => OrJoin(vs.map(rS), bs.map(renameVars(_, m)))
      case Not(sub) => Not(renameVars(sub, m))
      case Or(bs) => Or(bs.map(renameVars(_, m)))
      case RuleCall(n, args) => RuleCall(n, args.map(rT))
      case SubQuery(f, w, inVars, bind) =>
        SubQuery(f, renameVars(w, m), inVars.map(rS), bind.map(rS))
      case fc: FrontierClause => fc
    }
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
