package graft.datalog

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import Datalog._

/** Datalog compiler semantics on tiny literal entity tables. */
class DatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // people(_id, name, age, parent); parent references another _id
  private lazy val people = Seq(
    (1L, "ada", 36, Option.empty[Long]),
    (2L, "bob", 11, Some(1L)),
    (3L, "cyd", 8, Some(1L)),
    (4L, "dee", 2, Some(2L)))
    .toDF("_id", "name", "age", "parent")

  private lazy val attrs = Datalog.attrsOf((people, "_id"))

  private def rows(q: Query): Set[Seq[Any]] =
    Datalog.run(q, attrs).collect().map(_.toSeq).toSet

  test("triple patterns unify on shared variables") {
    // child name + parent name
    val q = Query(
      find = Seq(FVar("cn"), FVar("pn")),
      where = Seq(
        Triple(V("c"), "name", V("cn")),
        Triple(V("c"), "parent", V("p")),
        Triple(V("p"), "name", V("pn"))))
    assert(rows(q) == Set(Seq("bob", "ada"), Seq("cyd", "ada"), Seq("dee", "bob")))
  }

  test("constants in entity and value positions") {
    val q = Query(Seq(FVar("n")), Seq(Triple(C(2L), "name", V("n"))))
    assert(rows(q) == Set(Seq("bob")))
    val q2 = Query(Seq(FVar("e")), Seq(Triple(V("e"), "name", C("cyd"))))
    assert(rows(q2) == Set(Seq(3L)))
  }

  test("predicate and binding clauses") {
    val q = Query(
      find = Seq(FVar("n"), FVar("age2")),
      where = Seq(
        Triple(V("e"), "name", V("n")),
        Triple(V("e"), "age", V("a")),
        Pred(Seq("a"), vs => vs.head > 10),
        Bind("age2", Seq("a"), vs => vs.head * 2)))
    assert(rows(q) == Set(Seq("ada", 72), Seq("bob", 22)))
  }

  test("not-join: people who are nobody's parent") {
    val q = Query(
      find = Seq(FVar("n")),
      where = Seq(
        Triple(V("e"), "name", V("n")),
        NotJoin(Seq("e"), Seq(Triple(V("c"), "parent", V("e"))))))
    assert(rows(q) == Set(Seq("cyd"), Seq("dee")))
  }

  test("plain not / or derive their unification vars implicitly") {
    // not: same result as the explicit not-join test
    val qn = Query(
      find = Seq(FVar("n")),
      where = Seq(
        Triple(V("e"), "name", V("n")),
        Not(Seq(Triple(V("c"), "parent", V("e"))))))
    assert(rows(qn) == Set(Seq("cyd"), Seq("dee")))
    // or: branches bind ?e; unifies on it like the or-join test
    val qo = Query(
      find = Seq(FVar("n")),
      where = Seq(
        Triple(V("e"), "name", V("n")),
        Or(Seq(
          Seq(Triple(V("e"), "age", V("a")), Pred(Seq("a"), vs => vs.head < 5)),
          Seq(Triple(V("e"), "name", C("ada")))))))
    assert(rows(qo) == Set(Seq("ada"), Seq("dee")))
  }

  test("or-join: union of branches") {
    val q = Query(
      find = Seq(FVar("n")),
      where = Seq(
        Triple(V("e"), "name", V("n")),
        OrJoin(Seq("e"), Seq(
          Seq(Triple(V("e"), "age", V("a")), Pred(Seq("a"), vs => vs.head < 5)),
          Seq(Triple(V("e"), "name", C("ada")))))))
    assert(rows(q) == Set(Seq("ada"), Seq("dee")))
  }

  test("aggregates group by the non-agg find variables") {
    val q = Query(
      find = Seq(FVar("p"), FAgg("count", "c", "n_kids"),
        FAgg("max", "a", "oldest")),
      where = Seq(
        Triple(V("c"), "parent", V("p")),
        Triple(V("c"), "age", V("a"))))
    assert(rows(q) == Set(Seq(1L, 2L, 11), Seq(2L, 1L, 2)))
  }

  test("recursive rule: ancestor via fixpoint") {
    val ancestor = Rule("ancestor", Seq("d", "a"), Seq(
      Seq(Triple(V("d"), "parent", V("a"))),
      Seq(RuleCall("ancestor", Seq(V("d"), V("m"))),
        Triple(V("m"), "parent", V("a")))))
    val q = Query(
      find = Seq(FVar("dn"), FVar("an")),
      where = Seq(
        RuleCall("ancestor", Seq(V("x"), V("y"))),
        Triple(V("x"), "name", V("dn")),
        Triple(V("y"), "name", V("an"))),
      rules = Seq(ancestor))
    assert(rows(q) == Set(
      Seq("bob", "ada"), Seq("cyd", "ada"),
      Seq("dee", "bob"), Seq("dee", "ada")))
  }

  test("self-unification [?x a ?x] binds entity == value") {
    // nobody is their own parent -> empty; add a self-loop to check the
    // positive case
    val q = Query(Seq(FVar("x")), Seq(Triple(V("x"), "parent", V("x"))))
    assert(rows(q).isEmpty)
    val withLoop = people.union(
      Seq((9L, "zed", 1, Some(9L))).toDF("_id", "name", "age", "parent"))
    val got = Datalog.run(q, Datalog.attrsOf((withLoop, "_id")))
      .collect().map(_.toSeq).toSet
    assert(got == Set(Seq(9L)))
  }

  test("non-linear recursion: two self-calls per body compute the full closure") {
    // path(x,y) :- parent(x,y).  path(x,y) :- path(x,z), path(z,y).
    val nonLinear = Rule("path", Seq("x", "y"), Seq(
      Seq(Triple(V("x"), "parent", V("y"))),
      Seq(RuleCall("path", Seq(V("x"), V("z"))),
        RuleCall("path", Seq(V("z"), V("y"))))))
    val got = rows(Query(Seq(FVar("x"), FVar("y")),
      Seq(RuleCall("path", Seq(V("x"), V("y")))), Seq(nonLinear)))
    assert(got == Set(
      Seq(2L, 1L), Seq(3L, 1L), Seq(4L, 2L), Seq(4L, 1L)))
  }

  test("mutual recursion: SCC with a base-less member evaluates together") {
    // anc1(d,a) :- parent(d,a).   anc1(d,a) :- anc2(d,m), parent(m,a).
    // anc2(d,a) :- anc1(d,a).     (anc2 has NO base body)
    val anc1 = Rule("anc1", Seq("d", "a"), Seq(
      Seq(Triple(V("d"), "parent", V("a"))),
      Seq(RuleCall("anc2", Seq(V("d"), V("m"))),
        Triple(V("m"), "parent", V("a")))))
    val anc2 = Rule("anc2", Seq("d", "a"), Seq(
      Seq(RuleCall("anc1", Seq(V("d"), V("a"))))))
    val got = rows(Query(Seq(FVar("x"), FVar("y")),
      Seq(RuleCall("anc1", Seq(V("x"), V("y")))), Seq(anc1, anc2)))
    assert(got == Set(
      Seq(2L, 1L), Seq(3L, 1L), Seq(4L, 2L), Seq(4L, 1L)))
  }

  test("STRATIFIED negation over a recursive rule (not-join against a closure)") {
    // people with NO ancestor relationship to ada (id 1): ada herself
    // (self is not an ancestor) — negation over the completed `ancestor`
    // fixpoint is stratified and must compile
    val ancestor = Rule("ancestor", Seq("d", "a"), Seq(
      Seq(Triple(V("d"), "parent", V("a"))),
      Seq(RuleCall("ancestor", Seq(V("d"), V("m"))),
        Triple(V("m"), "parent", V("a")))))
    val q = Query(
      find = Seq(FVar("n")),
      where = Seq(
        Triple(V("e"), "name", V("n")),
        NotJoin(Seq("e"), Seq(RuleCall("ancestor", Seq(V("e"), C(1L)))))),
      rules = Seq(ancestor))
    assert(rows(q) == Set(Seq("ada")))
  }

  test("recursive call under or-join auto-lifts into branch bodies") {
    // ancestor in ONE body via or-join (r3 rejected this; now the
    // disjunction distributes into a base body + a recursive body):
    //   ancestor(d,a) :- or-join [d a] ( parent(d,a)
    //                                  | ancestor(d,m), parent(m,a) )
    // ?m is branch-local (not in the unify vars) — the lift must rename
    // it fresh, proven by ALSO binding an outer ?m to something else.
    val ancestor = Rule("ancestor", Seq("d", "a"), Seq(Seq(
      OrJoin(Seq("d", "a"), Seq(
        Seq(Triple(V("d"), "parent", V("a"))),
        Seq(RuleCall("ancestor", Seq(V("d"), V("m"))),
          Triple(V("m"), "parent", V("a"))))))))
    val q = Query(
      find = Seq(FVar("dn"), FVar("an")),
      where = Seq(
        RuleCall("ancestor", Seq(V("x"), V("y"))),
        Triple(V("x"), "name", V("dn")),
        Triple(V("y"), "name", V("an"))),
      rules = Seq(ancestor))
    assert(rows(q) == Set(
      Seq("bob", "ada"), Seq("cyd", "ada"),
      Seq("dee", "bob"), Seq("dee", "ada")))

    // plain `or` with a recursive branch lifts too: x is "of old line"
    // if x is old, or x's parent is of old line
    val oldline = Rule("old", Seq("x"), Seq(Seq(
      Or(Seq(
        Seq(Triple(V("x"), "age", V("ag")),
          Pred(Seq("ag"), vs => vs.head >= 36)),
        Seq(Triple(V("x"), "parent", V("p")),
          RuleCall("old", Seq(V("p")))))))))
    val q2 = Query(
      find = Seq(FVar("x")),
      where = Seq(RuleCall("old", Seq(V("x")))),
      rules = Seq(oldline))
    assert(rows(q2) == Set(Seq(1L), Seq(2L), Seq(3L), Seq(4L)))
  }

  test("or-join branch-local vars stay scoped when lifted") {
    // outer body binds ?m to the child's NAME; the recursive or-join
    // branch uses its own ?m for the intermediate ancestor. Without
    // fresh renaming the lifted body would unify the two ?m's (name ==
    // entity id -> empty result).
    val ancestor = Rule("ancestor", Seq("d", "a"), Seq(Seq(
      OrJoin(Seq("d", "a"), Seq(
        Seq(Triple(V("d"), "parent", V("a"))),
        Seq(RuleCall("ancestor", Seq(V("d"), V("m"))),
          Triple(V("m"), "parent", V("a"))))))))
    val q = Query(
      find = Seq(FVar("m"), FVar("y")),
      where = Seq(
        RuleCall("ancestor", Seq(V("x"), V("y"))),
        Triple(V("x"), "name", V("m"))), // outer ?m = child name
      rules = Seq(ancestor))
    assert(rows(q) == Set(
      Seq("bob", 1L), Seq("cyd", 1L),
      Seq("dee", 2L), Seq("dee", 1L)))
  }

  test("recursion under not-join is rejected as non-stratified") {
    val bad = Rule("r", Seq("x"), Seq(
      Seq(Triple(V("x"), "parent", V("p"))),
      Seq(RuleCall("r", Seq(V("y"))),
        Triple(V("x"), "parent", V("y")),
        NotJoin(Seq("x"), Seq(RuleCall("r", Seq(V("x"))))))))
    assertThrows[IllegalArgumentException] {
      Datalog.run(Query(Seq(FVar("x")),
        Seq(RuleCall("r", Seq(V("x")))), Seq(bad)), attrs)
    }
  }

  test("subquery: decorrelated aggregate per in-binding") {
    // max child age per parent
    val q = Query(
      find = Seq(FVar("p"), FVar("mx")),
      where = Seq(
        Triple(V("c0"), "parent", V("p")),
        SubQuery(
          find = Seq(FAgg("max", "a", "mx")),
          where = Seq(Triple(V("c"), "parent", V("p")),
            Triple(V("c"), "age", V("a"))),
          inVars = Seq("p"), bind = Seq("mx"))))
    assert(rows(q) == Set(Seq(1L, 11), Seq(2L, 2)))
  }

  test("subquery: relational (non-aggregate) results join back on in vars") {
    // per person: their grandchildren via a nested two-hop subquery
    val q = Query(
      find = Seq(FVar("gp"), FVar("gc")),
      where = Seq(
        Triple(V("gp"), "name", V("_n")),
        SubQuery(
          find = Seq(FVar("g")),
          where = Seq(Triple(V("k"), "parent", V("gp")),
            Triple(V("g"), "parent", V("k"))),
          inVars = Seq("gp"), bind = Seq("gc"))))
    assert(rows(q) == Set(Seq(1L, 4L)))
  }

  test("pull fetches entity attributes as a struct, absent -> NULL field") {
    val q = Query(
      find = Seq(FVar("e"), FPull("e", Seq("name", "parent"), "doc")),
      where = Seq(Triple(V("e"), "age", V("a")),
        Pred(Seq("a"), vs => vs.head > 30)))
    val out = Datalog.run(q, attrs).collect()
    assert(out.length == 1)
    val doc = out(0).getStruct(1)
    assert(doc.getString(0) == "ada")
    assert(doc.isNullAt(1)) // ada has no parent attribute
  }

  test("wildcard pull (pull ?e [*]) fetches every attribute") {
    val q = Query(
      find = Seq(FVar("e"), FPull("e", Seq("*"), "doc")),
      where = Seq(Triple(V("e"), "name", C("dee"))))
    val out = Datalog.run(q, attrs).collect()
    assert(out.length == 1)
    val doc = out(0).getStruct(1)
    // alphabetical attribute order: age, name, parent
    assert(doc.schema.fieldNames.toSeq == Seq("age", "name", "parent"))
    assert(doc.getInt(0) == 2 && doc.getString(1) == "dee" && doc.getLong(2) == 2L)
  }

  test(":in parameters bind as logic variables") {
    val q = Query(
      find = Seq(FVar("n")),
      where = Seq(
        Triple(V("e"), "name", V("n")),
        Triple(V("e"), "age", V("a")),
        Pred(Seq("a", "min_age"), vs => vs(0) >= vs(1))),
      in = Seq("min_age" -> 11))
    assert(rows(q) == Set(Seq("ada"), Seq("bob")))
    // same query, different binding — no recompilation of the AST
    assert(rows(q.copy(in = Seq("min_age" -> 30))) == Set(Seq("ada")))
    // an in-var can also unify directly inside a pattern position
    val q2 = Query(Seq(FVar("n")),
      Seq(Triple(V("who"), "name", V("n"))),
      in = Seq("who" -> 2L))
    assert(rows(q2) == Set(Seq("bob")))
  }

  test(":in collection binding is a set of alternatives") {
    val q = Query(
      find = Seq(FVar("n")),
      where = Seq(Triple(V("who"), "name", V("n"))),
      in = Seq("who" -> Seq(1L, 3L, 3L, 99L))) // dup collapses, 99 unmatched
    assert(rows(q) == Set(Seq("ada"), Seq("cyd")))
  }

  test(":in relation binding joins its named columns") {
    val rel = Seq((2L, "low"), (3L, "mid"), (7L, "none"))
      .toDF("who", "tier")
    val q = Query(
      find = Seq(FVar("n"), FVar("tier")),
      where = Seq(Triple(V("who"), "name", V("n"))),
      in = Seq("who tier" -> rel))
    assert(rows(q) == Set(Seq("bob", "low"), Seq("cyd", "mid")))
  }

  test(":order-by / :limit / :offset / :keys query-map surface") {
    val base = Query(
      find = Seq(FVar("n"), FVar("a")),
      where = Seq(Triple(V("e"), "name", V("n")),
        Triple(V("e"), "age", V("a"))))
    // order desc by age, top 2, renamed via :keys
    val q = base.copy(orderBy = Seq("a" -> false), limit = Some(2),
      keys = Seq("who", "years"))
    val out = Datalog.run(q, attrs)
    assert(out.columns.toSeq == Seq("who", "years"))
    assert(out.collect().map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("ada", 36), ("bob", 11)))
    // offset skips from the front of the ordering
    val q2 = base.copy(orderBy = Seq("a" -> true), offset = 3)
    assert(Datalog.run(q2, attrs).collect().map(_.getString(0)).toSeq ==
      Seq("ada"))
    // limit without order-by is rejected (nondeterministic page)
    assertThrows[IllegalArgumentException] {
      Datalog.run(base.copy(limit = Some(1)), attrs)
    }
  }

  test("rule call with constant argument filters") {
    val ancestor = Rule("ancestor", Seq("d", "a"), Seq(
      Seq(Triple(V("d"), "parent", V("a"))),
      Seq(RuleCall("ancestor", Seq(V("d"), V("m"))),
        Triple(V("m"), "parent", V("a")))))
    // descendants of ada (id 1)
    val q = Query(
      find = Seq(FVar("d")),
      where = Seq(RuleCall("ancestor", Seq(V("d"), C(1L)))),
      rules = Seq(ancestor))
    assert(rows(q) == Set(Seq(2L), Seq(3L), Seq(4L)))
  }
}
