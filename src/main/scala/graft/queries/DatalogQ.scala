package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.datalog.Datalog
import graft.datalog.Datalog._

/** Datalog-front-end catalog: every query here is authored as a datalog
  * AST and compiled by [[graft.datalog.Datalog]] to the same DataFrame
  * plans as the rest of the engine; the oracle is the equivalent SQL —
  * the reference's two-front-ends-one-engine architecture
  * (/root/reference/README.adoc:15, SURVEY.md §3.2). */
object DatalogQ {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def attrs(s: SparkSession, dir: String): Datalog.AttrSource =
    Datalog.attrsOf(
      (T(s, dir, "customer"), "c_custkey"),
      (T(s, dir, "nation"), "n_nationkey"),
      (T(s, dir, "orders"), "o_orderkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // conjunctive query: triple patterns unified on logic vars ?c and ?n
    // (customer→nation), constant in value position, predicate clause —
    // {:find [?cust ?nname] :where [[?c :c_name ?cust]
    //                               [?c :c_nationkey ?n]
    //                               [?n :n_name ?nname]
    //                               [?c :c_acctbal ?bal]
    //                               [(> ?bal 9900.0)]]}
    "q56_datalog_join" -> ((s, dir) => {
      Datalog.run(Query(
        find = Seq(FVar("cust"), FVar("nname")),
        where = Seq(
          Triple(V("c"), "c_name", V("cust")),
          Triple(V("c"), "c_nationkey", V("n")),
          Triple(V("n"), "n_name", V("nname")),
          Triple(V("c"), "c_acctbal", V("bal")),
          Pred(Seq("bal"), vs => vs.head > 9900.0))),
        attrs(s, dir))
        .orderBy("cust")
    }),

    // aggregates + not-join: order count and max price per market
    // segment, for customers with NO order priced above 350000 —
    // {:find [?seg (count ?o) (max ?price)]
    //  :where [[?c :c_mktsegment ?seg] [?o :o_custkey ?c]
    //          [?o :o_totalprice ?price]
    //          (not-join [?c] [?o2 :o_custkey ?c]
    //                         [?o2 :o_totalprice ?p2] [(> ?p2 350000)])]}
    "q57_datalog_agg_notjoin" -> ((s, dir) => {
      Datalog.run(Query(
        find = Seq(FVar("seg"), FAgg("count", "o", "n_orders"),
          FAgg("max", "price", "max_price")),
        where = Seq(
          Triple(V("c"), "c_mktsegment", V("seg")),
          Triple(V("o"), "o_custkey", V("c")),
          Triple(V("o"), "o_totalprice", V("price")),
          NotJoin(Seq("c"), Seq(
            Triple(V("o2"), "o_custkey", V("c")),
            Triple(V("o2"), "o_totalprice", V("p2")),
            Pred(Seq("p2"), vs => vs.head > 350000.0))))),
        attrs(s, dir))
        .orderBy("seg")
    }),

    // pull-style projection: each matched entity fetched as a document
    // struct (serialized to JSON for the cross-engine compare)
    "q83_datalog_pull" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, to_json}
      Datalog.run(Query(
        find = Seq(FVar("c"), FPull("c", Seq("c_name", "c_nationkey"), "doc")),
        where = Seq(
          Triple(V("c"), "c_acctbal", V("bal")),
          Pred(Seq("bal"), vs => vs.head > 9950.0))),
        attrs(s, dir))
        .select(col("c"), to_json(col("doc")).as("doc"))
        .orderBy("c")
    }),

    // or-join: disjunctive branches unified on the bound var ?c —
    // customers that are high-balance OR in the AUTOMOBILE segment —
    // {:find [?c ?name]
    //  :where [[?c :c_name ?name]
    //          (or-join [?c]
    //            (and [?c :c_acctbal ?bal] [(> ?bal 9000)])
    //            [?c :c_mktsegment "AUTOMOBILE"])]}
    "q88_datalog_orjoin" -> ((s, dir) => {
      Datalog.run(Query(
        find = Seq(FVar("c"), FVar("name")),
        where = Seq(
          Triple(V("c"), "c_name", V("name")),
          OrJoin(Seq("c"), Seq(
            Seq(Triple(V("c"), "c_acctbal", V("bal")),
              Pred(Seq("bal"), vs => vs.head > 9000.0)),
            Seq(Triple(V("c"), "c_mktsegment", C("AUTOMOBILE"))))))),
        attrs(s, dir))
        .orderBy("c")
    }),

    // recursive rule → fixpoint: reachability over a derived edge
    // relation (nation n → (n*7+1) mod 25) from node 0 —
    // {:find [?x] :where [(reach ?x)]
    //  :rules [[(reach ?x) [?e :src 0] [?e :dst ?x]]
    //          [(reach ?x) (reach ?y) [?e :src ?y] [?e :dst ?x]]]}
    "q58_datalog_recursion" -> ((s, dir) => {
      import s.implicits._
      val edges = T(s, dir, "nation").select(
        $"n_nationkey".cast("long").as("edge_id"),
        $"n_nationkey".cast("long").as("src"),
        (($"n_nationkey" * 7 + 1) % 25).cast("long").as("dst"))
      val attrSrc = Datalog.attrsOf((edges, "edge_id"))
      Datalog.run(Query(
        find = Seq(FVar("x")),
        where = Seq(RuleCall("reach", Seq(V("x")))),
        rules = Seq(Rule("reach", Seq("x"), Seq(
          Seq(Triple(V("e"), "src", C(0L)), Triple(V("e"), "dst", V("x"))),
          Seq(RuleCall("reach", Seq(V("y"))),
            Triple(V("e"), "src", V("y")), Triple(V("e"), "dst", V("x"))))))),
        attrSrc)
        .orderBy("x")
    }),

    // DISJUNCTIVE recursion — the whole closure as ONE body whose
    // or-join holds both the base and the recursive branch (r3 rejected
    // this; the compiler now auto-lifts each branch into its own
    // conjunctive body, renaming the branch-local ?y) —
    // {:find [?x] :where [(reach ?x)]
    //  :rules [[(reach ?x)
    //           (or-join [?x]
    //             (and [?e :src 0] [?e :dst ?x])
    //             (and (reach ?y) [?e :src ?y] [?e :dst ?x]))]]}
    "q106_datalog_or_recursion" -> ((s, dir) => {
      import s.implicits._
      val edges = T(s, dir, "nation").select(
        $"n_nationkey".cast("long").as("edge_id"),
        $"n_nationkey".cast("long").as("src"),
        (($"n_nationkey" * 7 + 1) % 25).cast("long").as("dst"))
      val attrSrc = Datalog.attrsOf((edges, "edge_id"))
      Datalog.run(Query(
        find = Seq(FVar("x")),
        where = Seq(RuleCall("reach", Seq(V("x")))),
        rules = Seq(Rule("reach", Seq("x"), Seq(Seq(
          OrJoin(Seq("x"), Seq(
            Seq(Triple(V("e"), "src", C(0L)), Triple(V("e"), "dst", V("x"))),
            Seq(RuleCall("reach", Seq(V("y"))),
              Triple(V("e"), "src", V("y")),
              Triple(V("e"), "dst", V("x")))))))))),
        attrSrc)
        .orderBy("x")
    }),

    // NON-LINEAR recursion — two self-calls in one body:
    //   path(x,y) :- edge(x,y).
    //   path(x,y) :- path(x,z), path(z,y).
    // compiled via the (Δ×all)∪(all×Δ) semi-naive expansion
    // (RA.fixpointN); answer = full transitive closure, identical to the
    // linear formulation the DuckDB oracle uses —
    // {:find [?x ?y] :where [(path ?x ?y)]
    //  :rules [[(path ?x ?y) [?e :src ?x] [?e :dst ?y]]
    //          [(path ?x ?y) (path ?x ?z) (path ?z ?y)]]}
    "q89_datalog_nonlinear" -> ((s, dir) => {
      import s.implicits._
      val edges = T(s, dir, "nation").select(
        $"n_nationkey".cast("long").as("edge_id"),
        $"n_nationkey".cast("long").as("src"),
        (($"n_nationkey" * 7 + 1) % 25).cast("long").as("dst"))
      val attrSrc = Datalog.attrsOf((edges, "edge_id"))
      Datalog.run(Query(
        find = Seq(FVar("x"), FVar("y")),
        where = Seq(RuleCall("path", Seq(V("x"), V("y")))),
        rules = Seq(Rule("path", Seq("x", "y"), Seq(
          Seq(Triple(V("e"), "src", V("x")), Triple(V("e"), "dst", V("y"))),
          Seq(RuleCall("path", Seq(V("x"), V("z"))),
            RuleCall("path", Seq(V("z"), V("y")))))))),
        attrSrc)
        .orderBy("x", "y")
    }),

    // MUTUAL recursion over the successor chain n → n+1 (n = 0..24):
    //   even(0).  even(x) :- odd(y), succ(y,x).  odd(x) :- even(y), succ(y,x).
    // `odd` has NO base body — it derives only from `even`'s deltas; the
    // two rules evaluate together as one strongly-connected component —
    // {:find [?x] :where [(even ?x)]
    //  :rules [[(even ?x) [?e :s_from ?x] [(= ?x 0)]]
    //          [(even ?x) (odd ?y)  [?e :s_from ?y] [?e :s_to ?x]]
    //          [(odd ?x)  (even ?y) [?e :s_from ?y] [?e :s_to ?x]]]}
    "q90_datalog_mutual" -> ((s, dir) => {
      import s.implicits._
      val succ = T(s, dir, "nation").select(
        $"n_nationkey".cast("long").as("succ_id"),
        $"n_nationkey".cast("long").as("s_from"),
        ($"n_nationkey" + 1).cast("long").as("s_to"))
      val attrSrc = Datalog.attrsOf((succ, "succ_id"))
      Datalog.run(Query(
        find = Seq(FVar("x")),
        where = Seq(RuleCall("even", Seq(V("x")))),
        rules = Seq(
          Rule("even", Seq("x"), Seq(
            Seq(Triple(V("e"), "s_from", V("x")),
              Pred(Seq("x"), vs => vs.head === 0L)),
            Seq(RuleCall("odd", Seq(V("y"))),
              Triple(V("e"), "s_from", V("y")), Triple(V("e"), "s_to", V("x"))))),
          Rule("odd", Seq("x"), Seq(
            Seq(RuleCall("even", Seq(V("y"))),
              Triple(V("e"), "s_from", V("y")), Triple(V("e"), "s_to", V("x"))))))),
        attrSrc)
        .orderBy("x")
    }),

    // subquery clause — per-nation max customer balance via a
    // decorrelated sub-:find aggregate, then nations whose max-balance
    // customer count is wanted alongside the name —
    // {:find [?nname ?mx]
    //  :where [[?n :n_name ?nname]
    //          [(q {:find [(max ?bal)] :in [?n]
    //               :where [[?c :c_nationkey ?n] [?c :c_acctbal ?bal]]})
    //           ?mx]]}
    "q91_datalog_subquery" -> ((s, dir) => {
      Datalog.run(Query(
        find = Seq(FVar("nname"), FVar("mx")),
        where = Seq(
          Triple(V("n"), "n_name", V("nname")),
          SubQuery(
            find = Seq(FAgg("max", "bal", "mx")),
            where = Seq(
              Triple(V("c"), "c_nationkey", V("n")),
              Triple(V("c"), "c_acctbal", V("bal"))),
            inVars = Seq("n"), bind = Seq("mx")))),
        attrs(s, dir))
        .orderBy("nname")
    })
  )

  val oracle: Map[String, String] = Map(
    "q56_datalog_join" -> """
      SELECT c_name AS cust, n_name AS nname
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE c_acctbal > 9900.0
      ORDER BY cust""",

    "q57_datalog_agg_notjoin" -> """
      SELECT c_mktsegment AS seg,
             count(o_orderkey) AS n_orders, max(o_totalprice) AS max_price
      FROM customer JOIN orders ON o_custkey = c_custkey
      WHERE NOT EXISTS (SELECT 1 FROM orders o2
                        WHERE o2.o_custkey = c_custkey
                          AND o2.o_totalprice > 350000.0)
      GROUP BY c_mktsegment ORDER BY seg""",

    "q83_datalog_pull" -> """
      SELECT c_custkey AS c,
             to_json(struct_pack(c_name := c_name, c_nationkey := c_nationkey)) AS doc
      FROM customer WHERE c_acctbal > 9950.0 ORDER BY c""",

    "q88_datalog_orjoin" -> """
      SELECT c_custkey AS c, c_name AS name FROM customer
      WHERE c_acctbal > 9000.0 OR c_mktsegment = 'AUTOMOBILE'
      ORDER BY c""",

    "q58_datalog_recursion" -> """
      WITH RECURSIVE e AS (
        SELECT CAST(n_nationkey AS BIGINT) AS src,
               CAST((n_nationkey * 7 + 1) % 25 AS BIGINT) AS dst
        FROM nation),
      reach(x) AS (
        SELECT dst FROM e WHERE src = 0
        UNION SELECT e.dst FROM reach JOIN e ON e.src = reach.x)
      SELECT x FROM reach ORDER BY x""",

    // disjunctive-recursion formulation == the plain linear closure
    "q106_datalog_or_recursion" -> """
      WITH RECURSIVE e AS (
        SELECT CAST(n_nationkey AS BIGINT) AS src,
               CAST((n_nationkey * 7 + 1) % 25 AS BIGINT) AS dst
        FROM nation),
      reach(x) AS (
        SELECT dst FROM e WHERE src = 0
        UNION SELECT e.dst FROM reach JOIN e ON e.src = reach.x)
      SELECT x FROM reach ORDER BY x""",

    // non-linear datalog closure == linear SQL closure (same fixpoint)
    "q89_datalog_nonlinear" -> """
      WITH RECURSIVE e AS (
        SELECT CAST(n_nationkey AS BIGINT) AS src,
               CAST((n_nationkey * 7 + 1) % 25 AS BIGINT) AS dst
        FROM nation),
      path(x, y) AS (
        SELECT src, dst FROM e
        UNION SELECT p.x, e.dst FROM path p JOIN e ON e.src = p.y)
      SELECT x, y FROM path ORDER BY x, y""",

    // even/odd over the 0..24 successor chain: evens are exactly the
    // even keys (25 exists only as odd(25), not in the find)
    "q90_datalog_mutual" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS x FROM nation
      WHERE n_nationkey % 2 = 0 ORDER BY x""",

    "q91_datalog_subquery" -> """
      SELECT n_name AS nname, max(c_acctbal) AS mx
      FROM nation JOIN customer ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY nname"""
  )
}
