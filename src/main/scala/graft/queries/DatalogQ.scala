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
      SELECT x FROM reach ORDER BY x"""
  )
}
