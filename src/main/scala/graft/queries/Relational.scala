package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ra.RA
import Rounding.r

/** Oracle-checked queries covering the reference's relational operator
  * inventory (SURVEY.md §2.1, ops 1–26). Each query has a DuckDB-runnable
  * oracle twin in `oracle` with IDENTICAL output column names and a total
  * ORDER BY so hash comparison is deterministic in both engines.
  *
  * Cross-engine type alignment rules used throughout:
  *   - integer sums/lengths/ranks are BIGINT in DuckDB → Spark casts to long
  *   - order-dependent float aggregates are round()ed identically on both
  *     sides (sequential vs partial aggregation differ in final ulps)
  *   - nullable sort keys get explicit NULLS FIRST/LAST on both sides.
  */
object Relational {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ===== flagship + TPC-H-style bench heads =====

    // :scan + :select + :group-by + :order-by, TPC-H Q1 shape
    "q00_tpch_q1" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          r(sum($"l_quantity"), 2).as("sum_qty"),
          r(sum($"l_extendedprice"), 2).as("sum_base_price"),
          r(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
          r(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2).as("sum_charge"),
          r(avg($"l_quantity"), 2).as("avg_qty"),
          r(avg($"l_extendedprice"), 2).as("avg_price"),
          r(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // 3-way join + agg + top-k, TPC-H Q3 shape; dimension side broadcast
    "q0b_tpch_q3" -> ((s, dir) => {
      import s.implicits._
      val cust = T(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord = T(s, dir, "orders").filter($"o_orderdate" < lit("1997-03-15").cast("timestamp"))
      val li = T(s, dir, "lineitem").filter($"l_shipdate" > lit("1997-03-15").cast("timestamp"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(r(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
        .select($"l_orderkey", $"revenue", $"o_orderdate")
        .orderBy($"revenue".desc, $"o_orderdate", $"l_orderkey")
        .limit(20)
    }),

    // 6-way star join, TPC-H Q5 shape; small dims broadcast
    "q0c_tpch_q5" -> ((s, dir) => {
      import s.implicits._
      val nation = T(s, dir, "nation")
      val cust = T(s, dir, "customer")
      val ord = T(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      val li = T(s, dir, "lineitem")
      val supp = T(s, dir, "supplier")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(supp), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(r(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    }),

    // pure scan-heavy filter + global agg, TPC-H Q6 shape
    "q0d_tpch_q6" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(r(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"))
    }),

    // ===== §2.1 operator-per-query coverage =====

    // #1 :scan — projection + sargable predicate pushed to parquet
    "q01_scan" -> ((s, dir) => {
      import s.implicits._
      RA.scan(s, dir, "lineitem",
        cols = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"),
        pred = Some($"l_shipdate" >= lit("1998-01-01").cast("timestamp")))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // #2 :table — literal VALUES relation
    "q02_values" -> ((s, _) => {
      import s.implicits._
      Seq((1L, Option("chair")), (2L, Option("desk")), (3L, Option.empty[String]))
        .toDF("id", "name").orderBy("id")
    }),

    // #5 :select — 3VL filter incl. IS NOT FALSE over UNKNOWN
    "q03_filter_3vl" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      RA.select(c,
        expr("(c_acctbal > 5000 AND nullif(c_mktsegment,'BUILDING') = 'AUTOMOBILE') IS NOT FALSE"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          expr("nullif(c_mktsegment,'BUILDING')").as("seg"))
        .orderBy("c_custkey")
    }),

    // #6/#7 :project / :map — computed expressions
    "q04_project" -> ((s, dir) => {
      import s.implicits._
      RA.project(T(s, dir, "lineitem"),
        $"l_orderkey", $"l_linenumber",
        ($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
        ($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).as("charge"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // #8 :rename
    "q05_rename" -> ((s, dir) => {
      RA.rename(T(s, dir, "customer"),
        "c_custkey" -> "id", "c_name" -> "full_name", "c_mktsegment" -> "segment")
        .select("id", "full_name", "segment").orderBy("id")
    }),

    // #9 :distinct
    "q06_distinct" -> ((s, dir) => {
      RA.distinct(T(s, dir, "lineitem").select("l_returnflag", "l_linestatus"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // #10 :union-all
    "q07_union_all" -> ((s, dir) => {
      import s.implicits._
      RA.unionAll(
        T(s, dir, "customer").select($"c_custkey".as("k"), lit("customer").as("src")),
        T(s, dir, "supplier").select($"s_suppkey".as("k"), lit("supplier").as("src")))
        .orderBy("k", "src")
    }),

    // #11 :intersect
    "q08_intersect" -> ((s, dir) => {
      import s.implicits._
      RA.intersect(
        T(s, dir, "customer").select($"c_nationkey".as("nk")),
        T(s, dir, "supplier").select($"s_nationkey".as("nk")))
        .orderBy("nk")
    }),

    // #12 :difference (EXCEPT) — nations with customers but no wealthy
    // supplier (non-empty by construction so the op is actually exercised)
    "q09_except" -> ((s, dir) => {
      import s.implicits._
      RA.difference(
        T(s, dir, "customer").select($"c_nationkey".as("nk")),
        T(s, dir, "supplier").filter($"s_acctbal" > 6000).select($"s_nationkey".as("nk")))
        .orderBy("nk")
    }),

    // #13 :cross-join
    "q10_cross_join" -> ((s, dir) => {
      RA.crossJoin(T(s, dir, "region").select("r_name"),
        T(s, dir, "nation").select("n_name"))
        .orderBy("r_name", "n_name")
    }),

    // #14 :join — inner equi hash join
    "q11_join_inner" -> ((s, dir) => {
      import s.implicits._
      RA.join(T(s, dir, "orders"), T(s, dir, "customer"),
        $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"o_totalprice", $"c_name", $"c_mktsegment")
        .orderBy("o_orderkey")
    }),

    // #15 :left-outer-join
    "q12_join_left" -> ((s, dir) => {
      import s.implicits._
      RA.join(T(s, dir, "customer"), T(s, dir, "orders"),
        $"c_custkey" === $"o_custkey", "left_outer")
        .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice")
        .orderBy($"c_custkey".asc, $"o_orderkey".asc_nulls_first)
    }),

    // #16 :full-outer-join
    "q13_join_full" -> ((s, dir) => {
      import s.implicits._
      val ca = T(s, dir, "customer").groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
      val sa = T(s, dir, "supplier").groupBy($"s_nationkey").agg(count(lit(1)).as("n_supp"))
      RA.join(ca, sa, $"c_nationkey" === $"s_nationkey", "full_outer")
        .select($"c_nationkey", $"n_cust", $"s_nationkey", $"n_supp")
        .orderBy($"c_nationkey".asc_nulls_first, $"s_nationkey".asc_nulls_first)
    }),

    // #17 :semi-join (EXISTS)
    "q14_semi_join" -> ((s, dir) => {
      import s.implicits._
      RA.join(T(s, dir, "customer"), T(s, dir, "orders"),
        $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name").orderBy("c_custkey")
    }),

    // #18 :anti-join (NOT EXISTS) — customers with no high-value order
    // (non-empty: every customer has orders, not every one a big order)
    "q15_anti_join" -> ((s, dir) => {
      import s.implicits._
      RA.join(T(s, dir, "customer"),
        T(s, dir, "orders").filter($"o_totalprice" > 450000),
        $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name").orderBy("c_custkey")
    }),

    // #19 :group-by — full aggregate surface (SURVEY.md §2.2)
    "q16_groupby_aggs" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem").groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("cnt"),
          count($"l_quantity").as("cnt_qty"),
          countDistinct($"l_partkey").as("nd_part"),
          r(sum($"l_quantity"), 2).as("sum_qty"),
          r(sum_distinct($"l_quantity"), 2).as("sum_dq"),
          r(avg($"l_extendedprice"), 2).as("avg_price"),
          min($"l_discount").as("min_disc"),
          max($"l_discount").as("max_disc"),
          r(stddev_samp($"l_extendedprice"), 2).as("std_price"),
          r(var_samp($"l_quantity"), 2).as("var_qty"),
          r(stddev_pop($"l_quantity"), 2).as("stdp_qty"),
          r(var_pop($"l_discount"), 6).as("varp_disc"),
          expr("bool_and(l_quantity > 0)").as("all_pos"),
          expr("bool_or(l_discount > 0.09)").as("any_big_disc"))
        .orderBy("l_returnflag")
    }),

    // #20 :order-by — desc + explicit null placement
    "q17_orderby" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "orders")
        .select($"o_orderkey", expr("nullif(o_orderstatus,'O')").as("st"), $"o_totalprice")
        .orderBy($"st".desc_nulls_last, $"o_totalprice".desc, $"o_orderkey")
    }),

    // #21 :top — offset + limit after total sort
    "q18_top" -> ((s, dir) => {
      import s.implicits._
      RA.top(
        T(s, dir, "lineitem").select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
          .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber"),
        offset = 50, limit = 100)
    }),

    // #22 :unwind — explode list column
    "q19_unwind" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "documents")
        .select($"doc_id", explode(split($"text", " ")).as("word"))
        .orderBy("doc_id", "word")
    }),

    // #23 :max-1-row — scalar subquery cardinality (Spark enforces the
    // same runtime check inside its scalar-subquery machinery)
    "q20_scalar_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_custkey, c_name,
               (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price
        FROM customer ORDER BY c_custkey""")
    }),

    // #24 :apply — correlated LATERAL (top-2 orders per customer)
    "q21_lateral_apply" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c_custkey, o_orderkey""")
    }),

    // #25 :assign/:let — common subplan bound once, used twice
    "q22_cte_assign" -> ((s, dir) => {
      import s.implicits._
      val spend = T(s, dir, "orders").groupBy($"o_custkey")
        .agg(r(sum($"o_totalprice"), 2).as("spend"))
      val mx = spend.agg(max($"spend").as("mx"))
      spend.join(broadcast(mx), $"spend" === $"mx")
        .select($"o_custkey", $"spend").orderBy("o_custkey")
    }),

    // #26 :fixpoint — recursive closure via semi-naive iteration
    "q23_fixpoint" -> ((s, dir) => {
      import s.implicits._
      RA.fixpoint(
        base = T(s, dir, "region").select($"r_regionkey".cast("long").as("x")),
        step = df => df.select(($"x" + 29).as("x")).filter($"x" < 150))
        .orderBy("x")
    }),

    // §2.2 array_agg (order-canonicalized; serialized to a string on both
    // engines because the driver's pandas compare can't hash raw arrays)
    "q24_array_agg" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem").groupBy($"l_orderkey")
        .agg(array_join(sort_array(collect_list($"l_linenumber")), ",").as("lines"))
        .orderBy("l_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q00_tpch_q1" -> """
      SELECT l_returnflag, l_linestatus,
             floor((sum(l_quantity))*100 + 0.5)/100 AS sum_qty,
             floor((sum(l_extendedprice))*100 + 0.5)/100 AS sum_base_price,
             floor((sum(l_extendedprice*(1-l_discount)))*100 + 0.5)/100 AS sum_disc_price,
             floor((sum(l_extendedprice*(1-l_discount)*(1+l_tax)))*100 + 0.5)/100 AS sum_charge,
             floor((avg(l_quantity))*100 + 0.5)/100 AS avg_qty,
             floor((avg(l_extendedprice))*100 + 0.5)/100 AS avg_price,
             floor((avg(l_discount))*10000 + 0.5)/10000 AS avg_disc,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q0b_tpch_q3" -> """
      SELECT l_orderkey, floor((sum(l_extendedprice*(1-l_discount)))*100 + 0.5)/100 AS revenue, o_orderdate
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-03-15'
        AND l_shipdate  > TIMESTAMP '1997-03-15'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 20""",

    "q0c_tpch_q5" -> """
      SELECT n_name, floor((sum(l_extendedprice*(1-l_discount)))*100 + 0.5)/100 AS revenue
      FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey  = c_custkey
                    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
                    JOIN nation   ON s_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q0d_tpch_q6" -> """
      SELECT floor((sum(l_extendedprice*l_discount))*100 + 0.5)/100 AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    "q01_scan" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01' ORDER BY l_orderkey, l_linenumber""",

    "q02_values" -> """
      SELECT * FROM (VALUES (1::BIGINT,'chair'),(2::BIGINT,'desk'),(3::BIGINT,NULL))
      AS t(id, name) ORDER BY id""",

    "q03_filter_3vl" -> """
      SELECT c_custkey, c_name, c_acctbal, nullif(c_mktsegment,'BUILDING') AS seg
      FROM customer
      WHERE (c_acctbal > 5000 AND nullif(c_mktsegment,'BUILDING') = 'AUTOMOBILE') IS NOT FALSE
      ORDER BY c_custkey""",

    "q04_project" -> """
      SELECT l_orderkey, l_linenumber,
             l_extendedprice*(1-l_discount) AS revenue,
             l_extendedprice*(1-l_discount)*(1+l_tax) AS charge
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q05_rename" -> """
      SELECT c_custkey AS id, c_name AS full_name, c_mktsegment AS segment
      FROM customer ORDER BY id""",

    "q06_distinct" -> """
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""",

    "q07_union_all" -> """
      SELECT c_custkey AS k, 'customer' AS src FROM customer
      UNION ALL SELECT s_suppkey AS k, 'supplier' AS src FROM supplier
      ORDER BY k, src""",

    "q08_intersect" -> """
      SELECT c_nationkey AS nk FROM customer
      INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""",

    "q09_except" -> """
      SELECT c_nationkey AS nk FROM customer
      EXCEPT SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 6000
      ORDER BY nk""",

    "q10_cross_join" -> """
      SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name""",

    "q11_join_inner" -> """
      SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
      FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey""",

    "q12_join_left" -> """
      SELECT c_custkey, c_name, o_orderkey, o_totalprice
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      ORDER BY c_custkey, o_orderkey NULLS FIRST""",

    "q13_join_full" -> """
      SELECT c_nationkey, n_cust, s_nationkey, n_supp
      FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1) a
      FULL JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) b
      ON c_nationkey = s_nationkey
      ORDER BY c_nationkey NULLS FIRST, s_nationkey NULLS FIRST""",

    "q14_semi_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "q15_anti_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      ORDER BY c_custkey""",

    "q16_groupby_aggs" -> """
      SELECT l_returnflag,
             count(*) AS cnt,
             count(l_quantity) AS cnt_qty,
             count(DISTINCT l_partkey) AS nd_part,
             floor((sum(l_quantity))*100 + 0.5)/100 AS sum_qty,
             floor((sum(DISTINCT l_quantity))*100 + 0.5)/100 AS sum_dq,
             floor((avg(l_extendedprice))*100 + 0.5)/100 AS avg_price,
             min(l_discount) AS min_disc,
             max(l_discount) AS max_disc,
             floor((stddev_samp(l_extendedprice))*100 + 0.5)/100 AS std_price,
             floor((var_samp(l_quantity))*100 + 0.5)/100 AS var_qty,
             floor((stddev_pop(l_quantity))*100 + 0.5)/100 AS stdp_qty,
             floor((var_pop(l_discount))*1000000 + 0.5)/1000000 AS varp_disc,
             bool_and(l_quantity > 0) AS all_pos,
             bool_or(l_discount > 0.09) AS any_big_disc
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q17_orderby" -> """
      SELECT o_orderkey, nullif(o_orderstatus,'O') AS st, o_totalprice
      FROM orders ORDER BY st DESC NULLS LAST, o_totalprice DESC, o_orderkey""",

    "q18_top" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100 OFFSET 50""",

    "q19_unwind" -> """
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
      ORDER BY doc_id, word""",

    "q20_scalar_subquery" -> """
      SELECT c_custkey, c_name,
             (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price
      FROM customer ORDER BY c_custkey""",

    "q21_lateral_apply" -> """
      SELECT c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_custkey = c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      ORDER BY c_custkey, o_orderkey""",

    "q22_cte_assign" -> """
      WITH spend AS (SELECT o_custkey, floor((sum(o_totalprice))*100 + 0.5)/100 AS spend
                     FROM orders GROUP BY o_custkey)
      SELECT s.o_custkey, s.spend
      FROM spend s, (SELECT max(spend) AS mx FROM spend) m
      WHERE s.spend = m.mx ORDER BY s.o_custkey""",

    "q23_fixpoint" -> """
      WITH RECURSIVE t(x) AS (
        SELECT CAST(r_regionkey AS BIGINT) FROM region
        UNION SELECT x+29 FROM t WHERE x+29 < 150)
      SELECT x FROM t ORDER BY x""",

    "q24_array_agg" -> """
      SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') AS lines
      FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""
  )
}
