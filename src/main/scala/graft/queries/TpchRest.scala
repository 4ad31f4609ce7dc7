package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Rounding.r

/** Remaining TPC-H-shaped queries (Q2,7,8,9,11,13,15,16,17,18,20,21,22),
  * adapted to the fixture's column subset (FIXTURES.md: no partsupp /
  * l_commitdate / c_phone, so supply cost, lateness and country codes are
  * derived from lineitem/orderdate/nationkey instead). Together with
  * Relational (Q1,3,5,6) and TpchMore (Q4,10,12,14,19) this completes the
  * 22-query sweep. Shapes exercised: aggregate-then-rejoin min (Q2),
  * nation-pair OR joins (Q7), conditional market share (Q8), grouped
  * scalar-subquery HAVING (Q11), outer-join count distribution (Q13),
  * max-of-aggregate view (Q15), anti-joined count-distinct (Q16),
  * correlated-avg filter (Q17), having-semijoin top-k (Q18), nested
  * semi-join chain (Q20), exists/not-exists per-row quantification (Q21),
  * and anti-join + global scalar threshold (Q22).
  *
  * Cross-engine parity rules (see Rounding): float aggregates are rounded
  * with the exact-IEEE floor formula; scores are rounded BEFORE any
  * min/max-equality compare; quantity sums are exact (integral doubles).
  */
object TpchRest {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q2-shape: min-cost supplier per part (supply cost derived as the
    // min unit price ever charged in lineitem), Europe-only suppliers.
    // The correlated scalar subquery becomes a window-min over ONE
    // aggregation (an agg-then-rejoin would re-compute the whole cost
    // subtree — Spark has no cross-branch CSE), and the part filter is
    // semi-joined into lineitem before the group-by so the big scan is
    // pruned at the source. Per-(part,supp) cost is deterministic (min
    // of exact divisions), so the equality filter is safe cross-engine.
    "q0j_tpch_q2" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val eu = T(s, dir, "supplier")
        .join(broadcast(T(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(T(s, dir, "region").filter($"r_name" === "EUROPE")),
          $"n_regionkey" === $"r_regionkey")
        .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
      val pp = broadcast(T(s, dir, "part")
        .filter($"p_size".between(10, 20) && $"p_type" === "STANDARD")
        .select($"p_partkey", $"p_brand"))
      val cost = T(s, dir, "lineitem")
        .join(pp.select($"p_partkey"), $"l_partkey" === $"p_partkey", "left_semi")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(min($"l_extendedprice" / $"l_quantity").as("supplycost"))
      cost.join(broadcast(eu), $"l_suppkey" === $"s_suppkey")
        .withColumn("best_cost",
          min($"supplycost").over(Window.partitionBy($"l_partkey")))
        .filter($"supplycost" === $"best_cost")
        .join(pp, $"l_partkey" === $"p_partkey")
        .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_brand")
    }),

    // Q7-shape: bilateral shipping volume between two nations by year.
    "q0k_tpch_q7" -> ((s, dir) => {
      import s.implicits._
      val pair = Seq("NATION_15", "NATION_20")
      val n1 = broadcast(T(s, dir, "nation").filter($"n_name".isin(pair: _*))
        .select($"n_nationkey".as("snk"), $"n_name".as("supp_nation")))
      val n2 = broadcast(T(s, dir, "nation").filter($"n_name".isin(pair: _*))
        .select($"n_nationkey".as("cnk"), $"n_name".as("cust_nation")))
      T(s, dir, "lineitem")
        .filter($"l_shipdate".between("1995-01-01", "1996-12-31"))
        .join(broadcast(T(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
        .join(n1, $"s_nationkey" === $"snk")
        .join(T(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(T(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(n2, $"c_nationkey" === $"cnk")
        .filter($"supp_nation" =!= $"cust_nation")
        .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
        .agg(r(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Q8-shape: market share of one supplier nation within a customer
    // region, per order year (conditional numerator / total denominator).
    "q0l_tpch_q8" -> ((s, dir) => {
      import s.implicits._
      val asia = broadcast(T(s, dir, "nation")
        .join(T(s, dir, "region").filter($"r_name" === "ASIA"),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey".as("cnk")))
      val suppN = broadcast(T(s, dir, "nation")
        .select($"n_nationkey".as("snk"), $"n_name".as("supp_nation")))
      T(s, dir, "lineitem")
        .join(broadcast(T(s, dir, "part").filter($"p_type" === "ECONOMY")
          .select($"p_partkey")), $"l_partkey" === $"p_partkey")
        .join(T(s, dir, "orders")
          .filter($"o_orderdate".between("1995-01-01", "1996-12-31"))
          .select($"o_orderkey", $"o_custkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .join(T(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(asia, $"c_nationkey" === $"cnk", "left_semi")
        .join(broadcast(T(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
        .join(suppN, $"s_nationkey" === $"snk")
        .withColumn("volume", $"l_extendedprice" * (lit(1) - $"l_discount"))
        .groupBy(year($"o_orderdate").as("o_year"))
        .agg(r(sum(when($"supp_nation" === "NATION_15", $"volume").otherwise(0.0)) /
          sum($"volume"), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // Q9-shape: profit by supplier nation and year; supply cost proxied
    // as 10% of retail price (no partsupp in the fixture).
    "q0m_tpch_q9" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem")
        .join(broadcast(T(s, dir, "part").filter($"p_name".contains("widget"))
          .select($"p_partkey", $"p_retailprice")), $"l_partkey" === $"p_partkey")
        .join(broadcast(T(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(T(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
        .join(T(s, dir, "orders").select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .withColumn("amount",
          $"l_extendedprice" * (lit(1) - $"l_discount") -
            $"p_retailprice" * $"l_quantity" * lit(0.1))
        .groupBy($"n_name".as("nation"), year($"o_orderdate").as("o_year"))
        .agg(r(sum($"amount"), 4).as("sum_profit"))
        .orderBy($"nation", $"o_year".desc)
    }),

    // Q11-shape: parts whose inventory value (from one nation's suppliers)
    // exceeds a fraction of the total — scalar-subquery HAVING. Values are
    // rounded BEFORE the threshold compare for cross-engine stability.
    "q0n_tpch_q11" -> ((s, dir) => {
      import s.implicits._
      val supp15 = T(s, dir, "supplier")
        .join(broadcast(T(s, dir, "nation").filter($"n_name" === "NATION_15")
          .select($"n_nationkey".as("nk"))), $"s_nationkey" === $"nk", "left_semi")
        .select($"s_suppkey".as("sk"))
      val vals = T(s, dir, "lineitem")
        .join(broadcast(supp15), $"l_suppkey" === $"sk", "left_semi")
        .groupBy($"l_partkey")
        .agg(r(sum($"l_extendedprice" * $"l_quantity"), 2).as("part_value"))
      val total = vals.agg(sum($"part_value").as("tot"))
      vals.crossJoin(broadcast(total))
        .filter($"part_value" > $"tot" * 0.001)
        .select($"l_partkey", $"part_value")
        .orderBy($"part_value".desc, $"l_partkey")
    }),

    // Q13-shape: distribution of order counts per customer (left outer
    // join that must keep zero-order customers), priority filter in lieu
    // of the comment filter.
    "q0o_tpch_q13" -> ((s, dir) => {
      import s.implicits._
      val ord = T(s, dir, "orders")
        .filter($"o_orderpriority" =!= "4-NOT SPECIFIED")
        .select($"o_custkey", $"o_orderkey")
      T(s, dir, "customer")
        .join(ord, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    }),

    // Q15-shape: supplier(s) with the maximum quarterly revenue. Revenue
    // is rounded before the max-equality compare (round-before-rank rule).
    "q0p_tpch_q15" -> ((s, dir) => {
      import s.implicits._
      val rev = T(s, dir, "lineitem")
        .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-04-01")
        .groupBy($"l_suppkey")
        .agg(r(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4)
          .as("total_revenue"))
      val top = rev.agg(max($"total_revenue").as("mr"))
      T(s, dir, "supplier").join(rev, $"s_suppkey" === $"l_suppkey")
        .crossJoin(broadcast(top))
        .filter($"total_revenue" === $"mr")
        .select($"s_suppkey", $"s_name", $"total_revenue")
        .orderBy($"s_suppkey")
    }),

    // Q16-shape: distinct supplier count per part attribute triple,
    // excluding bad-standing suppliers via anti-join.
    "q0q_tpch_q16" -> ((s, dir) => {
      import s.implicits._
      val bad = T(s, dir, "supplier").filter($"s_acctbal" < 0)
        .select($"s_suppkey".as("bad_sk"))
      val ps = T(s, dir, "lineitem").select($"l_partkey", $"l_suppkey")
        .join(broadcast(bad), $"l_suppkey" === $"bad_sk", "left_anti")
      T(s, dir, "part")
        .filter($"p_brand" =!= "Brand#5" && !$"p_type".startsWith("PROMO") &&
          $"p_size".isin(1, 5, 10, 15, 20, 25, 30, 35))
        .join(ps, $"p_partkey" === $"l_partkey")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
    }),

    // Q17-shape: revenue lost to small-quantity lines, correlated per-part
    // average threshold. Quantities are integral doubles, so the per-part
    // avg is exact in both engines and the < compare is stable.
    "q0r_tpch_q17" -> ((s, dir) => {
      import s.implicits._
      val pk = broadcast(T(s, dir, "part")
        .filter($"p_brand" === "Brand#3" && $"p_type" === "SMALL")
        .select($"p_partkey"))
      val li = T(s, dir, "lineitem").join(pk, $"l_partkey" === $"p_partkey")
      val av = li.groupBy($"l_partkey".as("ap"))
        .agg((avg($"l_quantity") * 0.5).as("half_avg"))
      li.join(av, $"l_partkey" === $"ap")
        .filter($"l_quantity" < $"half_avg")
        .agg(r(sum($"l_extendedprice") / 7.0, 4).as("avg_yearly"))
    }),

    // Q18-shape: large-volume orders (HAVING sum(qty) semi-join) top-100.
    "q0s_tpch_q18" -> ((s, dir) => {
      import s.implicits._
      val big = T(s, dir, "lineitem").groupBy($"l_orderkey".as("lk"))
        .agg(sum($"l_quantity").as("sum_qty"))
        .filter($"sum_qty" > 300)
      T(s, dir, "orders").join(big, $"o_orderkey" === $"lk")
        .join(T(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
          $"o_totalprice", $"sum_qty")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
    }),

    // Q20-shape: suppliers who moved enough 'red' parts — nested
    // subquery chain compiled to broadcast + semi joins.
    "q0t_tpch_q20" -> ((s, dir) => {
      import s.implicits._
      val red = broadcast(T(s, dir, "part").filter($"p_name".startsWith("red"))
        .select($"p_partkey"))
      val qty = T(s, dir, "lineitem")
        .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01")
        .join(red, $"l_partkey" === $"p_partkey")
        .groupBy($"l_suppkey").agg(sum($"l_quantity").as("tq"))
        .filter($"tq" > 400)
        .select($"l_suppkey")
      T(s, dir, "supplier")
        .join(qty, $"s_suppkey" === $"l_suppkey", "left_semi")
        .select($"s_name", $"s_acctbal")
        .orderBy($"s_name")
    }),

    // Q21-shape: suppliers who alone shipped late on multi-supplier
    // finished orders. The EXISTS / NOT EXISTS pair is evaluated with
    // per-order windows instead of semi+anti self-joins: one shuffle by
    // orderkey (the join), then both distinct-supplier counts ride the
    // SAME partitioning (no further exchange), vs ~5 lineitem-scale
    // shuffles for the self-join form. "another supplier exists" ⟺
    // nsupp ≥ 2; "no other supplier late" ⟺ the late-supplier set is
    // exactly {self} ⟺ nlate = 1 on a late row. "Late" is derived from
    // shipdate vs orderdate (no commit/receipt dates in the fixture).
    "q0u_tpch_q21" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"l_orderkey")
      T(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey", $"l_shipdate")
        .join(T(s, dir, "orders").filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_orderdate"), $"l_orderkey" === $"o_orderkey")
        .withColumn("late", $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .withColumn("nsupp", size(collect_set($"l_suppkey").over(w)))
        .withColumn("nlate", size(collect_set(when($"late", $"l_suppkey")).over(w)))
        .filter($"late" && $"nsupp" >= 2 && $"nlate" === 1)
        .join(broadcast(T(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
    }),

    // Q22-shape: well-funded customers with no recent orders, grouped by
    // a derived country code (nationkey mod 5 — fixture has no phone).
    "q0v_tpch_q22" -> ((s, dir) => {
      import s.implicits._
      val cust = T(s, dir, "customer")
      val avgBal = cust.filter($"c_acctbal" > 0.0).agg(avg($"c_acctbal").as("ab"))
      val recent = T(s, dir, "orders").filter($"o_orderdate" >= "2000-01-01")
        .select($"o_custkey")
      cust.join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .crossJoin(broadcast(avgBal))
        .filter($"c_acctbal" > $"ab")
        .groupBy(($"c_nationkey" % 5).as("cntrycode"))
        .agg(count(lit(1)).as("numcust"), r(sum($"c_acctbal"), 2).as("totacctbal"))
        .orderBy("cntrycode")
    })
  )

  val oracle: Map[String, String] = Map(
    "q0j_tpch_q2" -> """
      WITH ps AS (SELECT l_partkey, l_suppkey,
                         min(l_extendedprice/l_quantity) AS supplycost
                  FROM lineitem GROUP BY 1,2),
      eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
      ec AS (SELECT * FROM ps JOIN eu ON l_suppkey = s_suppkey)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
      FROM part JOIN ec ON p_partkey = l_partkey
      WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
        AND supplycost = (SELECT min(supplycost) FROM ec e2
                          WHERE e2.l_partkey = p_partkey)""",

    "q0k_tpch_q7" -> """
      SELECT supp_nation, cust_nation, l_year,
             floor(sum(volume)*10000 + 0.5)/10000 AS revenue
      FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01'
                                 AND TIMESTAMP '1996-12-31'
              AND n1.n_name IN ('NATION_15','NATION_20')
              AND n2.n_name IN ('NATION_15','NATION_20')
              AND n1.n_name <> n2.n_name)
      GROUP BY 1,2,3 ORDER BY 1,2,3""",

    "q0l_tpch_q8" -> """
      SELECT o_year,
             floor((sum(CASE WHEN supp_nation = 'NATION_15' THEN volume
                             ELSE 0.0 END) / sum(volume))*1000000 + 0.5)/1000000
               AS mkt_share
      FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE p_type = 'ECONOMY'
              AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                                  AND TIMESTAMP '1996-12-31'
              AND c_nationkey IN (SELECT n_nationkey FROM nation
                                  JOIN region ON n_regionkey = r_regionkey
                                  WHERE r_name = 'ASIA'))
      GROUP BY o_year ORDER BY o_year""",

    "q0m_tpch_q9" -> """
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             floor(sum(l_extendedprice * (1 - l_discount) -
                       p_retailprice * l_quantity * 0.1)*10000 + 0.5)/10000
               AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%widget%'
      GROUP BY 1,2 ORDER BY nation, o_year DESC""",

    "q0n_tpch_q11" -> """
      WITH v AS (SELECT l_partkey,
                        floor(sum(l_extendedprice * l_quantity)*100 + 0.5)/100
                          AS part_value
                 FROM lineitem
                 WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                                     JOIN nation ON s_nationkey = n_nationkey
                                     WHERE n_name = 'NATION_15')
                 GROUP BY 1)
      SELECT l_partkey, part_value FROM v
      WHERE part_value > (SELECT sum(part_value) FROM v) * 0.001
      ORDER BY part_value DESC, l_partkey""",

    "q0o_tpch_q13" -> """
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey
             AND o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",

    "q0p_tpch_q15" -> """
      WITH revenue AS (
        SELECT l_suppkey,
               floor(sum(l_extendedprice * (1 - l_discount))*10000 + 0.5)/10000
                 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier JOIN revenue ON s_suppkey = l_suppkey
      WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      ORDER BY s_suppkey""",

    "q0q_tpch_q16" -> """
      SELECT p_brand, p_type, p_size,
             count(DISTINCT l_suppkey) AS supplier_cnt
      FROM part JOIN lineitem ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
        AND p_size IN (1,5,10,15,20,25,30,35)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
      GROUP BY 1,2,3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "q0r_tpch_q17" -> """
      SELECT floor((sum(l_extendedprice) / 7.0)*10000 + 0.5)/10000
               AS avg_yearly
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
        AND l_quantity < (SELECT avg(l_quantity) * 0.5 FROM lineitem l2
                          WHERE l2.l_partkey = p_partkey)""",

    "q0s_tpch_q18" -> """
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             sum_qty
      FROM orders
      JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300) big
        ON o_orderkey = big.l_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "q0t_tpch_q20" -> """
      SELECT s_name, s_acctbal FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey HAVING sum(l_quantity) > 400)
      ORDER BY s_name""",

    "q0u_tpch_q21" -> """
      WITH l1 AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      SELECT s_name, count(*) AS numwait
      FROM l1 JOIN supplier ON l_suppkey = s_suppkey
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM l1 l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey)
      GROUP BY s_name ORDER BY numwait DESC, s_name""",

    "q0v_tpch_q22" -> """
      SELECT c_nationkey % 5 AS cntrycode, count(*) AS numcust,
             floor(sum(c_acctbal)*100 + 0.5)/100 AS totacctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0)
        AND c_custkey NOT IN (SELECT o_custkey FROM orders
                              WHERE o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY 1 ORDER BY 1"""
  )
}
