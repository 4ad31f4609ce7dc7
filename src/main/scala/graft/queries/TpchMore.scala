package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Rounding.r

/** Additional TPC-H-shaped macro queries (adapted to the fixture's
  * column subset — see FIXTURES.md; no partsupp/shipmode/commitdate).
  * These are bench headliners: multi-join, semi-join-exists, OR-of-ANDs
  * predicate pushdown, conditional aggregation. */
object TpchMore {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q4-shape: order-priority checking via EXISTS (left-semi join)
    "q0e_tpch_q4" -> ((s, dir) => {
      import s.implicits._
      val o = T(s, dir, "orders")
        .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1996-04-01")
      val late = T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select($"o_orderkey".as("ok"), $"o_orderdate".as("od")),
          $"l_orderkey" === $"ok")
        .filter($"l_shipdate" > $"od")
        .select($"l_orderkey")
      o.join(late, o("o_orderkey") === late("l_orderkey"), "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // Q10-shape: top-20 returned-revenue customers with nation
    "q0f_tpch_q10" -> ((s, dir) => {
      import s.implicits._
      val rev = T(s, dir, "lineitem").filter($"l_returnflag" === "R")
        .join(T(s, dir, "orders")
          .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1996-07-01"),
          $"l_orderkey" === $"o_orderkey")
      rev.join(T(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(T(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(r(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    }),

    // Q12-shape: priority counts per ship-month bucket (conditional agg)
    "q0g_tpch_q12" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .filter($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1998-01-01")
        .groupBy(date_trunc("month", $"l_shipdate").as("ship_month"))
        .agg(
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .as("high_line_count"),
          sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .as("low_line_count"))
        .orderBy("ship_month")
    }),

    // Q14-shape: promo revenue share per month (conditional numerator)
    "q0h_tpch_q14" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem")
        .filter($"l_shipdate" >= "1997-09-01" && $"l_shipdate" < "1997-10-01")
        .join(T(s, dir, "part"), $"l_partkey" === $"p_partkey")
        .agg(r(sum(when($"p_type".startsWith("PROMO"),
            $"l_extendedprice" * (lit(1) - $"l_discount")).otherwise(0.0)) * 100.0 /
          sum($"l_extendedprice" * (lit(1) - $"l_discount")), 6).as("promo_revenue"))
    }),

    // Q19-shape: OR-of-ANDs predicate (brand × size × quantity bands) —
    // the predicate-pushdown / join-filter stress query
    "q0i_tpch_q19" -> ((s, dir) => {
      import s.implicits._
      val li = T(s, dir, "lineitem")
      val p = T(s, dir, "part")
      li.join(p, $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) &&
            $"l_quantity".between(1, 21)) ||
          ($"p_brand" === "Brand#2" && $"p_size".between(1, 30) &&
            $"l_quantity".between(10, 30)) ||
          ($"p_brand" === "Brand#3" && $"p_size".between(1, 45) &&
            $"l_quantity".between(20, 40)))
        .agg(r(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q0e_tpch_q4" -> """
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1996-04-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q0f_tpch_q10" -> """
      SELECT c_custkey, c_name, n_name,
             floor((sum(l_extendedprice * (1 - l_discount)))*10000 + 0.5)/10000 AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1996-07-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20""",

    "q0g_tpch_q12" -> """
      SELECT date_trunc('month', CAST(l_shipdate AS TIMESTAMP)) AS ship_month,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1 ORDER BY ship_month""",

    "q0h_tpch_q14" -> """
      SELECT floor((100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) /
                    sum(l_extendedprice * (1 - l_discount)))*1000000 + 0.5)/1000000
             AS promo_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        AND l_shipdate <  TIMESTAMP '1997-10-01'""",

    "q0i_tpch_q19" -> """
      SELECT floor((sum(l_extendedprice * (1 - l_discount)))*10000 + 0.5)/10000 AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 45 AND l_quantity BETWEEN 20 AND 40)"""
  )
}
