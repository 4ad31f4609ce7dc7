package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.ra.RA
import Rounding.r

/** Gap-closing catalog: the `:csv` source, the math expression surface,
  * and the expression odds-and-ends named in SURVEY.md §2.4 that had no
  * query (IS [NOT] DISTINCT FROM, overlay, trim variants, octet_length,
  * avg(DISTINCT), unwind WITH ORDINALITY). */
object Extras {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Deterministic CSV fixture, written once (driver-side, 100 tiny
    * rows) to an absolute path both engines read: Spark via RA.csv with
    * a declared schema, DuckDB via read_csv. */
  val csvPath = "/tmp/graft_csv_fixture.csv"
  private def ensureCsv(): Unit = {
    val p = Paths.get(csvPath)
    if (!Files.exists(p)) {
      val rows = (1 to 100).map { i =>
        val cat = Seq("red", "green", "blue")(i % 3)
        s"$i,item_$i,$cat,${i * 3 % 7}.${i % 10}"
      }
      Files.write(p, ("id,name,cat,score\n" + rows.mkString("\n") + "\n")
        .getBytes("UTF-8"))
    }
  }

  private val csvSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("cat", StringType), StructField("score", DoubleType)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.1 #3 :csv — declared-schema csv scan + filter/agg on top
    "q59_csv_source" -> ((s, dir) => {
      import s.implicits._
      ensureCsv()
      RA.csv(s, csvPath, csvSchema)
        .filter($"score" > 1.0)
        .groupBy($"cat")
        .agg(count(lit(1)).as("n"), r(sum($"score"), 4).as("total"))
        .orderBy("cat")
    }),

    // §2.4 math: ceil/floor/sqrt/exp/power/ln/log10/round + trig
    "q60_math_funcs" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem")
        .filter($"l_orderkey" % 100 === 0)
        .select(
          $"l_orderkey", $"l_linenumber",
          ceil($"l_extendedprice").as("c_ceil"),
          floor($"l_extendedprice").as("c_floor"),
          round($"l_extendedprice", 1).as("c_round"),
          r(sqrt($"l_extendedprice"), 6).as("c_sqrt"),
          r(exp($"l_discount"), 6).as("c_exp"),
          r(pow($"l_quantity", lit(2.0)), 6).as("c_pow"),
          r(log($"l_extendedprice"), 6).as("c_ln"),
          r(log10($"l_extendedprice"), 6).as("c_log10"),
          r(sin($"l_tax"), 6).as("c_sin"),
          r(cos($"l_tax"), 6).as("c_cos"),
          r(atan($"l_tax"), 6).as("c_atan"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // §2.4 comparison + string odds and ends: IS [NOT] DISTINCT FROM
    // (null-safe =), overlay, trim LEADING/TRAILING, octet_length
    "q61_expr_misc" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "customer")
        .select(
          $"c_custkey",
          // IS DISTINCT FROM = NOT(<=>); exercised against a NULLable arm
          (!(when($"c_acctbal" > 0, $"c_mktsegment")
            .otherwise(lit(null)) <=> lit("BUILDING"))).as("seg_distinct"),
          (when($"c_acctbal" > 0, $"c_mktsegment")
            .otherwise(lit(null)) <=> lit("BUILDING")).as("seg_not_distinct"),
          overlay($"c_name", lit("XX"), lit(10)).as("name_overlay"),
          ltrim($"c_name", "C").as("trim_leading"),
          rtrim($"c_name", "0123456789").as("trim_trailing"),
          octet_length($"c_name").cast("long").as("name_bytes"))
        .orderBy("c_custkey")
    }),

    // §2.2 avg(DISTINCT) + count(DISTINCT) in one aggregation
    "q62_avg_distinct" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          r(expr("avg(DISTINCT l_quantity)"), 6).as("avg_dist_qty"),
          count_distinct($"l_quantity").as("n_dist_qty"),
          r(avg($"l_quantity"), 6).as("avg_qty"))
        .orderBy("l_returnflag")
    }),

    // §2.1 #22 unwind WITH ORDINALITY (posexplode, 1-based)
    "q63_unwind_ordinality" -> ((s, dir) => {
      import s.implicits._
      val df = T(s, dir, "orders")
        .filter($"o_orderkey" % 1000 === 0)
        .select($"o_orderkey", split($"o_orderpriority", "-").as("parts"))
      RA.unwind(df, $"parts", "part", ordinality = Some("ord"))
        .select($"o_orderkey", $"ord", $"part")
        .orderBy("o_orderkey", "ord")
    })
  )

  val oracle: Map[String, String] = Map(
    "q59_csv_source" -> s"""
      SELECT cat, count(*) AS n, floor((sum(score))*10000 + 0.5)/10000 AS total
      FROM read_csv('$csvPath',
        columns = {'id': 'BIGINT', 'name': 'VARCHAR',
                   'cat': 'VARCHAR', 'score': 'DOUBLE'}, header = true)
      WHERE score > 1.0
      GROUP BY cat ORDER BY cat""",

    "q60_math_funcs" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(ceil(l_extendedprice) AS BIGINT) AS c_ceil,
             CAST(floor(l_extendedprice) AS BIGINT) AS c_floor,
             round(l_extendedprice, 1) AS c_round,
             floor((sqrt(l_extendedprice))*1000000 + 0.5)/1000000 AS c_sqrt,
             floor((exp(l_discount))*1000000 + 0.5)/1000000 AS c_exp,
             floor((pow(l_quantity, 2.0))*1000000 + 0.5)/1000000 AS c_pow,
             floor((ln(l_extendedprice))*1000000 + 0.5)/1000000 AS c_ln,
             floor((log10(l_extendedprice))*1000000 + 0.5)/1000000 AS c_log10,
             floor((sin(l_tax))*1000000 + 0.5)/1000000 AS c_sin,
             floor((cos(l_tax))*1000000 + 0.5)/1000000 AS c_cos,
             floor((atan(l_tax))*1000000 + 0.5)/1000000 AS c_atan
      FROM lineitem WHERE l_orderkey % 100 = 0
      ORDER BY l_orderkey, l_linenumber""",

    "q61_expr_misc" -> """
      SELECT c_custkey,
             (CASE WHEN c_acctbal > 0 THEN c_mktsegment END)
               IS DISTINCT FROM 'BUILDING' AS seg_distinct,
             (CASE WHEN c_acctbal > 0 THEN c_mktsegment END)
               IS NOT DISTINCT FROM 'BUILDING' AS seg_not_distinct,
             substr(c_name, 1, 9) || 'XX' || substr(c_name, 12) AS name_overlay,
             ltrim(c_name, 'C') AS trim_leading,
             rtrim(c_name, '0123456789') AS trim_trailing,
             CAST(octet_length(encode(c_name)) AS BIGINT) AS name_bytes
      FROM customer ORDER BY c_custkey""",

    "q62_avg_distinct" -> """
      SELECT l_returnflag,
             floor((avg(DISTINCT l_quantity))*1000000 + 0.5)/1000000 AS avg_dist_qty,
             count(DISTINCT l_quantity) AS n_dist_qty,
             floor((avg(l_quantity))*1000000 + 0.5)/1000000 AS avg_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q63_unwind_ordinality" -> """
      SELECT o_orderkey,
             CAST(generate_subscripts(parts, 1) AS BIGINT) AS ord,
             unnest(parts) AS part
      FROM (SELECT o_orderkey, string_split(o_orderpriority, '-') AS parts
            FROM orders WHERE o_orderkey % 1000 = 0)
      ORDER BY o_orderkey, ord"""
  )
}
