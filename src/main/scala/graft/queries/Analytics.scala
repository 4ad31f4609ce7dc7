package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AsOfJoin
import graft.ra.Periods
import Rounding.r

/** Window functions (SURVEY.md §2.3), scalar expression surface (§2.4:
  * datetime, string, conditional, nested, period predicates) and the
  * temporal as-of operators, each with a DuckDB oracle twin.
  */
object Analytics {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // row_number / rank / dense_rank
    "q25_window_rank" -> ((s, dir) => {
      import s.implicits._
      val w1 = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
      val w2 = Window.partitionBy($"c_nationkey").orderBy(floor($"c_acctbal" / 1000).desc)
      T(s, dir, "customer").select($"c_nationkey", $"c_custkey", $"c_acctbal",
        row_number().over(w1).cast("long").as("rn"),
        rank().over(w2).cast("long").as("rnk"),
        dense_rank().over(w2).cast("long").as("drnk"))
        .orderBy("c_nationkey", "c_custkey")
    }),

    // frames: running sum, moving avg, lag/lead
    "q26_window_frames" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      T(s, dir, "orders").select($"o_custkey", $"o_orderkey", $"o_totalprice",
        r(sum($"o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running"),
        r(avg($"o_totalprice").over(w.rowsBetween(-2, Window.currentRow)), 2).as("mov_avg"),
        lag($"o_totalprice", 1).over(w).as("prev_price"),
        lead($"o_totalprice", 1).over(w).as("next_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // RANGE frames — value-based bounds with peer-group (ties included)
    // semantics, the window path ROWS frames don't exercise: sum over
    // all orders within 50000 of the current price, and the count of
    // peers at-or-below (ties counted, unlike ROWS)
    "q103_range_frames" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice")
      T(s, dir, "orders").select($"o_custkey", $"o_orderkey", $"o_totalprice",
        r(sum($"o_totalprice").over(w.rangeBetween(-50000L, 0L)), 2).as("near_sum"),
        count(lit(1)).over(w.rangeBetween(Window.unboundedPreceding, 0L))
          .as("peers_le"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // value histogram: width_bucket equi-width binning per event type —
    // the distribution-profiling aggregate (one shuffle, n_bins rows out)
    "q105_histogram" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "events")
        .filter($"value".isNotNull)
        .groupBy($"event_type",
          width_bucket($"value", lit(0.0), lit(500.0), lit(10)).as("bucket"))
        .agg(count(lit(1)).as("n"), r(avg($"value"), 4).as("avg_value"))
        .orderBy("event_type", "bucket")
    }),

    // datetime surface: extract, date_trunc, interval arithmetic, epoch
    "q27_datetime" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "orders").select($"o_orderkey",
        year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"),
        dayofmonth($"o_orderdate").cast("long").as("dy"),
        date_trunc("month", $"o_orderdate").as("mon_start"),
        ($"o_orderdate" + expr("INTERVAL 30 DAY")).as("due"),
        unix_millis($"o_orderdate".cast("timestamp")).as("ep_ms"))
        .orderBy("o_orderkey")
    }),

    // string surface: upper/lower/length/substring/position/trim/concat/like/regex
    "q28_string_funcs" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "documents").select($"doc_id",
        upper($"lang").as("lang_up"),
        length($"text").cast("long").as("n_len"),
        substring($"text", 1, 12).as("prefix"),
        locate("spark", $"text").cast("long").as("pos_spark"),
        trim($"text").as("trimmed"),
        concat($"lang", lit(":"), $"source").as("tag"),
        $"text".like("%spark%").as("has_spark"),
        $"text".rlike("^the ").as("starts_the"))
        .orderBy("doc_id")
    }),

    // conditional: CASE / coalesce / nullif / least / greatest
    "q29_case_cond" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "orders").select($"o_orderkey",
        when($"o_totalprice" > 150000, "big")
          .when($"o_totalprice" > 50000, "mid").otherwise("small").as("bucket"),
        coalesce(expr("nullif(o_orderstatus,'O')"), lit("open")).as("st"),
        least($"o_totalprice", lit(100000.0)).as("capped"),
        greatest($"o_totalprice" * 0.1, lit(5000.0)).as("fee"))
        .orderBy("o_orderkey")
    }),

    // nested types: list index/len/slice, array + struct constructors.
    // Nested OUTPUTS are serialized (array_join / to_json) because the
    // driver's pandas compare can't hash raw arrays/dicts; the nested
    // computation itself stays native.
    "q30_nested" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "documents").select($"doc_id",
        element_at(split($"text", " "), 2).as("second_word"),
        size(split($"text", " ")).cast("long").as("n_words"),
        array_join(slice(split($"text", " "), 2, 3), " ").as("mid_words"),
        array_join(array($"lang", $"source"), "|").as("pair"),
        to_json(struct($"lang".as("lang"), $"source".as("source"))).as("meta"))
        .orderBy("doc_id")
    }),

    // SQL:2011 period predicates (reference: core2 expression/temporal)
    "q31_period_predicates" -> ((s, dir) => {
      import s.implicits._
      val j = T(s, dir, "orders").join(T(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      val a = Periods.period($"o_orderdate", expr("o_orderdate + INTERVAL 30 DAY"))
      val b = Periods.period($"l_shipdate", expr("l_shipdate + INTERVAL 7 DAY"))
      j.select($"o_orderkey", $"l_linenumber",
        Periods.overlaps(a, b).as("p_overlaps"),
        Periods.contains(a, b).as("p_contains"),
        Periods.precedes(a, b).as("p_precedes"),
        Periods.succeeds(a, b).as("p_succeeds"),
        Periods.equalsP(a, b).as("p_equals"),
        Periods.immediatelyPrecedes(a, b).as("p_imm_precedes"))
        .orderBy("o_orderkey", "l_linenumber")
    }),

    // point-in-time snapshot (as-of over versioned rows; reference:
    // core2 basis / FOR SYSTEM_TIME AS OF, README.adoc:11)
    "q32_asof_snapshot" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      T(s, dir, "orders")
        .filter($"o_orderdate" <= lit("1997-01-01").cast("timestamp"))
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        .orderBy("o_custkey")
    }),

    // as-of join: each order picks the latest monthly discount rate at or
    // before its order date (union+window operator, one shuffle)
    "q33_asof_join" -> ((s, dir) => {
      import s.implicits._
      val rates = T(s, dir, "lineitem")
        .groupBy(date_trunc("month", $"l_shipdate").as("month_start"))
        .agg(r(avg($"l_discount"), 4).as("avg_disc"))
        .select($"month_start".as("_rts"), $"month_start", $"avg_disc")
      AsOfJoin.asOf(
        left = T(s, dir, "orders").select($"o_orderkey", $"o_orderdate"),
        right = rates,
        leftTs = "o_orderdate", rightTs = "_rts",
        payload = Seq("month_start", "avg_disc"))
        .select($"o_orderkey", $"o_orderdate", $"month_start", $"avg_disc")
        .orderBy("o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q25_window_rank" -> """
      SELECT c_nationkey, c_custkey, c_acctbal,
        CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn,
        CAST(rank()       OVER (PARTITION BY c_nationkey ORDER BY floor(c_acctbal/1000) DESC) AS BIGINT) AS rnk,
        CAST(dense_rank() OVER (PARTITION BY c_nationkey ORDER BY floor(c_acctbal/1000) DESC) AS BIGINT) AS drnk
      FROM customer ORDER BY c_nationkey, c_custkey""",

    // DuckDB has no width_bucket — replay the equi-width binning rule
    // (0 below range, n_bins+1 at-or-above max, else floor(v/width)+1)
    "q105_histogram" -> """
      SELECT event_type,
             CAST(CASE WHEN value < 0.0 THEN 0
                       WHEN value >= 500.0 THEN 11
                       ELSE floor(value / 50.0) + 1 END AS BIGINT) AS bucket,
             count(*) AS n,
             floor((avg(value))*10000 + 0.5)/10000 AS avg_value
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, bucket ORDER BY event_type, bucket""",

    "q103_range_frames" -> """
      SELECT o_custkey, o_orderkey, o_totalprice,
        floor((sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
              RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW))*100 + 0.5)/100 AS near_sum,
        CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peers_le
      FROM orders ORDER BY o_custkey, o_orderkey""",

    "q26_window_frames" -> """
      SELECT o_custkey, o_orderkey, o_totalprice,
        floor((sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))*100 + 0.5)/100 AS running,
        floor((avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))*100 + 0.5)/100 AS mov_avg,
        lag(o_totalprice, 1)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
      FROM orders ORDER BY o_custkey, o_orderkey""",

    "q27_datetime" -> """
      SELECT o_orderkey,
        CAST(extract(year  FROM o_orderdate) AS BIGINT) AS yr,
        CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo,
        CAST(extract(day   FROM o_orderdate) AS BIGINT) AS dy,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
        o_orderdate + INTERVAL 30 DAY AS due,
        epoch_ms(o_orderdate) AS ep_ms
      FROM orders ORDER BY o_orderkey""",

    "q28_string_funcs" -> """
      SELECT doc_id,
        upper(lang) AS lang_up,
        CAST(length(text) AS BIGINT) AS n_len,
        substring(text, 1, 12) AS prefix,
        CAST(strpos(text, 'spark') AS BIGINT) AS pos_spark,
        trim(text) AS trimmed,
        lang || ':' || source AS tag,
        text LIKE '%spark%' AS has_spark,
        regexp_matches(text, '^the ') AS starts_the
      FROM documents ORDER BY doc_id""",

    "q29_case_cond" -> """
      SELECT o_orderkey,
        CASE WHEN o_totalprice > 150000 THEN 'big'
             WHEN o_totalprice > 50000  THEN 'mid' ELSE 'small' END AS bucket,
        coalesce(nullif(o_orderstatus,'O'), 'open') AS st,
        least(o_totalprice, 100000.0) AS capped,
        greatest(o_totalprice * 0.1, 5000.0) AS fee
      FROM orders ORDER BY o_orderkey""",

    "q30_nested" -> """
      SELECT doc_id,
        string_split(text,' ')[2] AS second_word,
        CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        array_to_string(string_split(text,' ')[2:4], ' ') AS mid_words,
        array_to_string([lang, source], '|') AS pair,
        CAST(to_json({'lang': lang, 'source': source}) AS VARCHAR) AS meta
      FROM documents ORDER BY doc_id""",

    "q31_period_predicates" -> """
      SELECT o_orderkey, l_linenumber,
        (o_orderdate < l_shipdate + INTERVAL 7 DAY AND l_shipdate < o_orderdate + INTERVAL 30 DAY) AS p_overlaps,
        (o_orderdate <= l_shipdate AND o_orderdate + INTERVAL 30 DAY >= l_shipdate + INTERVAL 7 DAY) AS p_contains,
        (o_orderdate + INTERVAL 30 DAY <= l_shipdate) AS p_precedes,
        (o_orderdate >= l_shipdate + INTERVAL 7 DAY) AS p_succeeds,
        (o_orderdate = l_shipdate AND o_orderdate + INTERVAL 30 DAY = l_shipdate + INTERVAL 7 DAY) AS p_equals,
        (o_orderdate + INTERVAL 30 DAY = l_shipdate) AS p_imm_precedes
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      ORDER BY o_orderkey, l_linenumber""",

    "q32_asof_snapshot" -> """
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders WHERE o_orderdate <= TIMESTAMP '1997-01-01')
      WHERE rn = 1 ORDER BY o_custkey""",

    "q33_asof_join" -> """
      WITH rates AS (SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month_start,
                            floor((avg(l_discount))*10000 + 0.5)/10000 AS avg_disc
                     FROM lineitem GROUP BY 1)
      SELECT o_orderkey, o_orderdate, r.month_start, r.avg_disc
      FROM orders o LEFT JOIN LATERAL (
        SELECT month_start, avg_disc FROM rates
        WHERE month_start <= o.o_orderdate
        ORDER BY month_start DESC LIMIT 1) r ON TRUE
      ORDER BY o_orderkey"""
  )
}
