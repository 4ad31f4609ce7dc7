package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AsOfJoin
import graft.streaming.Streaming
import Rounding.r

/** Event-stream analytics over the `events` fixture, batch-first so every
  * operator is DuckDB-oracle-checkable (SURVEY.md §2.6): tumbling /
  * sliding / session windows, JSON extraction, and stream-to-stream as-of
  * joins. The window aggregations are built by
  * [[graft.streaming.Streaming]] — the SAME functions run these plans
  * under Structured Streaming (readStream + watermark, see
  * StreamingSpec), which is not oracle-checked.
  *
  * The reference has no streaming-SQL surface (its log is ingestion
  * infrastructure only, xtdb/core2 `core2.log`); these operators are part
  * of the north-star extension surface.
  */
object Streams {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JSON property extraction (events.props is a JSON string column)
    "q34_json_extract" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "events").select($"event_id",
        get_json_object($"props", "$.k").cast("long").as("k"),
        $"event_type")
        .orderBy("event_id")
    }),

    // tumbling 1h windows: count + sum per (window, type)
    "q35_tumbling" -> ((s, dir) => {
      import s.implicits._
      Streaming.tumblingAgg(T(s, dir, "events"), "ts", "1 hour",
          keys = Seq($"event_type"),
          aggs = Seq(count(lit(1)).as("n"), r(sum($"value"), 2).as("sum_value")))
        .select($"window.start".as("ws"), $"event_type", $"n", $"sum_value")
        .orderBy("ws", "event_type")
    }),

    // sliding 1h windows every 15min (each event lands in 4 windows)
    "q36_sliding" -> ((s, dir) => {
      import s.implicits._
      Streaming.slidingAgg(T(s, dir, "events"), "ts", "1 hour", "15 minutes",
          keys = Nil,
          aggs = Seq(count(lit(1)).as("n"), r(sum($"value"), 2).as("sum_value")))
        .select($"window.start".as("ws"), $"n", $"sum_value")
        .orderBy("ws")
    }),

    // session windows, 6h inactivity gap, per user
    "q37_session" -> ((s, dir) => {
      import s.implicits._
      Streaming.sessionAgg(T(s, dir, "events"), "ts", "6 hours",
          keys = Seq($"user_id"),
          aggs = Seq(count(lit(1)).as("n"), r(sum($"value"), 2).as("sum_value")))
        .select($"user_id", $"session_window.start".as("session_start"),
          $"n", $"sum_value")
        .orderBy("user_id", "session_start")
    }),

    // stream-to-stream as-of join: each purchase sees the user's most
    // recent error at-or-before it (keyed union+window operator: single
    // shuffle on user_id, scales with key cardinality)
    "q38_asof_event" -> ((s, dir) => {
      import s.implicits._
      val ev = T(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val errors = ev.filter($"event_type" === "error")
        .select($"user_id".as("err_user"), $"ts".as("_rts"),
          $"ts".as("err_ts"), $"value".as("err_value"))
      AsOfJoin.asOf(purchases, errors,
        leftTs = "ts", rightTs = "_rts",
        payload = Seq("err_ts", "err_value"),
        leftKeys = Seq("user_id"), rightKeys = Seq("err_user"))
        .select($"event_id", $"user_id", $"ts", $"err_ts", $"err_value")
        .orderBy("event_id")
    }),

    // conversion funnel: purchases attributed to the LAST click of the
    // same user (keyed as-of join) within a 30-minute window, counted
    // per user — the composed sequence-analytics shape (attribution,
    // sessionized conversion) on the as-of operator. Window math in
    // integer seconds for cross-engine exactness
    "q102_funnel" -> ((s, dir) => {
      import s.implicits._
      val ev = T(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id".as("cu"), $"ts".as("_rts"), $"ts".as("click_ts"))
      AsOfJoin.asOf(purchases, clicks,
          leftTs = "ts", rightTs = "_rts", payload = Seq("click_ts"),
          leftKeys = Seq("user_id"), rightKeys = Seq("cu"))
        .filter($"click_ts".isNotNull &&
          (unix_micros($"ts".cast("timestamp")) -
            unix_micros($"click_ts".cast("timestamp"))) <= 1800L * 1000000L)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_conversions"))
        .orderBy($"user_id")
    }),

    // gap-filling resample: purchase values onto a per-user 6-hour grid
    // for January 2024, last observation carried forward through empty
    // buckets (null until a user's first purchase) — the regularization
    // every event consumer does before charting/joining time series
    "q146_resample_locf" -> ((s, dir) => {
      import s.implicits._
      val purchases = T(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select($"user_id", $"ts", r($"value", 2).as("value"))
      graft.operators.TimeSeries.resampleLocf(purchases,
          keyCols = Seq("user_id"), tsCol = "ts", valueCols = Seq("value"),
          stepSeconds = 6L * 3600,
          from = lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
          to = lit("2024-01-31 00:00:00").cast("timestamp_ntz"))
        .orderBy($"user_id", $"t")
    })
  )

  val oracle: Map[String, String] = Map(
    "q34_json_extract" -> """
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, event_type
      FROM events ORDER BY event_id""",

    "q35_tumbling" -> """
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, event_type,
             count(*) AS n, floor((sum(value))*100 + 0.5)/100 AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY ws, event_type""",

    "q36_sliding" -> """
      SELECT g.ws AS ws, count(*) AS n, floor((sum(value))*100 + 0.5)/100 AS sum_value
      FROM events e
      JOIN generate_series(TIMESTAMP '2023-12-31 23:15:00',
                           TIMESTAMP '2024-02-01 00:00:00',
                           INTERVAL 15 MINUTE) g(ws)
        ON CAST(e.ts AS TIMESTAMP) >= g.ws
       AND CAST(e.ts AS TIMESTAMP) <  g.ws + INTERVAL 1 HOUR
      GROUP BY g.ws ORDER BY ws""",

    "q37_session" -> """
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      m AS (SELECT *, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 6 HOUR
                           THEN 1 ELSE 0 END AS new_s FROM e),
      s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid FROM m)
      SELECT user_id, min(ts) AS session_start, count(*) AS n,
             floor((sum(value))*100 + 0.5)/100 AS sum_value
      FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",

    "q38_asof_event" -> """
      SELECT p.event_id, p.user_id, p.ts, e.err_ts, e.err_value
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase') p
      LEFT JOIN LATERAL (
        SELECT CAST(x.ts AS TIMESTAMP) AS err_ts, x.value AS err_value
        FROM events x
        WHERE x.user_id = p.user_id AND x.event_type = 'error'
          AND CAST(x.ts AS TIMESTAMP) <= p.ts
        ORDER BY x.ts DESC LIMIT 1) e ON TRUE
      ORDER BY p.event_id""",

    "q102_funnel" -> """
      SELECT p.user_id, count(*) AS n_conversions
      FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase') p
      JOIN LATERAL (
        SELECT CAST(x.ts AS TIMESTAMP) AS click_ts
        FROM events x
        WHERE x.user_id = p.user_id AND x.event_type = 'click'
          AND CAST(x.ts AS TIMESTAMP) <= p.ts
        ORDER BY x.ts DESC LIMIT 1) c ON TRUE
      WHERE date_diff('second', c.click_ts, p.ts) <= 1800
      GROUP BY p.user_id ORDER BY p.user_id""",

    // same bucket floor (micros), same struct-max winner (latest event,
    // value breaks exact-timestamp ties), same LOCF window
    "q146_resample_locf" -> """
      WITH p0 AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                         floor(value*100 + 0.5)/100 AS value
                  FROM events WHERE event_type = 'purchase'),
      p AS (SELECT * FROM p0
            WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <  TIMESTAMP '2024-01-31 00:00:00'),
      obs AS (SELECT user_id,
                     make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS t,
                     (max({'ts': ts, 'v': value})).v AS v
              FROM p GROUP BY 1, 2),
      grid AS (SELECT u.user_id, g.t
               FROM (SELECT DISTINCT user_id FROM p0) u
               CROSS JOIN generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                          TIMESTAMP '2024-01-30 18:00:00',
                                          INTERVAL 6 HOUR) g(t))
      SELECT grid.user_id, grid.t,
             last_value(obs.v IGNORE NULLS)
               OVER (PARTITION BY grid.user_id ORDER BY grid.t
                     ROWS UNBOUNDED PRECEDING) AS value
      FROM grid LEFT JOIN obs
        ON grid.user_id = obs.user_id AND grid.t = obs.t
      ORDER BY grid.user_id, grid.t"""
  )
}
