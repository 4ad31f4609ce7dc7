package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase attribution for the heaviest sf10 storage-family entries
  * (VERDICT r14 task 4): q166/q167/q168 measure ×15.5–16.8 at ×100
  * data where their siblings sit at ×2.4–×10 — BASELINE.md says "bulk
  * puts + CREATE-populate dominate" but no per-phase breakdown exists.
  * This probe replays each query's EXACT story with a wall clock
  * around every phase:
  *
  *   put      — the bulk put(s) of the base fixture (dim included)
  *   create   — CREATE MATERIALIZED VIEW (populating first build)
  *   mutate   — the mutation puts/deletes (the "tail" txs)
  *   refresh  — REFRESH MATERIALIZED VIEW (the incremental fold)
  *   serve    — the final SELECT over the view
  *
  * Run at sf0.1 and sf10 and compare per-phase ratios: a refresh-side
  * phase growing super-linearly is a bug to fix; put/create growing
  * with the data volume is the cost model to record.
  *
  * Usage: `runMain graft.tools.MvPhaseProbe <sfDir> [q166,q167,q168]`
  * Prints ONE JSON line with per-query per-phase seconds.
  */
object MvPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val subset: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet
      else Set("q166", "q167", "q168")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def sql(s: String): DataFrame = graft.server.GraftSql.sql(spark, s)
    val results =
      scala.collection.mutable.LinkedHashMap
        .empty[String, Seq[(String, Double)]]

    def probe(name: String)(phases: (String, () => Unit)*): Unit = {
      if (!subset.contains(name)) return
      graft.server.GraftMatviews.reset()
      val timed = phases.map { case (pn, body) =>
        val t0 = System.nanoTime()
        body()
        pn -> (System.nanoTime() - t0) / 1e9
      }
      results(name) = timed :+ ("total" -> timed.map(_._2).sum)
    }

    val work =
      java.nio.file.Files.createTempDirectory("graft_mvphase").toString

    // ---- q166: join view, multi-col group + HAVING --------------------
    locally {
      val fact = new graft.GraftTable(spark, s"$work/f166",
        Seq("cust", "prio", "amt"))
      val dim = new graft.GraftTable(spark, s"$work/d166", Seq("region"))
      graft.server.GraftServer.register("mvmg_orders", fact)
      graft.server.GraftServer.register("mvmg_cust", dim)
      val cust = graft.Tables.load(spark, sfDir, "customer")
        .select($"c_custkey".as("id"), $"c_nationkey".cast("string").as("rg"))
      val ord = graft.Tables.load(spark, sfDir, "orders")
        .select($"o_orderkey".as("id"), $"o_custkey".cast("long").as("ck"),
          $"o_orderpriority".as("pr"),
          $"o_totalprice".cast("decimal(14,2)").as("m"))
      probe("q166")(
        "put" -> (() => {
          dim.put(cust, $"id", lit("2000-01-01").cast("timestamp"), None,
            Seq("region" -> $"rg"), ts("2020-01-01 00:00:00"))
          fact.put(ord, $"id", lit("2000-01-01").cast("timestamp"), None,
            Seq("cust" -> $"ck", "prio" -> $"pr", "amt" -> $"m"),
            ts("2020-01-01 00:00:01"))
        }),
        "create" -> (() => {
          sql("CREATE MATERIALIZED VIEW mvmg_by_rp WITH " +
            "(valid_at = '2030-01-01 00:00:00', buckets = 16) AS " +
            "SELECT region, prio, COUNT(*) AS n, SUM(amt) AS sum_amt " +
            "FROM mvmg_orders JOIN mvmg_cust ON cust = mvmg_cust._id " +
            "WHERE amt > 50000 GROUP BY region, prio HAVING n > 50"): Unit
        }),
        "mutate" -> (() => {
          fact.put(ord.filter($"id" % 20 === 0)
              .withColumn("m2", ($"m" + 100000).cast("decimal(14,2)")),
            $"id", lit("2000-06-01").cast("timestamp"), None,
            Seq("cust" -> $"ck", "prio" -> $"pr", "amt" -> $"m2"),
            ts("2020-01-02 00:00:00"))
          fact.delete(ord.filter($"id" % 31 === 0), $"id",
            lit("2000-01-01").cast("timestamp"), None,
            Seq("cust" -> lit(null).cast("long"),
              "prio" -> lit(null).cast("string"),
              "amt" -> lit(null).cast("decimal(14,2)")),
            ts("2020-01-02 00:00:01"))
          dim.put(cust.filter($"id" % 10 === 0)
              .withColumn("rg2", lit("99")),
            $"id", lit("2000-01-01").cast("timestamp"), None,
            Seq("region" -> $"rg2"), ts("2020-01-02 00:00:02"))
        }),
        "refresh" -> (() =>
          sql("REFRESH MATERIALIZED VIEW mvmg_by_rp").collect(): Unit),
        "serve" -> (() =>
          sql("SELECT region, prio, n, CAST(sum_amt AS DOUBLE) AS sum_amt " +
            "FROM mvmg_by_rp ORDER BY region, prio").collect(): Unit))
      graft.server.GraftServer.unregister("mvmg_orders")
      graft.server.GraftServer.unregister("mvmg_cust")
    }

    // ---- q167: expression aggregates (rev = price * (1 - disc)) -------
    locally {
      val t = new graft.GraftTable(spark, s"$work/t167",
        Seq("status", "prio", "price", "disc"))
      graft.server.GraftServer.register("mvex_ord", t)
      val ord = graft.Tables.load(spark, sfDir, "orders").select(
        $"o_orderkey".cast("long").as("id"),
        $"o_orderstatus".as("st"), $"o_orderpriority".as("pr"),
        $"o_totalprice".cast("decimal(12,2)").as("p"),
        (($"o_orderkey" % 10).cast("double") / 100.0)
          .cast("decimal(12,2)").as("d"))
      probe("q167")(
        "put" -> (() =>
          t.put(ord, $"id", lit("2000-01-01").cast("timestamp"), None,
            Seq("status" -> $"st", "prio" -> $"pr", "price" -> $"p",
              "disc" -> $"d"),
            ts("2020-01-01 00:00:00"))),
        "create" -> (() => {
          sql("CREATE MATERIALIZED VIEW mvex_rev WITH " +
            "(valid_at = '2030-01-01 00:00:00', buckets = 16) AS " +
            "SELECT status, prio, COUNT(*) AS n, " +
            "SUM(price * (1 - disc)) AS rev, " +
            "AVG(price * (1 - disc)) AS avg_rev, " +
            "MAX(price * (1 - disc)) AS max_rev " +
            "FROM mvex_ord WHERE price > 1000 GROUP BY status, prio"): Unit
        }),
        "mutate" -> (() => {
          t.put(ord.filter($"id" % 7 === 0)
              .withColumn("p2", ($"p" + 1000).cast("decimal(12,2)")),
            $"id", lit("2000-06-01").cast("timestamp"), None,
            Seq("status" -> $"st", "prio" -> $"pr", "price" -> $"p2",
              "disc" -> $"d"),
            ts("2020-01-02 00:00:00"))
          t.delete(ord.filter($"id" % 11 === 0), $"id",
            lit("2000-01-01").cast("timestamp"), None,
            Seq("status" -> lit(null).cast("string"),
              "prio" -> lit(null).cast("string"),
              "price" -> lit(null).cast("decimal(12,2)"),
              "disc" -> lit(null).cast("decimal(12,2)")),
            ts("2020-01-02 00:00:01"))
        }),
        "refresh" -> (() =>
          sql("REFRESH MATERIALIZED VIEW mvex_rev").collect(): Unit),
        "serve" -> (() =>
          sql("SELECT status, prio, n, CAST(rev AS DOUBLE) AS rev, " +
            "avg_rev, CAST(max_rev AS DOUBLE) AS max_rev " +
            "FROM mvex_rev ORDER BY status, prio").collect(): Unit))
      graft.server.GraftServer.unregister("mvex_ord")
    }

    // ---- q168: date_trunc month rollup ---------------------------------
    locally {
      val t = new graft.GraftTable(spark, s"$work/t168", Seq("od", "price"))
      graft.server.GraftServer.register("mvgb_ord", t)
      val ord = graft.Tables.load(spark, sfDir, "orders").select(
        $"o_orderkey".cast("long").as("id"),
        $"o_orderdate".cast("timestamp").as("odv"),
        $"o_totalprice".cast("decimal(12,2)").as("p"))
      probe("q168")(
        "put" -> (() =>
          t.put(ord, $"id", lit("2000-01-01").cast("timestamp"), None,
            Seq("od" -> $"odv", "price" -> $"p"),
            ts("2020-01-01 00:00:00"))),
        "create" -> (() => {
          sql("CREATE MATERIALIZED VIEW mvgb_by_month WITH " +
            "(valid_at = '2030-01-01 00:00:00', buckets = 16) AS " +
            "SELECT date_trunc('month', od) AS m, COUNT(*) AS n, " +
            "SUM(price) AS total, MAX(price) AS mx " +
            "FROM mvgb_ord WHERE price > 5000 " +
            "GROUP BY date_trunc('month', od)"): Unit
        }),
        "mutate" -> (() => {
          t.put(ord.filter($"id" % 7 === 0)
              .withColumn("p2", ($"p" + 1000).cast("decimal(12,2)")),
            $"id", lit("2000-06-01").cast("timestamp"), None,
            Seq("od" -> $"odv", "price" -> $"p2"),
            ts("2020-01-02 00:00:00"))
          t.delete(ord.filter($"id" % 11 === 0), $"id",
            lit("2000-01-01").cast("timestamp"), None,
            Seq("od" -> lit(null).cast("timestamp"),
              "price" -> lit(null).cast("decimal(12,2)")),
            ts("2020-01-02 00:00:01"))
        }),
        "refresh" -> (() =>
          sql("REFRESH MATERIALIZED VIEW mvgb_by_month").collect(): Unit),
        "serve" -> (() =>
          sql("SELECT CAST(CAST(m AS DATE) AS STRING) AS m, n, " +
            "CAST(total AS DOUBLE) AS total, " +
            "CAST(mx AS DOUBLE) AS mx FROM mvgb_by_month ORDER BY m")
            .collect(): Unit))
      graft.server.GraftServer.unregister("mvgb_ord")
    }

    val json = results.map { case (q, ps) =>
      "\"" + q + "\":{" +
        ps.map { case (p, s) => f""""$p":$s%.3f""" }.mkString(",") + "}"
    }.mkString(",")
    // single greppable line, same convention as Bench
    println(s"""{"metric":"mv_phases","sf":"$sfDir","queries":{$json}}""")
    graft.server.GraftMatviews.reset()
    spark.stop()
  }
}
