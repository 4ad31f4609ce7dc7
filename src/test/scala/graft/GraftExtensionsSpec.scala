package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The config-only deployment path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` resolves the custom
  * expressions in plain SQL with no graft code touched first.
  *
  * Needs its own SparkContext (extensions bind at context/session
  * creation), so any shared session is stopped first; TestSpark
  * re-creates lazily for later suites (suites run sequentially). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions wires the custom functions into bare SQL") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                  sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS n,
                  sorted_last_leq(array(named_struct('t', 1L), named_struct('t', 5L)), 3L) AS i
        """).collect()(0)
      assert(r.getDouble(0) == 11.0)
      assert(r.getInt(1) == 2)
      assert(r.getInt(2) == 1)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("aggregate navigation rides the PARSER path: bare spark.sql over " +
      "a registered table serves the trusted view's state, and the " +
      "kill switch restores the base plan on the same session") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-nav-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ext_nav").toString
    val t = new graft.GraftTable(spark, dir, Seq("grp", "amt"))
    graft.server.GraftServer.register("extnav_t", t)
    def scansMatview(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources
            .LogicalRelation => r.relation
      }.exists {
        case h: org.apache.spark.sql.execution.datasources
            .HadoopFsRelation =>
          h.location.rootPaths.exists(_.toString.contains("matview"))
        case _ => false
      }
    try {
      t.put(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
          .toDF("id", "g", "m"), $"id",
        lit("2020-01-01").cast("timestamp"), None,
        Seq("grp" -> $"g", "amt" -> $"m"),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      // the DDL itself rides the parser (no GraftSql object in sight —
      // this is the config-only deployment the spec exists for)
      spark.sql("CREATE MATERIALIZED VIEW extnav_v WITH " +
        "(valid_at = '2030-01-01 00:00:00', buckets = 2, " +
        "rewrite = 'trusted') AS " +
        "SELECT grp, COUNT(*) AS n, SUM(amt) AS s FROM extnav_t " +
        "GROUP BY grp").collect()
      val q = "SELECT grp, COUNT(*) AS n, SUM(amt) AS s FROM extnav_t " +
        "GROUP BY grp ORDER BY grp"
      val nav = spark.sql(q)
      assert(scansMatview(nav),
        "bare spark.sql must navigate onto the view state:\n" +
          nav.queryExecution.optimizedPlan.toString.take(1200))
      val navRows = nav.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      // same session, kill switch → the base plan (BitemporalSql path)
      spark.conf.set("spark.graft.matview.rewrite", "false")
      val base = spark.sql(q)
      assert(!scansMatview(base))
      val baseRows = base.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(navRows == baseRows, s"$navRows vs $baseRows")
      assert(navRows == Seq(("a", 2L, 30L), ("b", 1L, 5L)))
      spark.sql("DROP MATERIALIZED VIEW extnav_v").collect()
    } finally {
      graft.server.GraftServer.unregister("extnav_t")
      graft.server.GraftMatviews.reset()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
