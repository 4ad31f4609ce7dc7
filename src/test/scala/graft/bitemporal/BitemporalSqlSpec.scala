package graft.bitemporal

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** FOR SYSTEM_TIME / FOR APPLICATION_TIME SQL sugar vs the Column-API
  * basis filters. */
class BitemporalSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = Timestamp.from(Instant.ofEpochSecond(sec))

  private val opSchema = StructType(Seq(
    StructField("_op", StringType), StructField("_id", LongType),
    StructField("_tx_id", LongType), StructField("_system_from", TimestampType),
    StructField("_valid_from", TimestampType), StructField("_valid_to", TimestampType),
    StructField("price", DoubleType)))

  private lazy val rects = {
    val ops = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("put", 1L, 0L, ts(100), ts(0), null, 10.0),
      Row("put", 1L, 1L, ts(200), ts(50), null, 20.0),
      Row("put", 2L, 2L, ts(150), ts(0), null, 99.0)), 1), opSchema)
    Bitemporal.fold(ops, Seq("price"))
  }

  test("both clauses, either order, match the Column-API asOf") {
    val apiRows = Bitemporal.asOf(rects,
        validTime = lit(ts(10)), systemTime = lit(ts(250)))
      .select(col("_id"), col("price"))
      .collect().map(_.toSeq).toSet

    val sysFirst = BitemporalSql.sql(spark,
      s"""SELECT _id, price FROM prices
          FOR SYSTEM_TIME AS OF '${ts(250)}'
          FOR APPLICATION_TIME AS OF '${ts(10)}'""",
      Map("prices" -> rects)).collect().map(_.toSeq).toSet
    assert(sysFirst == apiRows)

    val appFirst = BitemporalSql.sql(spark,
      s"""SELECT _id, price FROM prices
          FOR APPLICATION_TIME AS OF '${ts(10)}'
          FOR SYSTEM_TIME AS OF '${ts(250)}'""",
      Map("prices" -> rects)).collect().map(_.toSeq).toSet
    assert(appFirst == apiRows)

    // at system time 250 both ids are visible; id 1's valid-time point 10
    // is the first put's remnant [0, 50)
    assert(apiRows == Set(Seq(1L, 10.0), Seq(2L, 99.0)))
  }

  test("single clause defaults the other to now; no clause = current state") {
    val one = BitemporalSql.sql(spark,
      s"SELECT _id, price FROM prices FOR SYSTEM_TIME AS OF '${ts(120)}' ORDER BY _id",
      Map("prices" -> rects)).collect().map(_.toSeq).toSeq
    // system 120: only the first put exists; valid defaults to NOW which
    // its [0, inf) interval covers
    assert(one == Seq(Seq(1L, 10.0)))

    val current = BitemporalSql.sql(spark,
      "SELECT _id, price FROM prices ORDER BY _id",
      Map("prices" -> rects)).collect().map(_.toSeq).toSeq
    // now: id1's latest version covers now from valid 50 on; id2 visible
    assert(current == Seq(Seq(1L, 20.0), Seq(2L, 99.0)))
  }

  test("same table with AND without a clause in one query") {
    val out = BitemporalSql.sql(spark,
      s"""SELECT old._id, old.price AS old_price, cur.price AS cur_price
          FROM prices FOR SYSTEM_TIME AS OF '${ts(120)}' old
          JOIN prices cur ON old._id = cur._id""",
      Map("prices" -> rects)).collect()
    // at sys 120 only id1's first put exists (price 10); current state
    // has id1 -> 20
    assert(out.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet ==
      Set((1L, 10.0, 20.0)))
    // and the temp views were dropped afterward
    assert(!spark.catalog.tableExists("prices"))
  }

  test("FROM..TO / BETWEEN..AND ranges and FOR ALL history") {
    // system-time range [120, 200): only the first put's system interval
    // [100, 200) overlaps; FOR ALL APPLICATION_TIME keeps all its
    // valid-time versions (just the one rectangle here)
    val fromTo = BitemporalSql.sql(spark,
      s"""SELECT _id, price FROM prices
          FOR SYSTEM_TIME FROM '${ts(120)}' TO '${ts(200)}'
          FOR ALL APPLICATION_TIME""",
      Map("prices" -> rects)).collect().map(_.toSeq).toSet
    assert(fromTo == Set(Seq(1L, 10.0), Seq(2L, 99.0)))

    // FROM..TO end is exclusive: a rectangle starting exactly at the end
    // bound is out; BETWEEN..AND includes it
    val exclusive = BitemporalSql.sql(spark,
      s"""SELECT DISTINCT price FROM prices
          FOR SYSTEM_TIME FROM '${ts(0)}' TO '${ts(200)}'
          FOR ALL APPLICATION_TIME""",
      Map("prices" -> rects)).collect().map(_.getDouble(0)).toSet
    assert(exclusive == Set(10.0, 99.0))
    val inclusive = BitemporalSql.sql(spark,
      s"""SELECT DISTINCT price FROM prices
          FOR SYSTEM_TIME BETWEEN '${ts(0)}' AND '${ts(200)}'
          FOR ALL APPLICATION_TIME""",
      Map("prices" -> rects)).collect().map(_.getDouble(0)).toSet
    assert(inclusive == Set(10.0, 20.0, 99.0))

    // full history: every rectangle of every id, both spellings of ALL
    val all = BitemporalSql.sql(spark,
      """SELECT count(*) AS n FROM prices
         FOR ALL SYSTEM_TIME FOR ALL APPLICATION_TIME""",
      Map("prices" -> rects)).collect()(0).getLong(0)
    val allPostfix = BitemporalSql.sql(spark,
      """SELECT count(*) AS n FROM prices
         FOR SYSTEM_TIME ALL FOR APPLICATION_TIME ALL""",
      Map("prices" -> rects)).collect()(0).getLong(0)
    assert(all == rects.count() && allPostfix == all)
  }

  test("period predicates in SQL text match the Periods Column algebra") {
    import graft.ra.Periods
    // CONTAINS a point, on the valid dimension, over full history
    val viaSql = BitemporalSql.sql(spark,
      s"""SELECT _id, price FROM prices
          FOR ALL SYSTEM_TIME FOR ALL APPLICATION_TIME
          WHERE prices.APPLICATION_TIME CONTAINS TIMESTAMP '${ts(60)}'
            AND prices.SYSTEM_TIME OVERLAPS
                PERIOD(TIMESTAMP '${ts(150)}', TIMESTAMP '${ts(250)}')""",
      Map("prices" -> rects)).collect().map(_.toSeq).toSet
    val viaApi = rects.filter(
        Periods.containsTs(
          Periods.period(col("_valid_from"), col("_valid_to")), lit(ts(60))) &&
        Periods.overlaps(
          Periods.period(col("_system_from"), col("_system_to")),
          Periods.period(lit(ts(150)), lit(ts(250)))))
      .select(col("_id"), col("price")).collect().map(_.toSeq).toSet
    assert(viaSql == viaApi && viaSql.nonEmpty)

    // a period predicate inside a string literal is data, not syntax
    val literal = BitemporalSql.sql(spark,
      """SELECT 'prices.APPLICATION_TIME CONTAINS TIMESTAMP ''x''' AS s
         FROM prices""",
      Map("prices" -> rects)).collect()(0).getString(0)
    assert(literal == "prices.APPLICATION_TIME CONTAINS TIMESTAMP 'x'")
  }

  test("aggregation over a time-travel view") {
    val out = BitemporalSql.sql(spark,
      s"""SELECT count(*) AS n, sum(price) AS total
          FROM prices FOR SYSTEM_TIME AS OF '${ts(250)}'
               FOR APPLICATION_TIME AS OF '${ts(60)}'""",
      Map("prices" -> rects)).collect()(0)
    // valid 60 as of sys 250: id1 -> 20.0 (second put), id2 -> 99.0
    assert(out.getLong(0) == 2 && out.getDouble(1) == 119.0)
  }

  test("table name inside a string literal is not rewritten") {
    // the old \b-regex rewrite would mangle 'prices went up' / 'prices';
    // plan-level splicing leaves literals alone by construction
    val out = BitemporalSql.sql(spark,
      """SELECT _id, concat('prices went up: ', CAST(price AS STRING)) AS msg
         FROM prices WHERE 'prices' = 'prices' ORDER BY _id""",
      Map("prices" -> rects)).collect()
    assert(out.length == 2)
    assert(out(0).getString(1) == "prices went up: 20.0") // current basis
  }

  test("a column named like the table is not rewritten") {
    import spark.implicits._
    val ops = Seq((1L, 5.0)).toDF("_id", "stock")
      .select(lit("put").as("_op"), col("_id"), lit(0L).as("_tx_id"),
        lit(ts(10)).as("_system_from"), lit(ts(0)).as("_valid_from"),
        lit(null).cast("timestamp").as("_valid_to"), col("stock"))
    val stockRects = Bitemporal.fold(ops, Seq("stock"))
    // the relation AND one of its columns are both named `stock`
    val out = BitemporalSql.sql(spark,
      "SELECT stock FROM stock WHERE stock > 1.0",
      Map("stock" -> stockRects)).collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(5.0))
  }

  test("qualified column references keep working (alias = table name)") {
    val out = BitemporalSql.sql(spark,
      s"""SELECT prices._id, prices.price
          FROM prices WHERE prices.price > 15.0 ORDER BY prices._id""",
      Map("prices" -> rects)).collect().map(_.toSeq).toSeq
    assert(out == Seq(Seq(1L, 20.0), Seq(2L, 99.0)))
  }

  test("a 1-clause reference that prefixes a 2-clause reference survives") {
    // both reference `prices` with the SAME first clause text; the
    // shorter match must not text-replace inside the longer one (which
    // would leave a dangling `FOR APPLICATION_TIME ALL` fragment)
    val out = BitemporalSql.sql(spark,
      s"""SELECT a._id, a.price AS cur_p, count(b.price) AS n_hist
          FROM prices FOR SYSTEM_TIME AS OF '${ts(250)}' a
          JOIN prices FOR SYSTEM_TIME AS OF '${ts(250)}' FOR APPLICATION_TIME ALL b
            ON a._id = b._id
          GROUP BY a._id, a.price ORDER BY a._id""",
      Map("prices" -> rects)).collect()
    // at sys 250: a sees the current-valid rows (id1 -> 20, id2 -> 99);
    // b sees ALL valid-time rectangles (id1 has 2: [0,50) and [50,inf))
    assert(out.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq((1L, 20.0, 2L), (2L, 99.0, 1L)))
  }

  test("temporal table inside an expression subquery is substituted") {
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("graft_sql_probe")
    try {
      val out = BitemporalSql.sql(spark,
        """SELECT k FROM graft_sql_probe
           WHERE k IN (SELECT _id FROM prices) ORDER BY k""",
        Map("prices" -> rects)).collect().map(_.getLong(0)).toSeq
      assert(out == Seq(1L, 2L))
    } finally spark.catalog.dropTempView("graft_sql_probe")
  }

  test("a pre-existing session temp view sharing the table name survives") {
    import spark.implicits._
    // a user view named `prices` exists BEFORE the temporal query runs;
    // the bare-reference rewrite must not clobber or delete it
    Seq((42, "mine")).toDF("a", "b").createOrReplaceTempView("prices")
    try {
      val n = BitemporalSql.sql(spark,
        "SELECT count(*) AS n FROM prices", Map("prices" -> rects))
        .collect()(0).getLong(0)
      assert(n == 2) // the TEMPORAL table was queried (current state)
      // ...and the user's view is untouched afterwards
      val mine = spark.sql("SELECT b FROM prices").collect()(0).getString(0)
      assert(mine == "mine")
    } finally spark.catalog.dropTempView("prices")
  }

  test("a user CTE shadows a registered table of the same name") {
    // WITH prices AS (...) must resolve to the CTE, not the rectangle
    // table — plan-level splice runs pre-analysis, so the shadowing is
    // tracked scope-wise by hand
    val out = BitemporalSql.sql(spark,
      """WITH prices AS (SELECT 7 AS seven)
         SELECT seven FROM prices""",
      Map("prices" -> rects)).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(7))

    // ...but OUTSIDE the WITH scope (a sibling subquery under a UNION
    // with its own WITH) the registered table still resolves; and a CTE
    // may itself read the registered table under a DIFFERENT name
    val mixed = BitemporalSql.sql(spark,
      """WITH mine AS (SELECT count(*) AS n FROM prices)
         SELECT n FROM mine""",
      Map("prices" -> rects)).collect()
    assert(mixed.map(_.getLong(0)).toSeq == Seq(2L)) // current state rows
  }

  test("temporal clause inside a string literal is not rewritten") {
    val out = BitemporalSql.sql(spark,
      s"""SELECT 'prices FOR SYSTEM_TIME AS OF ''2020-01-01''' AS s,
                 count(*) AS n
          FROM prices FOR SYSTEM_TIME AS OF '${ts(250)}'
          GROUP BY s""",
      Map("prices" -> rects)).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "prices FOR SYSTEM_TIME AS OF '2020-01-01'")
    assert(out(0).getLong(1) == 2L) // the REAL clause still applied
  }

  test("comments with apostrophes don't derail the clause rewrite") {
    // the old per-file literal scanner had no comment lexing: the
    // apostrophe in `don't` opened a phantom string span that swallowed
    // the REAL clause after it, silently serving the current basis
    val out = BitemporalSql.sql(spark,
      s"""SELECT _id, price -- don't travel? yes, travel
          FROM prices FOR SYSTEM_TIME AS OF '${ts(120)}'
          /* block comment, can't break it,
             /* nested as Spark allows */ still inside */
          ORDER BY _id""",
      Map("prices" -> rects)).collect().map(_.toSeq).toSeq
    assert(out == Seq(Seq(1L, 10.0))) // the ts(120) clause DID apply
  }

  test("a clause spelled inside a comment is never applied") {
    val out = BitemporalSql.sql(spark,
      s"""SELECT _id, price
          FROM prices
          -- FOR SYSTEM_TIME AS OF '${ts(120)}'
          ORDER BY _id""",
      Map("prices" -> rects)).collect().map(_.toSeq).toSeq
    // commented clause ignored: CURRENT basis (both ids, id1 at 20)
    assert(out == Seq(Seq(1L, 20.0), Seq(2L, 99.0)))
  }

  test("native TIMESTAMP AS OF spelling resolves at the plan level") {
    // Spark's own time-travel grammar (no graft text rewrite involved:
    // the parser produces RelationTimeTravel, splice resolves it) —
    // system time as of ts, valid time current, same defaulting as the
    // SQL:2011 spelling
    val out = BitemporalSql.sql(spark,
      s"SELECT _id, price FROM prices TIMESTAMP AS OF '${ts(120)}' ORDER BY _id",
      Map("prices" -> rects)).collect().map(_.toSeq).toSeq
    assert(out == Seq(Seq(1L, 10.0)))

    // and a CTE of the same name still shadows it
    val shadowed = BitemporalSql.sql(spark,
      s"""WITH prices AS (SELECT 7 AS seven)
          SELECT seven FROM prices""",
      Map("prices" -> rects)).collect()
    assert(shadowed.map(_.getInt(0)).toSeq == Seq(7))
  }

  test("temporal clause inside a nested CTE body is rewritten") {
    val out = BitemporalSql.sql(spark,
      s"""WITH outer_cte AS (
            WITH inner_cte AS (
              SELECT _id, price
              FROM prices FOR SYSTEM_TIME AS OF '${ts(120)}')
            SELECT * FROM inner_cte)
          SELECT _id, price FROM outer_cte ORDER BY _id""",
      Map("prices" -> rects)).collect().map(_.toSeq).toSeq
    assert(out == Seq(Seq(1L, 10.0)))
  }
}
