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
}
