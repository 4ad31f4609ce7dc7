package graft.ra

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** WITH RECURSIVE … UNION (distinct) through the plan-level fixpoint
  * bridge — the spelling Spark's own analyzer rejects. */
class RecursiveSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("UNION-distinct recursion terminates on a CYCLE") {
    // 0→1→2→0: UNION ALL would never converge; distinct recursion
    // closes in 3 steps
    Seq((0, 1), (1, 2), (2, 0)).toDF("src", "dst")
      .createOrReplaceTempView("cyc_edges")
    val out = RecursiveSql.sql(spark, """
      WITH RECURSIVE reach(node) AS (
        SELECT 0
        UNION
        SELECT e.dst FROM reach r JOIN cyc_edges e ON e.src = r.node)
      SELECT node FROM reach ORDER BY node""")
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, 1, 2))
    spark.catalog.dropTempView("cyc_edges")
  }

  test("sibling CTEs inline; spark's native analyzer would reject this text") {
    Seq((0, 5), (5, 10), (10, 0)).toDF("s", "d")
      .createOrReplaceTempView("cyc2_edges")
    val q = """
      WITH RECURSIVE
      e2 AS (SELECT s, d FROM cyc2_edges),
      reach(node) AS (
        SELECT 0
        UNION
        SELECT e.d FROM reach r JOIN e2 e ON e.s = r.node)
      SELECT count(*) AS n FROM reach"""
    // Spark itself rejects the UNION-distinct spelling…
    val err = intercept[Exception](spark.sql(q).collect())
    assert(err.getMessage.contains("RECURSIVE"), err.getMessage)
    // …the bridge runs it
    assert(RecursiveSql.sql(spark, q).collect().head.getLong(0) == 3L)
    spark.catalog.dropTempView("cyc2_edges")
  }

  test("UNION ALL recursion (acyclic) delegates to Spark's native loop") {
    val out = RecursiveSql.sql(spark, """
      WITH RECURSIVE r(n) AS (
        SELECT 1
        UNION ALL
        SELECT n + 1 FROM r WHERE n < 4)
      SELECT n FROM r ORDER BY n""")
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(1, 2, 3, 4))
  }

  test("plain non-recursive SQL passes through") {
    assert(RecursiveSql.sql(spark,
      "WITH t AS (SELECT 42 AS x) SELECT x FROM t")
      .collect().head.getInt(0) == 42)
    assert(RecursiveSql.sql(spark, "SELECT 7 AS x")
      .collect().head.getInt(0) == 7)
  }

  test("non-linear distinct recursion is rejected loudly") {
    val err = intercept[IllegalArgumentException] {
      RecursiveSql.sql(spark, """
        WITH RECURSIVE r(n) AS (
          SELECT 1
          UNION
          SELECT a.n + b.n FROM r a JOIN r b ON a.n = b.n WHERE a.n < 0)
        SELECT n FROM r""").collect()
    }
    assert(err.getMessage.contains("recursive"))
  }
}
