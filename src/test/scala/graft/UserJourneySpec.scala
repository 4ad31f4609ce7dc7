package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** One continuous session exercising the surface the way a reference
  * (xtdb/core2) user actually works — each step consumes the previous
  * step's state, so this catches integration seams the per-component
  * specs can't (facade wiring, basis consistency across APIs, SQL
  * front-end against a live table). Fixture-scale data; every
  * assertion is exact.
  */
class UserJourneySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ingest -> time travel -> SQL -> period predicates -> metadata -> export") {
    val dir = java.nio.file.Files.createTempDirectory("graft_journey").toString
    val t = new GraftTable(spark, dir, Seq("price"))

    // 1. bulk-load the initial corpus as ONE tx across 4 tasks
    import graft.bitemporal.{TxLog, TxOps}
    val log = new TxLog(dir)
    log.appendBulk(TxOps.put(
      spark.range(1, 1001).select($"id", ($"id" * 1.0).as("price")),
      $"id", lit("2020-01-01").cast("timestamp"), None,
      Seq("price" -> $"price")), ts("2024-01-01 00:00:00"), partitions = 4)

    // 2. OLTP-ish tail: SQL DML — one single statement, one multi-
    //    statement atomic tx
    t.dml("prices", "UPDATE prices SET price = price * 2 WHERE _id <= 10",
      ts("2024-02-01 00:00:00"))
    t.dmlTx("prices", Seq(
      "DELETE FROM prices WHERE _id = 1",
      "INSERT INTO prices (_id, price) VALUES (2000, 42.0D)"),
      ts("2024-03-01 00:00:00"))
    t.compact()

    // 3. bases agree across APIs: current(), entity(), SQL, asOf
    assert(t.current().count() == 1000) // 1000 - deleted 1 + inserted 2000
    assert(t.entity(5L).map(_.getAs[Double]("price")).contains(10.0))
    assert(t.entity(1L).isEmpty)
    assert(t.entity(2000L).map(_.getAs[Double]("price")).contains(42.0))

    val asOfFeb = t.asOf(ts("2024-02-15 00:00:00"), ts("2024-02-15 00:00:00"))
    assert(asOfFeb.filter($"_id" === 1).select("price")
      .as[Double].head() == 2.0) // doubled, not yet deleted

    // 4. temporal SQL with clauses AND period predicates over the table
    val viaSql = t.sql("prices",
      """SELECT _id, price FROM prices
         FOR SYSTEM_TIME AS OF '2024-02-15 00:00:00' WHERE _id <= 3
         ORDER BY _id""").collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(viaSql.toSeq == Seq(1L -> 2.0, 2L -> 4.0, 3L -> 6.0))

    val history = t.sql("prices",
      """SELECT count(*) AS n FROM prices
         FOR ALL SYSTEM_TIME FOR ALL APPLICATION_TIME
         WHERE prices.SYSTEM_TIME CONTAINS TIMESTAMP '2024-02-15 00:00:00'
           AND _id = 1""").head().getLong(0)
    // the Feb-1 update SPLIT id 1's validity: the belief held on Feb 15
    // is two rectangles — valid [2020, Feb 1) at the original price and
    // [Feb 1, ∞) doubled
    assert(history == 2, s"expected the split pair at the Feb basis, got $history")

    // 5. the metadata relation sees the compacted base and the log tail
    val meta = t.metadata()
    // every _id chunk is point-skippable: bloom, or full dictionary
    // encoding (parquet omits the bloom there — the dictionary already
    // filters exactly)
    assert(meta.filter($"column" === "_id" &&
      !$"has_bloom" && !$"dict_encoded").count() == 0)
    assert(meta.filter($"file".contains("/base/")).count() > 0)

    // 6. export the full history as arrow chunks and read them back
    val outDir = java.nio.file.Files.createTempDirectory("journey_arrow").toString
    val paths = t.exportArrowChunks(outDir)
    val back = graft.sources.ArrowSource.read(spark, paths)
    assert(back.count() == t.rectangles().count())

    // 7. the write side is safe against races and bad transactions:
    //    a tx with overlapping writes on one id fails BEFORE being
    //    acknowledged, leaving the table exactly as it was
    val before = t.current().count()
    intercept[IllegalArgumentException] {
      t.dmlTx("prices", Seq(
        "UPDATE prices SET price = CAST(1.0 AS DOUBLE) WHERE _id = 5",
        "UPDATE prices SET price = CAST(2.0 AS DOUBLE) WHERE _id = 5"),
        ts("2024-04-01 00:00:00"))
    }
    assert(t.current().count() == before)

    // 8. native Spark time-travel spelling over the same table (plan-
    //    level resolution — no graft text rewrite involved)
    val nativeTT = t.sql("prices",
      """SELECT price FROM prices TIMESTAMP AS OF '2024-02-15 00:00:00'
         WHERE _id = 1""").head().getDouble(0)
    assert(nativeTT == 2.0)

    // 9. a recursive UNION-distinct closure over data DERIVED from the
    //    table — the SQL spelling Spark alone rejects
    t.current().select(($"_id" % 5).as("src"), (($"_id" + 1) % 5).as("dst"))
      .distinct().createOrReplaceTempView("journey_edges")
    val reach = graft.ra.RecursiveSql.sql(spark, """
      WITH RECURSIVE r(node) AS (
        SELECT CAST(0 AS BIGINT)
        UNION
        SELECT e.dst FROM r JOIN journey_edges e ON e.src = r.node)
      SELECT count(*) AS n FROM r""").head().getLong(0)
    assert(reach == 5) // the 0→1→2→3→4→0 cycle closes, and terminates
    spark.catalog.dropTempView("journey_edges")
  }
}
