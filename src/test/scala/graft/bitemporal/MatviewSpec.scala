package graft.bitemporal

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftTable, TestSpark}

/** Incremental matview: every refresh must land on exactly the state a
  * from-scratch recompute would produce (parity), while rewriting only
  * the buckets whose groups changed (incrementality). */
class MatviewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val validAt = ts("2030-01-01 00:00:00")

  private def freshTable(): (GraftTable, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv").toString
    (new GraftTable(spark, dir, Seq("grp", "amt")), dir)
  }

  /** Ground truth: full recompute of the view from the table. */
  private def recompute(t: GraftTable): Map[String, (Long, java.math.BigDecimal)] =
    Bitemporal.asOf(t.rectangles(), lit(validAt), lit(ts("9998-01-01 00:00:00")))
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"amt").as("s"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2)))
      .toMap

  private def viewState(mv: Matview): Map[String, (Long, java.math.BigDecimal)] =
    mv.read().collect()
      .map(r => (r.getString(r.fieldIndex("grp")),
        (r.getLong(r.fieldIndex("n")), r.getDecimal(r.fieldIndex("sum_amt")))))
      .toMap

  private def assertParity(mv: Matview, t: GraftTable): Unit = {
    val want = recompute(t)
    val got = viewState(mv)
    assert(got.keySet == want.keySet, s"groups: $got vs $want")
    want.foreach { case (g, (n, s)) =>
      val (gn, gs) = got(g)
      assert(gn == n, s"group $g count: $gn != $n")
      assert(gs.compareTo(s) == 0, s"group $g sum: $gs != $s")
    }
  }

  private def amt(x: String) = lit(x).cast("decimal(12,2)")

  test("refresh parity through put / update / group-move / delete / erase") {
    val (t, _) = freshTable()
    val mv = t.matview("by_grp", "grp", Seq("amt"), validAt, nBuckets = 8)

    // tx1: initial population, three groups
    t.put(Seq((1L, "a", "10.00"), (2L, "a", "20.00"), (3L, "b", "5.50"),
        (4L, "c", "7.25")).toDF("id", "g", "m"),
      $"id", lit("2020-01-01").cast("timestamp"), None,
      Seq("grp" -> $"g", "amt" -> $"m".cast("decimal(12,2)")),
      ts("2024-01-01 00:00:00"))
    assert(mv.refresh() == 0L)
    assertParity(mv, t)

    // tx2: in-place update (id 1 amount), group move (id 3 b -> c)
    t.put(Seq((1L, "a", "11.00"), (3L, "c", "6.00")).toDF("id", "g", "m"),
      $"id", lit("2020-06-01").cast("timestamp"), None,
      Seq("grp" -> $"g", "amt" -> $"m".cast("decimal(12,2)")),
      ts("2024-01-02 00:00:00"))
    mv.refresh()
    assertParity(mv, t)
    // group b is gone entirely (its only member moved to c)
    assert(!viewState(mv).contains("b"))

    // tx3: delete id 2, erase id 4
    t.delete(Seq(2L).toDF("id"), $"id", lit("2020-01-01").cast("timestamp"),
      None, Seq("grp" -> lit(null).cast("string"),
        "amt" -> lit(null).cast("decimal(12,2)")),
      ts("2024-01-03 00:00:00"))
    t.erase(Seq(4L).toDF("id"), $"id",
      Seq("grp" -> lit(null).cast("string"),
        "amt" -> lit(null).cast("decimal(12,2)")),
      ts("2024-01-04 00:00:00"))
    mv.refresh()
    assertParity(mv, t)
    assert(viewState(mv).keySet == Set("a", "c"))

    // idle refresh: watermark unchanged, state unchanged
    val before = viewState(mv)
    val w = mv.watermark
    assert(mv.refresh() == w)
    assert(viewState(mv) == before)
  }

  test("MIN/MAX parity through put / update / group-move / delete / erase") {
    // extremes are NOT self-maintainable: deleting the max forces the
    // group re-read fallback — exactly the cases exercised here
    val (t, _) = freshTable()
    val mv = t.matview("mm_grp", "grp", Seq("amt"), validAt, nBuckets = 8,
      minCols = Seq("amt"), maxCols = Seq("amt"))

    def recomputeMm(): Map[String, (java.math.BigDecimal, java.math.BigDecimal)] =
      Bitemporal.asOf(t.rectangles(), lit(validAt), lit(ts("9998-01-01 00:00:00")))
        .groupBy($"grp").agg(min($"amt").as("mn"), max($"amt").as("mx"))
        .collect()
        .map(r => r.getString(0) -> (r.getDecimal(1), r.getDecimal(2))).toMap
    def viewMm(): Map[String, (java.math.BigDecimal, java.math.BigDecimal)] =
      mv.read().collect()
        .map(r => (r.getString(r.fieldIndex("grp")),
          (r.getDecimal(r.fieldIndex("min_amt")),
            r.getDecimal(r.fieldIndex("max_amt"))))).toMap
    def assertMmParity(): Unit = {
      val want = recomputeMm(); val got = viewMm()
      assert(got.keySet == want.keySet, s"groups: $got vs $want")
      want.foreach { case (g, (mn, mx)) =>
        val (gmn, gmx) = got(g)
        assert(gmn.compareTo(mn) == 0, s"group $g min: $gmn != $mn")
        assert(gmx.compareTo(mx) == 0, s"group $g max: $gmx != $mx")
      }
    }

    // tx1: a {10, 20, 30}; b {5}; c {7}
    t.put(Seq((1L, "a", "10.00"), (2L, "a", "20.00"), (5L, "a", "30.00"),
        (3L, "b", "5.50"), (4L, "c", "7.25")).toDF("id", "g", "m"),
      $"id", lit("2020-01-01").cast("timestamp"), None,
      Seq("grp" -> $"g", "amt" -> $"m".cast("decimal(12,2)")),
      ts("2024-01-01 00:00:00"))
    mv.refresh()
    assertMmParity()
    assertParity(mv, t) // count/sum still exact alongside

    // tx2: DELETE the max of a (id 5, 30.00) — pure re-read territory;
    // move b's only member to c (b disappears, c's min drops)
    t.delete(Seq(5L).toDF("id"), $"id", lit("2020-01-01").cast("timestamp"),
      None, Seq("grp" -> lit(null).cast("string"),
        "amt" -> lit(null).cast("decimal(12,2)")),
      ts("2024-01-02 00:00:00"))
    t.put(Seq((3L, "c", "6.00")).toDF("id", "g", "m"),
      $"id", lit("2020-06-01").cast("timestamp"), None,
      Seq("grp" -> $"g", "amt" -> $"m".cast("decimal(12,2)")),
      ts("2024-01-03 00:00:00"))
    mv.refresh()
    assertMmParity()
    assert(viewMm()("a")._2.compareTo(new java.math.BigDecimal("20.00")) == 0,
      "deleting the max must surface the runner-up")
    assert(!viewMm().contains("b"))

    // tx3: update a's min downward; erase c's id 4 (c's max falls to 6)
    t.put(Seq((1L, "a", "1.00")).toDF("id", "g", "m"),
      $"id", lit("2020-06-01").cast("timestamp"), None,
      Seq("grp" -> $"g", "amt" -> $"m".cast("decimal(12,2)")),
      ts("2024-01-04 00:00:00"))
    t.erase(Seq(4L).toDF("id"), $"id",
      Seq("grp" -> lit(null).cast("string"),
        "amt" -> lit(null).cast("decimal(12,2)")),
      ts("2024-01-05 00:00:00"))
    mv.refresh()
    assertMmParity()
    assertParity(mv, t)

    // idle refresh leaves extremes intact
    val before = viewMm()
    mv.refresh()
    assert(viewMm() == before)
  }

  test("refresh rewrites only the buckets of changed groups") {
    val (t, dir) = freshTable()
    // many groups spread over many buckets
    val mv = t.matview("by_grp", "grp", Seq("amt"), validAt, nBuckets = 16)
    t.put(spark.range(200).select($"id", concat(lit("g"), $"id" % 40).as("g"),
        lit("1.00").cast("decimal(12,2)").as("m")),
      $"id", lit("2020-01-01").cast("timestamp"), None,
      Seq("grp" -> $"g", "amt" -> $"m"), ts("2024-01-01 00:00:00"))
    mv.refresh()
    val stateDir = java.nio.file.Paths.get(dir, "matview", "by_grp", "state")
    def mtimes(): Map[String, Long] = {
      val s = java.nio.file.Files.list(stateDir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.getFileName.toString.startsWith("_bucket="))
          .map(p => p.getFileName.toString ->
            java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
      } finally s.close()
    }
    val nonEmptyBuckets = mtimes().size
    assert(nonEmptyBuckets > 4, s"want spread groups, got $nonEmptyBuckets buckets")
    val before = mtimes()
    Thread.sleep(1100) // parquet mtime granularity
    // touch ONE group (one id of g7)
    t.put(Seq((7L, "g7", "2.00")).toDF("id", "g", "m"),
      $"id", lit("2021-01-01").cast("timestamp"), None,
      Seq("grp" -> $"g", "amt" -> $"m".cast("decimal(12,2)")),
      ts("2024-01-02 00:00:00"))
    mv.refresh()
    assertParity(mv, t)
    val after = mtimes()
    val rewritten = after.filter { case (k, v) => before.get(k).forall(_ != v) }
    assert(rewritten.size == 1,
      s"one group changed, but rewrote buckets: ${rewritten.keys}")
  }

  test("continuous maintenance: stream-triggered refresh reaches parity; restart is idempotent") {
    val (t, dir) = freshTable()
    val mv = t.matview("live", "grp", Seq("amt"), validAt, nBuckets = 4)
    t.put(Seq((1L, "a", "10.00"), (2L, "b", "20.00")).toDF("id", "g", "m"),
      $"id", lit("2020-01-01").cast("timestamp"), None,
      Seq("grp" -> $"g", "amt" -> $"m".cast("decimal(12,2)")),
      ts("2024-01-01 00:00:00"))
    val schema = t.rectangles().sparkSession.read
      .option("mergeSchema", "true").parquet(s"$dir/log/tx_*").schema
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mv_ckpt").toString

    // drain available txs through the maintainer, then stop
    def drain(): Unit = {
      val q = graft.streaming.Streaming.maintainMatview(spark, dir, schema,
        mv, checkpoint = Some(ckpt), availableNow = true)
      q.awaitTermination()
    }
    drain()
    assertParity(mv, t)

    // more txs while the maintainer is DOWN; a restarted maintainer
    // catches up from the view's own watermark (no double counting even
    // though the stream checkpoint and view watermark are independent)
    t.put(Seq((1L, "a", "11.00"), (3L, "c", "7.00")).toDF("id", "g", "m"),
      $"id", lit("2020-06-01").cast("timestamp"), None,
      Seq("grp" -> $"g", "amt" -> $"m".cast("decimal(12,2)")),
      ts("2024-01-02 00:00:00"))
    drain()
    assertParity(mv, t)

    // an extra drain with nothing new must not change the state
    val before = viewState(mv)
    drain()
    assert(viewState(mv) == before)
  }

  test("many refreshes keep the state's decimal type fixed (no widening)") {
    // regression: delta/merge +/- used to widen decimal precision by
    // one per refresh; once the parquet FIXED_LEN byte width crossed a
    // boundary (p=24), reading older bucket files against the wider
    // inferred schema failed. Ten refreshes on ONE group cross every
    // boundary if widening recurs.
    val (t, _) = freshTable()
    val mv = t.matview("tight", "grp", Seq("amt"), validAt, nBuckets = 2)
    (1 to 10).foreach { i =>
      t.put(Seq((i.toLong, "g", f"$i%d.00")).toDF("id", "g", "m"),
        $"id", lit("2020-01-01").cast("timestamp"), None,
        Seq("grp" -> $"g", "amt" -> $"m".cast("decimal(12,2)")),
        ts(f"2024-01-01 00:00:$i%02d"))
      mv.refresh()
      assertParity(mv, t)
    }
    val dt = mv.read().schema("sum_amt").dataType
    assert(dt == org.apache.spark.sql.types.DecimalType(22, 2), dt.toString)
  }

  test("definition-mismatch discard removes the schema/tz sidecars: a " +
      "failed rebuild reads as 'has no state', never the OLD columns") {
    val (t, dir) = freshTable()
    val mv = t.matview("by_grp_sc", "grp", Seq("amt"), validAt, nBuckets = 4)
    t.put(Seq((1L, "a", "10.00"), (2L, "b", "20.00")).toDF("id", "g", "m"),
      $"id", lit("2020-01-01").cast("timestamp"), None,
      Seq("grp" -> $"g", "amt" -> $"m".cast("decimal(12,2)")),
      ts("2024-01-01 00:00:00"))
    mv.refresh()
    val root = java.nio.file.Paths.get(dir, "matview", "by_grp_sc")
    assert(java.nio.file.Files.exists(root.resolve("_schema")))

    // same state dir, CHANGED definition whose rebuild cannot analyze:
    // the discard must take the '_schema' (and '_tz') sidecars with the
    // data — a survivor would let read() serve the OLD definition's
    // column set while no state exists
    val bad = t.matviewN("by_grp_sc", Seq("grp"), Seq("d1"), validAt, 4,
      derived = Seq("d1" -> "no_such_col * 2"))
    intercept[Exception](bad.refresh())
    assert(!java.nio.file.Files.exists(root.resolve("_schema")),
      "stale _schema must be discarded with the state")
    assert(!java.nio.file.Files.exists(root.resolve("_tz")))
    val e = intercept[IllegalStateException](bad.read().collect())
    assert(e.getMessage.contains("has no state"), e.getMessage)

    // the original definition still rebuilds cleanly from the logs
    mv.refresh()
    assertParity(mv, t)
  }
}
