package graft.bitemporal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.server.{GraftMatviews, GraftServer, GraftSql}

/** Property fuzz for the incrementally-maintained matview engine
  * through the SQL front door: SEEDED random view definitions (an
  * aggregate mix drawn from the full accepted surface — COUNT(*),
  * SUM/AVG/MIN/MAX, COUNT(col), the exact DISTINCT family, the APPROX
  * sketch, FILTER (WHERE …) forms, an optional WHERE sieve, hash or
  * range layout) crossed with
  * random mutation sequences (insert / value update / group move /
  * NULL flip / delete), refreshed at random cut points — and at every
  * refresh the served state must equal a from-scratch recompute over
  * the table's current basis.
  *
  * This is the IVM-parity property every Δ-rule in Matview claims; the
  * directed specs walk chosen corners, the fuzz walks the ones nobody
  * chose. Deterministic seeds — a failure prints its scenario. */
class MatviewFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private final case class ViewDef(
      hasSum: Boolean, hasAvg: Boolean, hasMin: Boolean, hasMax: Boolean,
      hasCnt: Boolean, hasNd: Boolean, hasSd: Boolean, hasApd: Boolean,
      hasWhere: Boolean, range: Boolean,
      hasVar: Boolean = false, hasStd: Boolean = false,
      hasMed: Boolean = false, hasApm: Boolean = false,
      hasFlt: Boolean = false) {
    def selectList: String = {
      val items = Seq("grp", "COUNT(*) AS n") ++
        (if (hasSum) Seq("SUM(amt) AS s") else Nil) ++
        (if (hasAvg) Seq("AVG(amt) AS av") else Nil) ++
        (if (hasMin) Seq("MIN(amt) AS mn") else Nil) ++
        (if (hasMax) Seq("MAX(amt) AS mx") else Nil) ++
        (if (hasCnt) Seq("COUNT(code) AS c") else Nil) ++
        (if (hasNd) Seq("COUNT(DISTINCT code) AS nd") else Nil) ++
        (if (hasSd) Seq("SUM(DISTINCT code) AS sd") else Nil) ++
        (if (hasApd) Seq("APPROX_COUNT_DISTINCT(code) AS apd") else Nil) ++
        (if (hasVar) Seq("VARIANCE(amt) AS vr") else Nil) ++
        (if (hasStd) Seq("STDDEV_POP(amt) AS sp") else Nil) ++
        (if (hasMed) Seq("MEDIAN(amt) AS md") else Nil) ++
        (if (hasApm) Seq("APPROX_PERCENTILE(amt, 0.25) AS ap") else Nil) ++
        (if (hasFlt) Seq("SUM(amt) FILTER (WHERE code = 10) AS fs",
          "COUNT(*) FILTER (WHERE amt < 0) AS fn") else Nil)
      items.mkString(", ")
    }
    def cols: Seq[String] = Seq("grp", "n") ++
      (if (hasSum) Seq("s") else Nil) ++ (if (hasAvg) Seq("av") else Nil) ++
      (if (hasMin) Seq("mn") else Nil) ++ (if (hasMax) Seq("mx") else Nil) ++
      (if (hasCnt) Seq("c") else Nil) ++ (if (hasNd) Seq("nd") else Nil) ++
      (if (hasSd) Seq("sd") else Nil) ++ (if (hasApd) Seq("apd") else Nil) ++
      (if (hasVar) Seq("vr") else Nil) ++ (if (hasStd) Seq("sp") else Nil) ++
      (if (hasMed) Seq("md") else Nil) ++ (if (hasApm) Seq("ap") else Nil) ++
      (if (hasFlt) Seq("fs", "fn") else Nil)
    def ddl(name: String, table: String): String =
      s"CREATE MATERIALIZED VIEW $name WITH " +
        s"(valid_at = '2030-01-01 00:00:00', buckets = 4" +
        (if (range) ", layout = 'range'" else "") +
        ", rewrite = 'trusted') AS " +
        s"SELECT $selectList FROM $table" +
        (if (hasWhere) " WHERE amt > 0" else "") + " GROUP BY grp"

    /** The NAVIGABLE subset of this definition (GraftMvNav's exactness
      * matrix: exact-typed COUNT/SUM/MIN/MAX and the exact DISTINCT
      * family; AVG excluded here because decimal AVG serves double and
      * the schema gate correctly refuses, variance/percentiles/sketch
      * excluded by design). Empty additions still leave COUNT(*). */
    def navItems: Seq[(String, String)] = // (select item, out col)
      Seq("COUNT(*) AS n" -> "n") ++
        (if (hasSum) Seq("SUM(amt) AS s" -> "s") else Nil) ++
        (if (hasMin) Seq("MIN(amt) AS mn" -> "mn") else Nil) ++
        (if (hasMax) Seq("MAX(amt) AS mx" -> "mx") else Nil) ++
        (if (hasCnt) Seq("COUNT(code) AS c" -> "c") else Nil) ++
        (if (hasNd) Seq("COUNT(DISTINCT code) AS nd" -> "nd") else Nil) ++
        (if (hasSd) Seq("SUM(DISTINCT code) AS sd" -> "sd") else Nil) ++
        (if (hasFlt)
          Seq("SUM(amt) FILTER (WHERE code = 10) AS fs" -> "fs",
            "COUNT(*) FILTER (WHERE amt < 0) AS fn" -> "fn")
        else Nil)
    def navQuery(table: String): String =
      s"SELECT grp, ${navItems.map(_._1).mkString(", ")} FROM $table" +
        (if (hasWhere) " WHERE amt > 0" else "") + " GROUP BY grp"
  }

  /** One scenario: build a random view over a fresh table, drive a
    * random op sequence, check parity at every refresh cut. */
  private def runScenario(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val vd = ViewDef(
      hasSum = rnd.nextBoolean(), hasAvg = rnd.nextBoolean(),
      hasMin = rnd.nextBoolean(), hasMax = rnd.nextBoolean(),
      hasCnt = rnd.nextBoolean(), hasNd = rnd.nextBoolean(),
      hasSd = rnd.nextBoolean(), hasApd = rnd.nextBoolean(),
      hasWhere = rnd.nextBoolean(), range = rnd.nextBoolean(),
      hasVar = rnd.nextBoolean(), hasStd = rnd.nextBoolean(),
      hasMed = rnd.nextBoolean(), hasApm = rnd.nextBoolean(),
      hasFlt = rnd.nextBoolean())
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_mvfz$seed").toString
    val t = new graft.GraftTable(spark, dir, Seq("grp", "code", "amt"))
    val tbl = s"fz$seed"
    GraftServer.register(tbl, t)
    val groups = Seq("ga", "gb", "gc", null)
    val codes = Seq[java.lang.Long](10L, 20L, 30L, null)
    var tick = 0
    def sysTs(): java.sql.Timestamp = {
      tick += 1; ts(f"2024-01-01 00:${tick / 60}%02d:${tick % 60}%02d")
    }
    def put(rows: Seq[(Long, String, java.lang.Long, String)]): Unit =
      t.put(rows.toDF("id", "g", "c", "m")
          .select($"id", $"g", $"c", $"m".cast("decimal(12,2)").as("m")),
        $"id", lit("2020-01-01").cast("timestamp"), None,
        Seq("grp" -> $"g", "code" -> $"c", "amt" -> $"m"), sysTs())
    def del(ids: Seq[Long]): Unit =
      t.delete(ids.toDF("id"), $"id",
        lit("2020-01-01").cast("timestamp"), None,
        Seq("grp" -> lit(null).cast("string"),
          "code" -> lit(null).cast("long"),
          "amt" -> lit(null).cast("decimal(12,2)")), sysTs())
    def randomAmt(): String = {
      // mixed-sign so the WHERE sieve has rows to admit AND reject;
      // 1-in-6 NULL so all-NULL groups exercise SUM/AVG's NULL serving
      if (rnd.nextInt(6) == 0) return null
      val cents = rnd.nextInt(4000) - 1000
      f"${cents / 100}%d.${math.abs(cents % 100)}%02d"
    }
    def randomRow(id: Long) = (id, groups(rnd.nextInt(groups.size)),
      codes(rnd.nextInt(codes.size)), randomAmt())

    val live = scala.collection.mutable.Set.empty[Long]
    def mutate(): Unit = rnd.nextInt(4) match {
      case 0 => // insert a batch of new ids
        val fresh = (1 to 1 + rnd.nextInt(4)).map(_ => rnd.nextLong(1000))
        put(fresh.map(randomRow)); live ++= fresh
      case 1 if live.nonEmpty => // update some existing ids (any field)
        val ids = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(3))
        put(ids.map(randomRow))
      case 2 if live.nonEmpty => // delete some
        val ids = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(2))
        del(ids); live --= ids
      case _ => // group move: same id, new group only
        if (live.nonEmpty) {
          val id = rnd.shuffle(live.toSeq).head
          put(Seq(randomRow(id)))
        } else { val id = rnd.nextLong(1000); put(Seq(randomRow(id))); live += id: Unit }
    }

    def scratch(): Seq[Seq[String]] = {
      val base0 = t.current()
      val base = if (vd.hasWhere) base0.filter($"amt" > 0) else base0
      val aggs = Seq(count(lit(1)).as("n")) ++
        (if (vd.hasSum) Seq(sum($"amt").as("s")) else Nil) ++
        (if (vd.hasAvg) Seq(when(count($"amt") > 0,
          sum($"amt").cast("double") / count($"amt")).as("av")) else Nil) ++
        (if (vd.hasMin) Seq(min($"amt").as("mn")) else Nil) ++
        (if (vd.hasMax) Seq(max($"amt").as("mx")) else Nil) ++
        (if (vd.hasCnt) Seq(count($"code").as("c")) else Nil) ++
        (if (vd.hasNd) Seq(count_distinct($"code").as("nd")) else Nil) ++
        (if (vd.hasSd) Seq(sum_distinct($"code").as("sd")) else Nil) ++
        (if (vd.hasApd) Seq(count_distinct($"code").as("apd")) else Nil) ++ {
          // variance/stddev mirror the SERVE formula bit for bit (exact
          // decimal sums → the same IEEE double ops), not Spark's
          // Welford aggregate, which differs in the last ulps
          lazy val nnD = count($"amt").cast("double")
          lazy val sD = sum($"amt").cast("double")
          lazy val qD = sum($"amt" * $"amt").cast("double")
          lazy val num = greatest(qD - sD * sD / nnD, lit(0.0))
          (if (vd.hasVar)
            Seq(when(count($"amt") > 1, num / (nnD - lit(1.0))).as("vr"))
          else Nil) ++
          (if (vd.hasStd)
            Seq(org.apache.spark.sql.functions
              .sqrt(when(count($"amt") > 0, num / nnD)).as("sp"))
          else Nil)
        } ++
        (if (vd.hasMed)
          Seq(expr("percentile(cast(amt as double), 0.5)").as("md"))
        else Nil) ++
        (if (vd.hasApm)
          Seq(expr("percentile_approx(cast(amt as double), 0.25, 10000)")
            .as("ap"))
        else Nil) ++
        // filtered aggregates: the CASE image of the ANSI clause (the
        // desugar under test), computed from scratch
        (if (vd.hasFlt)
          Seq(sum(when($"code" === 10, $"amt")).as("fs"),
            count(when($"amt" < 0, lit(1))).as("fn"))
        else Nil)
      base.groupBy($"grp").agg(aggs.head, aggs.tail: _*)
        .select(vd.cols.map(col): _*).collect()
        .map(r => vd.cols.indices.map(i => String.valueOf(r.get(i))).toSeq)
        .toSeq.sortBy(_.mkString(""))
    }
    def served(): Seq[Seq[String]] =
      GraftSql.sql(spark,
        s"SELECT ${vd.cols.mkString(", ")} FROM mv_fz$seed")
        .collect()
        .map(r => vd.cols.indices.map(i => String.valueOf(r.get(i))).toSeq)
        .toSeq.sortBy(_.mkString(""))

    // aggregate-navigation parity: a PLAIN query over the base table
    // (the navigable subset of this view's aggregates) must fire the
    // rewrite — fresh + trusted + exact-typed, so a decline is a bug —
    // and the navigated rows must equal the from-scratch recompute
    def navParity(label: String): Unit = {
      val q = vd.navQuery(tbl)
      val rw = graft.server.GraftMvNav.rewrite(spark, q)
      assert(rw.isDefined, s"seed $seed $label: navigation must fire " +
        s"for a fresh trusted view\n$q")
      val outs = "grp" +: vd.navItems.map(_._2)
      val idx = outs.map(vd.cols.indexOf)
      val want = scratch().map(r => idx.map(r))
        .sortBy(_.mkString(" "))
      val got = spark.sql(rw.get).collect()
        .map(r => outs.indices.map(i => String.valueOf(r.get(i))).toSeq)
        .toSeq.sortBy(_.mkString(" "))
      assert(got == want,
        s"seed $seed $label nav parity failed:\n got $got\nwant $want\n" +
          s"query: $q\nrewritten: ${rw.get}")
    }
    // adversarial probes at the matcher's blind spots: the navigator's
    // failure mode is a WRONG rewrite, so each variant asserts BOTH the
    // routing decision (navigate vs base) and — when it navigates —
    // parity against the base plan computed through BitemporalSql
    def navAdversarial(label: String): Unit = {
      import graft.server.GraftMvNav
      val items = vd.navItems.map(_._1).mkString(", ")
      val outs = "grp" +: vd.navItems.map(_._2)
      def run(q: String, expectNav: Boolean, why: String): Unit = {
        val rw = GraftMvNav.rewrite(spark, q)
        assert(rw.isDefined == expectNav,
          s"seed $seed $label $why:\n$q\n→ $rw")
        rw.foreach { r =>
          def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
            .map(x => outs.indices.map(i => String.valueOf(x.get(i))).toSeq)
            .toSeq.sortBy(_.mkString(" "))
          val got = rows(spark.sql(r))
          val want = rows(BitemporalSql.sql(spark, q,
            Map(tbl -> t.rectangles())))
          assert(got == want, s"seed $seed $label $why parity:\n" +
            s" got $got\nwant $want\nquery: $q\nrewritten: $r")
        }
      }
      val w0 = if (vd.hasWhere) " WHERE amt > 0 AND" else " WHERE"
      run(s"SELECT grp, $items FROM $tbl$w0 grp = 'ga' GROUP BY grp",
        expectNav = true,
        "a residual conjunct on the GROUP column must navigate")
      run(s"SELECT grp, $items FROM $tbl$w0 code = 10 GROUP BY grp",
        expectNav = false,
        "a residual conjunct on a NON-group column must fall back")
      run(vd.navQuery(tbl) + " HAVING COUNT(*) > 1",
        expectNav = true, "HAVING on a served aggregate must navigate")
      run(vd.navQuery(tbl) + " HAVING MAX(code) > 0",
        expectNav = false,
        "HAVING on an aggregate the view does not serve must fall back")
      assert(GraftMvNav.rewrite(spark,
        vd.navQuery(tbl).replace(s"FROM $tbl", s"FROM $tbl fz_alias"))
        .isEmpty, s"seed $seed $label: an aliased fact must fall back")
      // GLOBAL aggregate (r16): no GROUP BY — the degenerate rollup;
      // DISTINCT aggregates re-aggregate the aux PAIR state, so the
      // random dead pairs / NULL codes this scenario accumulates
      // exercise the join-form rewrite
      locally {
        val gq = s"SELECT ${vd.navItems.map(_._1).mkString(", ")} " +
          s"FROM $tbl" + (if (vd.hasWhere) " WHERE amt > 0" else "")
        val rw = GraftMvNav.rewrite(spark, gq)
        assert(rw.isDefined,
          s"seed $seed $label: the GLOBAL aggregate must navigate\n$gq")
        def rws(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(x => (0 until x.length)
            .map(i => String.valueOf(x.get(i))).toSeq).toSeq
        val got = rws(spark.sql(rw.get))
        val want = rws(BitemporalSql.sql(spark, gq,
          Map(tbl -> t.rectangles())))
        assert(got == want, s"seed $seed $label GLOBAL nav parity:\n" +
          s" got $got\nwant $want\nrewritten: ${rw.get}")
      }
    }
    try {
      // seed data, then CREATE (populates)
      val init = (1 to 4 + rnd.nextInt(5)).map(_ => rnd.nextLong(1000))
      put(init.map(randomRow)); live ++= init
      GraftSql.sql(spark, vd.ddl(s"mv_fz$seed", tbl)).collect()
      val story = new StringBuilder(vd.ddl(s"mv_fz$seed", tbl))
      assert(served() == scratch(),
        s"seed $seed POPULATE parity failed\n$story")
      navParity("POPULATE")
      // random mutation waves with refresh cuts
      (1 to 3 + rnd.nextInt(3)).foreach { wave =>
        (1 to 1 + rnd.nextInt(4)).foreach(_ => mutate())
        // pre-refresh: the view is now STALE — navigation must decline
        assert(graft.server.GraftMvNav.rewrite(spark, vd.navQuery(tbl))
          .isEmpty, s"seed $seed wave $wave: a stale view must decline")
        GraftSql.sql(spark, s"REFRESH MATERIALIZED VIEW mv_fz$seed")
          .collect()
        val (got, want) = (served(), scratch())
        assert(got == want,
          s"seed $seed wave $wave parity failed:\n got $got\nwant $want\n" +
            s"def: $story\nlive: $live")
        navParity(s"wave $wave")
      }
      navAdversarial("FINAL")
      GraftSql.sql(spark, s"DROP MATERIALIZED VIEW mv_fz$seed").collect()
    } finally {
      GraftServer.unregister(tbl)
      GraftMatviews.reset()
    }
  }

  test("IVM parity fuzz: 20 seeded random (definition x mutation " +
      "sequence) scenarios match from-scratch recomputes at every " +
      "refresh") {
    // the sketch is exact at these cardinalities (<= 3 distinct codes
    // per group — deep inside the sparse regime), so apd participates
    // in the EXACT compare; a sketch regression shows as a diff
    (1 to 20).foreach(runScenario)
  }

  /** JOIN-form scenario: a fact⋈dim view (INNER or LEFT — the axis the
    * Δ(A⋈B) rules branch on), grouped by the DIM-side column so every
    * dim mutation is a group move, driven by BOTH tables' mutation
    * streams with dangling and NULL fks in play. Parity at every cut
    * against a from-scratch recompute of the same join. */
  private def runJoinScenario(seed: Int): Unit = {
    val rnd = new scala.util.Random(7000 + seed)
    val left = rnd.nextBoolean()
    val hasSum = rnd.nextBoolean(); val hasMin = rnd.nextBoolean()
    val hasMax = rnd.nextBoolean(); val hasCnt = rnd.nextBoolean()
    val hasNd = rnd.nextBoolean(); val hasApd = rnd.nextBoolean()
    val hasWhere = rnd.nextBoolean()
    val hasMed = rnd.nextBoolean(); val hasStd = rnd.nextBoolean()
    val cols = Seq("dgrp", "n") ++
      (if (hasSum) Seq("s") else Nil) ++ (if (hasMin) Seq("mn") else Nil) ++
      (if (hasMax) Seq("mx") else Nil) ++ (if (hasCnt) Seq("c") else Nil) ++
      (if (hasNd) Seq("nd") else Nil) ++ (if (hasApd) Seq("apd") else Nil) ++
      (if (hasMed) Seq("md") else Nil) ++ (if (hasStd) Seq("sp") else Nil)
    val selectList = (Seq("dgrp", "COUNT(*) AS n") ++
      (if (hasSum) Seq("SUM(amt) AS s") else Nil) ++
      (if (hasMin) Seq("MIN(amt) AS mn") else Nil) ++
      (if (hasMax) Seq("MAX(amt) AS mx") else Nil) ++
      (if (hasCnt) Seq("COUNT(code) AS c") else Nil) ++
      (if (hasNd) Seq("COUNT(DISTINCT code) AS nd") else Nil) ++
      (if (hasApd) Seq("APPROX_COUNT_DISTINCT(code) AS apd") else Nil) ++
      (if (hasMed) Seq("MEDIAN(amt) AS md") else Nil) ++
      (if (hasStd) Seq("STDDEV_POP(amt) AS sp") else Nil))
      .mkString(", ")
    val fdir = java.nio.file.Files
      .createTempDirectory(s"graft_mvfzj_f$seed").toString
    val ddir = java.nio.file.Files
      .createTempDirectory(s"graft_mvfzj_d$seed").toString
    val f = new graft.GraftTable(spark, fdir, Seq("fk", "code", "amt"))
    val d = new graft.GraftTable(spark, ddir, Seq("dgrp"))
    val ftbl = s"fzjf$seed"; val dtbl = s"fzjd$seed"
    GraftServer.register(ftbl, f); GraftServer.register(dtbl, d)
    val groups = Seq("ga", "gb", "gc")
    val codes = Seq[java.lang.Long](10L, 20L, 30L, null)
    var tick = 0
    def sysTs(): java.sql.Timestamp = {
      tick += 1; ts(f"2024-01-01 00:${tick / 60}%02d:${tick % 60}%02d")
    }
    def putF(rows: Seq[(Long, java.lang.Long, java.lang.Long, String)])
        : Unit =
      f.put(rows.toDF("id", "k", "c", "m")
          .select($"id", $"k", $"c", $"m".cast("decimal(12,2)").as("m")),
        $"id", lit("2020-01-01").cast("timestamp"), None,
        Seq("fk" -> $"k", "code" -> $"c", "amt" -> $"m"), sysTs())
    def putD(rows: Seq[(Long, String)]): Unit =
      d.put(rows.toDF("id", "g"), $"id",
        lit("2020-01-01").cast("timestamp"), None,
        Seq("dgrp" -> $"g"), sysTs())
    def delF(ids: Seq[Long]): Unit =
      f.delete(ids.toDF("id"), $"id",
        lit("2020-01-01").cast("timestamp"), None,
        Seq("fk" -> lit(null).cast("long"),
          "code" -> lit(null).cast("long"),
          "amt" -> lit(null).cast("decimal(12,2)")), sysTs())
    def delD(ids: Seq[Long]): Unit =
      d.delete(ids.toDF("id"), $"id",
        lit("2020-01-01").cast("timestamp"), None,
        Seq("dgrp" -> lit(null).cast("string")), sysTs())
    def randomAmt(): String = {
      if (rnd.nextInt(6) == 0) return null
      val cents = rnd.nextInt(4000) - 1000
      f"${cents / 100}%d.${math.abs(cents % 100)}%02d"
    }
    val liveF = scala.collection.mutable.Set.empty[Long]
    val liveD = scala.collection.mutable.Set.empty[Long]
    // fk pool: live dims, a DANGLING id (never inserted) and NULL —
    // on a LEFT spoke the latter two ride as null-extended rows; on an
    // INNER spoke they vanish from the view (both must stay correct)
    def randomFk(): java.lang.Long = rnd.nextInt(5) match {
      case 0 => 999L // dangling
      case 1 => null
      case _ if liveD.nonEmpty =>
        Long.box(rnd.shuffle(liveD.toSeq).head)
      case _ => 999L
    }
    def randomFRow(id: Long) = (id, randomFk(),
      codes(rnd.nextInt(codes.size)), randomAmt())
    def mutate(): Unit = rnd.nextInt(6) match {
      case 0 => // fact inserts
        val fresh = (1 to 1 + rnd.nextInt(3)).map(_ => rnd.nextLong(1000))
        putF(fresh.map(randomFRow)); liveF ++= fresh
      case 1 if liveF.nonEmpty => // fact updates (fk moves included)
        val ids = rnd.shuffle(liveF.toSeq).take(1 + rnd.nextInt(3))
        putF(ids.map(randomFRow))
      case 2 if liveF.nonEmpty => // fact deletes
        val ids = rnd.shuffle(liveF.toSeq).take(1 + rnd.nextInt(2))
        delF(ids); liveF --= ids
      case 3 => // dim insert (a dangling fk may become matched)
        val id = if (rnd.nextInt(3) == 0) 999L else rnd.nextLong(50)
        putD(Seq(id -> groups(rnd.nextInt(groups.size)))); liveD += id: Unit
      case 4 if liveD.nonEmpty => // dim group move, zero fact ops
        val id = rnd.shuffle(liveD.toSeq).head
        putD(Seq(id -> groups(rnd.nextInt(groups.size))))
      case _ if liveD.nonEmpty => // dim delete: matched facts fall out
        val id = rnd.shuffle(liveD.toSeq).head // (or to the null group)
        delD(Seq(id)); liveD -= id: Unit
      case _ => ()
    }
    def scratch(): Seq[Seq[String]] = {
      val vf0 = f.current().select($"fk", $"code", $"amt")
      val vd = d.current().select($"_id".cast("long").as("_did"), $"dgrp")
      val j0 = vf0.join(vd, $"fk".cast("long") === $"_did",
        if (left) "left" else "inner")
      val j = if (hasWhere) j0.filter($"amt" > 0) else j0
      val aggs = Seq(count(lit(1)).as("n")) ++
        (if (hasSum) Seq(sum($"amt").as("s")) else Nil) ++
        (if (hasMin) Seq(min($"amt").as("mn")) else Nil) ++
        (if (hasMax) Seq(max($"amt").as("mx")) else Nil) ++
        (if (hasCnt) Seq(count($"code").as("c")) else Nil) ++
        (if (hasNd) Seq(count_distinct($"code").as("nd")) else Nil) ++
        (if (hasApd) Seq(count_distinct($"code").as("apd")) else Nil) ++
        (if (hasMed)
          Seq(expr("percentile(cast(amt as double), 0.5)").as("md"))
        else Nil) ++
        // stddev mirrors the serve formula (see the single-table fuzz)
        (if (hasStd) {
          val nnD = count($"amt").cast("double")
          val sD = sum($"amt").cast("double")
          val qD = sum($"amt" * $"amt").cast("double")
          Seq(org.apache.spark.sql.functions.sqrt(
            when(count($"amt") > 0,
              greatest(qD - sD * sD / nnD, lit(0.0)) / nnD)).as("sp"))
        } else Nil)
      j.groupBy($"dgrp").agg(aggs.head, aggs.tail: _*)
        .select(cols.map(col): _*).collect()
        .map(r => cols.indices.map(i => String.valueOf(r.get(i))).toSeq)
        .toSeq.sortBy(_.mkString(""))
    }
    def served(): Seq[Seq[String]] =
      GraftSql.sql(spark, s"SELECT ${cols.mkString(", ")} FROM mv_fzj$seed")
        .collect()
        .map(r => cols.indices.map(i => String.valueOf(r.get(i))).toSeq)
        .toSeq.sortBy(_.mkString(""))
    val ddl = s"CREATE MATERIALIZED VIEW mv_fzj$seed WITH " +
      "(valid_at = '2030-01-01 00:00:00', buckets = 4, " +
      "rewrite = 'trusted') AS " +
      s"SELECT $selectList FROM $ftbl " +
      (if (left) "LEFT JOIN" else "JOIN") + s" $dtbl ON fk = $dtbl._id" +
      (if (hasWhere) " WHERE amt > 0" else "") + " GROUP BY dgrp"
    // the navigable subset (GraftMvNav exactness matrix — see the
    // single-table generator) over the SAME join shape
    val navItems: Seq[(String, String)] = Seq("COUNT(*) AS n" -> "n") ++
      (if (hasSum) Seq("SUM(amt) AS s" -> "s") else Nil) ++
      (if (hasMin) Seq("MIN(amt) AS mn" -> "mn") else Nil) ++
      (if (hasMax) Seq("MAX(amt) AS mx" -> "mx") else Nil) ++
      (if (hasCnt) Seq("COUNT(code) AS c" -> "c") else Nil) ++
      (if (hasNd) Seq("COUNT(DISTINCT code) AS nd" -> "nd") else Nil)
    val navQ = s"SELECT dgrp, ${navItems.map(_._1).mkString(", ")} " +
      s"FROM $ftbl " + (if (left) "LEFT JOIN" else "JOIN") +
      s" $dtbl ON fk = $dtbl._id" +
      (if (hasWhere) " WHERE amt > 0" else "") + " GROUP BY dgrp"
    def navParity(label: String): Unit = {
      val rw = graft.server.GraftMvNav.rewrite(spark, navQ)
      assert(rw.isDefined, s"join seed $seed $label: navigation must " +
        s"fire for a fresh trusted view\n$navQ")
      val outs = "dgrp" +: navItems.map(_._2)
      val idx = outs.map(cols.indexOf)
      val want = scratch().map(r => idx.map(r)).sortBy(_.mkString(" "))
      val got = spark.sql(rw.get).collect()
        .map(r => outs.indices.map(i => String.valueOf(r.get(i))).toSeq)
        .toSeq.sortBy(_.mkString(" "))
      assert(got == want,
        s"join seed $seed $label nav parity failed:\n got $got\n" +
          s"want $want\nquery: $navQ\nrewritten: ${rw.get}")
      // GLOBAL aggregate over the SAME join shape (r16): the
      // degenerate rollup, DISTINCT via the star-form aux pair state
      val gq = s"SELECT ${navItems.map(_._1).mkString(", ")} " +
        s"FROM $ftbl " + (if (left) "LEFT JOIN" else "JOIN") +
        s" $dtbl ON fk = $dtbl._id" +
        (if (hasWhere) " WHERE amt > 0" else "")
      val rwG = graft.server.GraftMvNav.rewrite(spark, gq)
      assert(rwG.isDefined, s"join seed $seed $label: the GLOBAL " +
        s"aggregate must navigate\n$gq")
      def rws(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(x => (0 until x.length)
          .map(i => String.valueOf(x.get(i))).toSeq).toSeq
      val gotG = rws(spark.sql(rwG.get))
      val wantG = rws(BitemporalSql.sql(spark, gq,
        Map(ftbl -> f.rectangles(), dtbl -> d.rectangles())))
      assert(gotG == wantG, s"join seed $seed $label GLOBAL nav " +
        s"parity:\n got $gotG\nwant $wantG\nrewritten: ${rwG.get}")
    }
    try {
      val initD = (1 to 2 + rnd.nextInt(3)).map(_ => rnd.nextLong(50))
      putD(initD.map(i => i -> groups(rnd.nextInt(groups.size))))
      liveD ++= initD
      val initF = (1 to 4 + rnd.nextInt(5)).map(_ => rnd.nextLong(1000))
      putF(initF.map(randomFRow)); liveF ++= initF
      GraftSql.sql(spark, ddl).collect()
      assert(served() == scratch(),
        s"join seed $seed POPULATE parity failed\n$ddl")
      navParity("POPULATE")
      (1 to 3 + rnd.nextInt(3)).foreach { wave =>
        (1 to 1 + rnd.nextInt(4)).foreach(_ => mutate())
        GraftSql.sql(spark, s"REFRESH MATERIALIZED VIEW mv_fzj$seed")
          .collect()
        val (got, want) = (served(), scratch())
        assert(got == want,
          s"join seed $seed wave $wave parity failed:\n got $got\n" +
            s"want $want\ndef: $ddl\nliveF: $liveF liveD: $liveD")
        navParity(s"wave $wave")
      }
      GraftSql.sql(spark, s"DROP MATERIALIZED VIEW mv_fzj$seed").collect()
    } finally {
      GraftServer.unregister(ftbl); GraftServer.unregister(dtbl)
      GraftMatviews.reset()
    }
  }

  test("join-form IVM parity fuzz: 12 seeded random INNER/LEFT fact⋈dim " +
      "scenarios — dim group-moves, dangling and NULL fks, dual " +
      "mutation streams — match from-scratch recomputes at every " +
      "refresh") {
    (1 to 12).foreach(runJoinScenario)
  }

  /** STAR-form scenario: fact ⋈ TWO dims, each spoke independently
    * INNER or LEFT, grouped by BOTH dims' columns, with an optional
    * expression aggregate reading the second dim's numeric payload —
    * the shape where a spoke's null-extension, the other spoke's
    * dim-touched recompute, and the derived column's NULL arithmetic
    * all interact. Three mutation streams; parity at every cut. */
  private def runStarScenario(seed: Int): Unit = {
    val rnd = new scala.util.Random(9000 + seed)
    val left1 = rnd.nextBoolean(); val left2 = rnd.nextBoolean()
    val hasSum = rnd.nextBoolean(); val hasMin = rnd.nextBoolean()
    val hasMax = rnd.nextBoolean(); val hasCnt = rnd.nextBoolean()
    val hasRev = rnd.nextBoolean() // SUM(amt * dval): reads dim 2
    val hasWhere = rnd.nextBoolean()
    val cols = Seq("dgrp", "egrp", "n") ++
      (if (hasSum) Seq("s") else Nil) ++ (if (hasMin) Seq("mn") else Nil) ++
      (if (hasMax) Seq("mx") else Nil) ++ (if (hasCnt) Seq("c") else Nil) ++
      (if (hasRev) Seq("rev") else Nil)
    val selectList = (Seq("dgrp", "egrp", "COUNT(*) AS n") ++
      (if (hasSum) Seq("SUM(amt) AS s") else Nil) ++
      (if (hasMin) Seq("MIN(amt) AS mn") else Nil) ++
      (if (hasMax) Seq("MAX(amt) AS mx") else Nil) ++
      (if (hasCnt) Seq("COUNT(code) AS c") else Nil) ++
      (if (hasRev) Seq("SUM(amt * dval) AS rev") else Nil))
      .mkString(", ")
    val fdir = java.nio.file.Files
      .createTempDirectory(s"graft_mvfzs_f$seed").toString
    val d1dir = java.nio.file.Files
      .createTempDirectory(s"graft_mvfzs_d$seed").toString
    val d2dir = java.nio.file.Files
      .createTempDirectory(s"graft_mvfzs_e$seed").toString
    val f = new graft.GraftTable(spark, fdir, Seq("fk", "ek", "code", "amt"))
    val d1 = new graft.GraftTable(spark, d1dir, Seq("dgrp"))
    val d2 = new graft.GraftTable(spark, d2dir, Seq("egrp", "dval"))
    val ftbl = s"fzsf$seed"; val d1tbl = s"fzsd$seed"; val d2tbl = s"fzse$seed"
    GraftServer.register(ftbl, f)
    GraftServer.register(d1tbl, d1); GraftServer.register(d2tbl, d2)
    val groups = Seq("ga", "gb", "gc")
    val codes = Seq[java.lang.Long](10L, 20L, 30L, null)
    var tick = 0
    def sysTs(): java.sql.Timestamp = {
      tick += 1; ts(f"2024-01-01 00:${tick / 60}%02d:${tick % 60}%02d")
    }
    def putF(rows: Seq[(Long, java.lang.Long, java.lang.Long,
        java.lang.Long, String)]): Unit =
      f.put(rows.toDF("id", "k", "e", "c", "m")
          .select($"id", $"k", $"e", $"c",
            $"m".cast("decimal(12,2)").as("m")),
        $"id", lit("2020-01-01").cast("timestamp"), None,
        Seq("fk" -> $"k", "ek" -> $"e", "code" -> $"c", "amt" -> $"m"),
        sysTs())
    def putD1(rows: Seq[(Long, String)]): Unit =
      d1.put(rows.toDF("id", "g"), $"id",
        lit("2020-01-01").cast("timestamp"), None,
        Seq("dgrp" -> $"g"), sysTs())
    def putD2(rows: Seq[(Long, String, java.lang.Long)]): Unit =
      d2.put(rows.toDF("id", "g", "v"), $"id",
        lit("2020-01-01").cast("timestamp"), None,
        Seq("egrp" -> $"g", "dval" -> $"v"), sysTs())
    def delF(ids: Seq[Long]): Unit =
      f.delete(ids.toDF("id"), $"id",
        lit("2020-01-01").cast("timestamp"), None,
        Seq("fk" -> lit(null).cast("long"), "ek" -> lit(null).cast("long"),
          "code" -> lit(null).cast("long"),
          "amt" -> lit(null).cast("decimal(12,2)")), sysTs())
    def delD1(ids: Seq[Long]): Unit =
      d1.delete(ids.toDF("id"), $"id",
        lit("2020-01-01").cast("timestamp"), None,
        Seq("dgrp" -> lit(null).cast("string")), sysTs())
    def delD2(ids: Seq[Long]): Unit =
      d2.delete(ids.toDF("id"), $"id",
        lit("2020-01-01").cast("timestamp"), None,
        Seq("egrp" -> lit(null).cast("string"),
          "dval" -> lit(null).cast("long")), sysTs())
    def randomAmt(): String = {
      if (rnd.nextInt(6) == 0) return null
      val cents = rnd.nextInt(4000) - 1000
      f"${cents / 100}%d.${math.abs(cents % 100)}%02d"
    }
    val liveF = scala.collection.mutable.Set.empty[Long]
    val liveD1 = scala.collection.mutable.Set.empty[Long]
    val liveD2 = scala.collection.mutable.Set.empty[Long]
    def randomFk(live: scala.collection.mutable.Set[Long])
        : java.lang.Long = rnd.nextInt(5) match {
      case 0 => 999L // dangling
      case 1 => null
      case _ if live.nonEmpty => Long.box(rnd.shuffle(live.toSeq).head)
      case _ => 999L
    }
    def randomFRow(id: Long) = (id, randomFk(liveD1), randomFk(liveD2),
      codes(rnd.nextInt(codes.size)), randomAmt())
    def mutate(): Unit = rnd.nextInt(9) match {
      case 0 => // fact inserts
        val fresh = (1 to 1 + rnd.nextInt(3)).map(_ => rnd.nextLong(1000))
        putF(fresh.map(randomFRow)); liveF ++= fresh
      case 1 if liveF.nonEmpty => // fact updates (both fks may move)
        val ids = rnd.shuffle(liveF.toSeq).take(1 + rnd.nextInt(3))
        putF(ids.map(randomFRow))
      case 2 if liveF.nonEmpty => // fact deletes
        val ids = rnd.shuffle(liveF.toSeq).take(1 + rnd.nextInt(2))
        delF(ids); liveF --= ids
      case 3 => // dim-1 insert (a dangling fk may become matched)
        val id = if (rnd.nextInt(3) == 0) 999L else rnd.nextLong(50)
        putD1(Seq(id -> groups(rnd.nextInt(groups.size)))); liveD1 += id: Unit
      case 4 if liveD1.nonEmpty => // dim-1 group move, zero fact ops
        val id = rnd.shuffle(liveD1.toSeq).head
        putD1(Seq(id -> groups(rnd.nextInt(groups.size))))
      case 5 if liveD1.nonEmpty => // dim-1 delete
        val id = rnd.shuffle(liveD1.toSeq).head
        delD1(Seq(id)); liveD1 -= id: Unit
      case 6 => // dim-2 insert
        val id = if (rnd.nextInt(3) == 0) 999L else rnd.nextLong(50)
        putD2(Seq((id, groups(rnd.nextInt(groups.size)),
          Long.box(rnd.nextInt(5).toLong)))); liveD2 += id: Unit
      case 7 if liveD2.nonEmpty => // dim-2 value/group change, no fact ops
        val id = rnd.shuffle(liveD2.toSeq).head
        putD2(Seq((id, groups(rnd.nextInt(groups.size)),
          Long.box(rnd.nextInt(5).toLong))))
      case _ if liveD2.nonEmpty => // dim-2 delete
        val id = rnd.shuffle(liveD2.toSeq).head
        delD2(Seq(id)); liveD2 -= id: Unit
      case _ => ()
    }
    def scratch(): Seq[Seq[String]] = {
      val vf = f.current().select($"fk", $"ek", $"code", $"amt")
      val v1 = d1.current().select($"_id".cast("long").as("_d1"), $"dgrp")
      val v2 = d2.current().select($"_id".cast("long").as("_d2"),
        $"egrp", $"dval")
      val j0 = vf.join(v1, $"fk".cast("long") === $"_d1",
          if (left1) "left" else "inner")
        .join(v2, $"ek".cast("long") === $"_d2",
          if (left2) "left" else "inner")
      val j = if (hasWhere) j0.filter($"amt" > 0) else j0
      val aggs = Seq(count(lit(1)).as("n")) ++
        (if (hasSum) Seq(sum($"amt").as("s")) else Nil) ++
        (if (hasMin) Seq(min($"amt").as("mn")) else Nil) ++
        (if (hasMax) Seq(max($"amt").as("mx")) else Nil) ++
        (if (hasCnt) Seq(count($"code").as("c")) else Nil) ++
        (if (hasRev) Seq(sum($"amt" * $"dval").as("rev")) else Nil)
      j.groupBy($"dgrp", $"egrp").agg(aggs.head, aggs.tail: _*)
        .select(cols.map(col): _*).collect()
        .map(r => cols.indices.map(i => String.valueOf(r.get(i))).toSeq)
        .toSeq.sortBy(_.mkString(""))
    }
    def served(): Seq[Seq[String]] =
      GraftSql.sql(spark, s"SELECT ${cols.mkString(", ")} FROM mv_fzs$seed")
        .collect()
        .map(r => cols.indices.map(i => String.valueOf(r.get(i))).toSeq)
        .toSeq.sortBy(_.mkString(""))
    val ddl = s"CREATE MATERIALIZED VIEW mv_fzs$seed WITH " +
      "(valid_at = '2030-01-01 00:00:00', buckets = 4) AS " +
      s"SELECT $selectList FROM $ftbl " +
      (if (left1) "LEFT JOIN" else "JOIN") + s" $d1tbl ON fk = $d1tbl._id " +
      (if (left2) "LEFT JOIN" else "JOIN") + s" $d2tbl ON ek = $d2tbl._id" +
      (if (hasWhere) " WHERE amt > 0" else "") + " GROUP BY dgrp, egrp"
    try {
      val initD1 = (1 to 2 + rnd.nextInt(3)).map(_ => rnd.nextLong(50))
      putD1(initD1.map(i => i -> groups(rnd.nextInt(groups.size))))
      liveD1 ++= initD1
      val initD2 = (1 to 2 + rnd.nextInt(3)).map(_ => rnd.nextLong(50))
      putD2(initD2.map(i => (i, groups(rnd.nextInt(groups.size)),
        Long.box(rnd.nextInt(5).toLong))))
      liveD2 ++= initD2
      val initF = (1 to 4 + rnd.nextInt(5)).map(_ => rnd.nextLong(1000))
      putF(initF.map(randomFRow)); liveF ++= initF
      GraftSql.sql(spark, ddl).collect()
      assert(served() == scratch(),
        s"star seed $seed POPULATE parity failed\n$ddl")
      (1 to 3 + rnd.nextInt(3)).foreach { wave =>
        (1 to 1 + rnd.nextInt(4)).foreach(_ => mutate())
        GraftSql.sql(spark, s"REFRESH MATERIALIZED VIEW mv_fzs$seed")
          .collect()
        val (got, want) = (served(), scratch())
        assert(got == want,
          s"star seed $seed wave $wave parity failed:\n got $got\n" +
            s"want $want\ndef: $ddl\nliveF: $liveF " +
            s"liveD1: $liveD1 liveD2: $liveD2")
      }
      GraftSql.sql(spark, s"DROP MATERIALIZED VIEW mv_fzs$seed").collect()
    } finally {
      GraftServer.unregister(ftbl)
      GraftServer.unregister(d1tbl); GraftServer.unregister(d2tbl)
      GraftMatviews.reset()
    }
  }

  test("star-form IVM parity fuzz: 8 seeded random two-dim scenarios — " +
      "independent INNER/LEFT per spoke, an expression aggregate " +
      "reading the second dim, three mutation streams — match " +
      "from-scratch recomputes at every refresh") {
    (1 to 8).foreach(runStarScenario)
  }
}
