package graft.bitemporal

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN aggregate view over TWO bitemporal tx
  * logs — COUNT(*)/COUNT(col)/SUM (and read-derived AVG) per group of
  * `fact ⋈ dim ON fact.fk = dim._id` at a fixed bitemporal basis,
  * optionally filtered by a row-local deterministic WHERE over either
  * side's columns, kept current from the two logs' TAILS by the
  * classic join-IVM delta rules:
  *
  *   Δ(A ⋈ B) = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB
  *
  * expressed here with the bitemporal twist that "Δ per table" is
  * (visible contribution after) − (visible contribution before) for
  * the rows the tail touches — and for a join, "touched" propagates
  * across the join edge: a fact row is affected when ITS OWN id has
  * tail ops OR its fk references a dim id with tail ops (the dim-side
  * group-move case: updating one dim row re-groups every fact that
  * points at it, with no fact op at all).
  *
  * Cost model (the honest 100 TB statement):
  *   - fact-side refresh work ∝ tail ops + fact rows referencing
  *     touched dim ids. The latter ships as a LITERAL `fk IN (touched
  *     dims)` predicate when the touched set is ≤
  *     [[JoinMatview.MaxInlineDimIds]] (pushed to the fact base's
  *     parquet scan — FILE-level pruning when the base is fk-clustered
  *     via `GraftTable(clusterBy = Seq(fk))` / `TxLog.compact*`'s
  *     `clusterBy`), degrading to a semi-join for huge dim churn;
  *     either way never a full recompute of the view;
  *   - dim-side work ∝ one dim relation scan (dims are the small side
  *     by construction — AQE broadcasts them into the join);
  *   - state writes ∝ touched groups (hash-bucketed, only affected
  *     buckets rewritten — temp-write + per-bucket directory swap,
  *     same as [[Matview]]);
  *   - the only data-dependent collect is the affected bucket ids
  *     (≤ nBuckets longs).
  *
  * MIN/MAX (over FACT measure columns) follow [[Matview]]'s documented
  * fallback, with the join twist: extremes are not self-maintainable
  * under either table's deletes/updates OR a dim group-move (the old
  * group may lose its extreme with zero fact ops), so each refresh
  * recomputes extremes for the TOUCHED GROUPS ONLY by re-deriving
  * their member facts ACROSS THE JOIN at the basis — fact ⋈ dim
  * semi-joined to the touched group keys, group predicate applied on
  * whichever side carries the group column. A COUNT/SUM-only view
  * never pays that joined re-read — refresh stays ∝ the tails.
  * Exact-typed sum columns (integral/DECIMAL) give bit parity with a
  * from-scratch recompute, as with [[Matview]].
  *
  * Truncation of EITHER log permanently switches refresh to the exact
  * rebuild-from-state path (incremental deltas need full op history
  * for touched ids), mirroring [[Matview]]'s retention tradeoff.
  */
final class JoinMatview private[graft] (
    spark: SparkSession,
    factLog: TxLog, factCols: Seq[String],
    dimLog: TxLog, dimCols: Seq[String],
    stateRoot: Path, fkCol: String, groupCols: Seq[String], sumCols: Seq[String],
    validAt: Timestamp, nBuckets: Int,
    minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
    cntCols: Seq[String] = Nil, whereSql: Option[String] = None,
    derived: Seq[(String, String)] = Nil) {
  require(factCols.contains(fkCol), s"fk column $fkCol must be a fact payload column")
  // DERIVED columns (name -> row-local deterministic SQL expression,
  // referencing EITHER side) are computed on the joined relation right
  // after the sieve — they commute with the Δ(A⋈B) rules for the same
  // reason the WHERE does: "touched" already propagates across the
  // join edge, and an untouched row's derived value is identical on
  // both sides of the delta
  private val derivedNames = derived.map(_._1)
  private val aggable = factCols ++ dimCols ++ derivedNames
  require(sumCols.forall(c => factCols.contains(c) || derivedNames.contains(c)),
    s"sum columns $sumCols must be fact payload or derived columns")
  require((minCols ++ maxCols).forall(c =>
      factCols.contains(c) || derivedNames.contains(c)),
    s"min/max columns ${minCols ++ maxCols} must be fact payload or derived columns")
  // COUNT(col) counts the JOINED relation's non-null cells, so the
  // column may live on either side (payload names are disjoint)
  require(cntCols.forall(aggable.contains),
    s"count columns $cntCols must be payload or derived columns")
  require(groupCols.nonEmpty, "at least one group column")
  groupCols.foreach(g => require(aggable.contains(g),
    s"group column $g must be a payload or derived column of either table"))
  require((factCols.toSet & dimCols.toSet).isEmpty,
    s"fact/dim payload names must be disjoint: ${factCols.toSet & dimCols.toSet}")
  require(nBuckets > 0, "nBuckets must be positive")

  private val dataDir = stateRoot.resolve("state")
  private val wmFile = stateRoot.resolve("_watermark")
  private val sysProbe = Timestamp.valueOf("9998-01-01 00:00:00")

  /** (fact, dim) tx watermarks folded into the state; (-1, -1) fresh. */
  def watermarks: (Long, Long) =
    if (Files.exists(wmFile)) {
      val parts = new String(Files.readAllBytes(wmFile), UTF_8).trim
        .split(" ")
      (parts(0).toLong, parts(1).toLong)
    } else (-1L, -1L)

  private def setWatermarks(a: Long, b: Long): Unit = {
    Files.createDirectories(stateRoot)
    val tmp = stateRoot.resolve("_watermark.tmp")
    Files.write(tmp, s"$a $b".getBytes(UTF_8))
    Files.move(tmp, wmFile,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  private def sumAlias(c: String) = s"sum_$c"
  private def minAlias(c: String) = s"min_$c"
  private def maxAlias(c: String) = s"max_$c"
  private def cntAlias(c: String) = s"cnt_$c"
  private def mmAliases: Seq[String] =
    minCols.map(minAlias) ++ maxCols.map(maxAlias)
  private def mmAggs =
    minCols.map(c => min(col(c)).as(minAlias(c))) ++
      maxCols.map(c => max(col(c)).as(maxAlias(c)))
  // per-column NON-NULL counters over the JOINED relation — they delta
  // exactly like n does (a null cell never contributes), so they ride
  // the same self-maintainable path; AVG = sum/cnt at read time
  private def cntAggs =
    cntCols.map(c => count(col(c)).as(cntAlias(c)))

  /** Columns the WHERE and the derived expressions reference
    * (unresolved parse — resolution and the deterministic/row-local
    * checks happen at DDL validation): they must survive the side
    * projections so the post-join sieve/derivation sees them. */
  private def refsOf(sql: String): Set[String] =
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(sql).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.last.toLowerCase
      }.toSet
  private val rowLocalRefs: Set[String] =
    whereSql.map(refsOf).getOrElse(Set.empty) ++
      derived.flatMap(d => refsOf(d._2))

  /** The maintained relation is the FILTERED join when the view
    * declares a WHERE. A row-local deterministic predicate commutes
    * with the Δ(A⋈B) rules because "touched" already propagates across
    * the join edge: a fact row whose predicate INPUT can have changed
    * is either own-id-touched (fact columns) or references a touched
    * dim (dim columns) — both re-derive old and new contributions with
    * the predicate applied, and an untouched row's predicate value is
    * identical on both sides of the delta. */
  private def sieve(joined: DataFrame): DataFrame =
    whereSql.map(w => joined.filter(expr(w))).getOrElse(joined)

  /** Sieve, then attach the derived expression columns — the full
    * row-local preparation every aggregation path shares. */
  private def prep(joined: DataFrame): DataFrame =
    derived.foldLeft(sieve(joined)) { case (d, (n, e)) =>
      d.withColumn(n, expr(e))
    }

  // single-column formula bit-identical to pre-r12 (existing state
  // dirs keep their bucket assignment); multi-column keys concat
  private def groupKeyStr = {
    val parts = groupCols.map(c =>
      coalesce(col(c).cast("string"), lit("\\u0000:null-group")))
    if (parts.size == 1) parts.head else concat_ws("\u0001", parts: _*)
  }
  private def bucketCol =
    pmod(xxhash64(groupKeyStr), lit(nBuckets.toLong))

  private def readTx(files: Seq[Path]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(files.map(_.toString): _*)

  private def lastOf(log: TxLog): Long =
    (log.txFiles().map(_.getFileName.toString
      .stripPrefix("tx_").stripSuffix(".parquet").toLong) ++
      log.truncatedUpTo()).maxOption.getOrElse(-1L)

  /** Visible rows of one side at the basis, projected to the columns
    * the join needs (side-tagged id, so the join has no name clash). */
  private def project(v: DataFrame, idAs: String,
                      keep: Seq[String]): DataFrame =
    v.select(col("_id").cast("long").as(idAs) +: keep.map(col): _*)

  // all visible relations are pinned to the tx ids the refresh will
  // RECORD as its watermarks: a tx committing concurrently must stay
  // wholly in the next refresh, or it would fold into state now AND
  // again later (the double-count race — found by review)
  private def visibleFact(upToTx: Long): DataFrame =
    Bitemporal.asOf(factLog.readAllAuto(spark, factCols, upToTx),
      lit(validAt), lit(sysProbe))
  private def visibleDim(upToTx: Long): DataFrame =
    Bitemporal.asOf(dimLog.readAllAuto(spark, dimCols, upToTx),
      lit(validAt), lit(sysProbe))

  private def factKeep: Seq[String] =
    (Seq(fkCol) ++ (sumCols ++ minCols ++ maxCols)
        .filter(factCols.contains) ++
      cntCols.filter(factCols.contains) ++
      factCols.filter(c => rowLocalRefs.contains(c.toLowerCase)) ++
      groupCols.filter(factCols.contains)).distinct
  private def dimKeep: Seq[String] =
    (cntCols.filter(dimCols.contains) ++
      dimCols.filter(c => rowLocalRefs.contains(c.toLowerCase)) ++
      groupCols.filter(dimCols.contains)).distinct

  /** fact ⋈ dim on fk = dim id, sieved by the declared WHERE, then the
    * per-group COUNT/SUM/COUNT(col) — `withMm` adds MIN/MAX aggregates,
    * valid only over a COMPLETE member relation (full build,
    * touched-group re-read), never over a delta: extremes don't
    * subtract. */
  private def joinAgg(fact: DataFrame, dim: DataFrame,
                      withMm: Boolean = false): DataFrame =
    prep(fact.join(dim, col(fkCol).cast("long") === col("_dim_id")))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c)).as(sumAlias(c))) ++ cntAggs ++
          (if (withMm) mmAggs else Nil): _*)

  /** Exact full recompute → state (first build, or after truncation of
    * either log). Same temp-write + swap as [[Matview]]. */
  private def rebuild(lastA: Long, lastB: Long): (Long, Long) = {
    val agg = joinAgg(project(visibleFact(lastA), "_fact_id", factKeep),
        project(visibleDim(lastB), "_dim_id", dimKeep), withMm = true)
      .withColumn("_bucket", bucketCol)
    val tmp = stateRoot.resolve("state_rebuild_tmp")
    TxLog.deleteRecursively(tmp.toFile)
    // schema sidecar: a join that matches nothing writes a file-less
    // parquet dir — without the pinned schema every later read throws
    MvState.writeSchema(stateRoot, agg)
    agg.repartition(col("_bucket"))
      .write.mode("overwrite").partitionBy("_bucket").parquet(tmp.toString)
    val old = stateRoot.resolve("state_rebuild_old")
    TxLog.deleteRecursively(old.toFile)
    if (Files.exists(dataDir)) { Files.move(dataDir, old): Unit }
    Files.move(tmp, dataDir): Unit
    TxLog.deleteRecursively(old.toFile)
    setWatermarks(lastA, lastB)
    (lastA, lastB)
  }

  /** Fold both logs' tails into the state; returns the new watermarks. */
  def refresh(): (Long, Long) = MaintainerLease.withLease(
      Seq(java.nio.file.Paths.get(factLog.dir),
        java.nio.file.Paths.get(dimLog.dir)), "join-matview-refresh") {
    val (wA, wB) = watermarks
    val (lastA, lastB) = (lastOf(factLog), lastOf(dimLog))
    if (lastA <= wA && lastB <= wB) return (wA, wB)
    // the view first builds once BOTH logs hold data (an inner join
    // with an empty side is empty — nothing to materialize yet)
    if (lastA < 0 || lastB < 0) return (wA, wB)
    if (factLog.truncatedUpTo().isDefined || dimLog.truncatedUpTo().isDefined ||
      wA < 0 || !Files.exists(dataDir))
      return rebuild(lastA, lastB)

    // touched ids per side (tail-sized), bounded to the recorded
    // watermarks — same snapshot discipline as the visibles
    def idOf(p: java.nio.file.Path): Long = p.getFileName.toString
      .stripPrefix("tx_").stripSuffix(".parquet").toLong
    val ta = if (lastA > wA)
      readTx(factLog.txFilesAfter(wA).filter(idOf(_) <= lastA))
        .select(col("_id").cast("long").as("_t_id")).distinct()
    else spark.range(0).select(col("id").as("_t_id"))
    val tb = if (lastB > wB)
      readTx(dimLog.txFilesAfter(wB).filter(idOf(_) <= lastB))
        .select(col("_id").cast("long").as("_t_id")).distinct()
    else spark.range(0).select(col("id").as("_t_id"))

    // OLD visible rows of the touched ids: re-fold their own op history
    // up to the watermark (the same point-read shape Matview uses)
    def oldTouched(log: TxLog, cols: Seq[String], touched: DataFrame,
                   w: Long): DataFrame = {
      val all = readTx(log.txFiles().filter(idOf(_) <= w))
      val hist = all.join(touched,
        all("_id").cast("long") === touched("_t_id"), "left_semi")
      Bitemporal.asOf(Bitemporal.fold(hist.filter(col("_tx_id") <= w), cols),
        lit(validAt), lit(sysProbe))
    }
    def semiOn(df: DataFrame, key: Column, ids: DataFrame): DataFrame =
      df.join(ids, key === ids("_t_id"), "left_semi")
    def antiOn(df: DataFrame, key: Column, ids: DataFrame): DataFrame =
      df.join(ids, key === ids("_t_id"), "left_anti")

    val vaNew = project(visibleFact(lastA), "_fact_id", factKeep)
    val vbNew = project(visibleDim(lastB), "_dim_id", dimKeep)
    val vaOldT = project(oldTouched(factLog, factCols, ta, wA),
      "_fact_id", factKeep)
    // dim OLD relation: untouched dims unchanged; touched dims re-folded
    val vbOld = antiOn(vbNew, col("_dim_id"), tb)
      .unionByName(project(oldTouched(dimLog, dimCols, tb, wB),
        "_dim_id", dimKeep))

    // affected fact rows: own id touched, or fk references a touched dim.
    // The dim-touched predicate ships as a LITERAL In when the touched
    // dim set is small (the overwhelmingly common case — dim churn per
    // refresh interval): a literal In pushes down to the fact base's
    // parquet scan, so an fk-clustered base (TxLog/GraftTable clusterBy)
    // prunes fact files by footer stats instead of scanning the table —
    // a semi-join, by contrast, never reaches the scan. Past the inline
    // cap it degrades to the semi-join (correct either way).
    val tbIds: Option[Seq[Long]] =
      if (lastB <= wB) Some(Nil) // no dim tail: skip the probe job
      else {
        val probe = tb.limit(JoinMatview.MaxInlineDimIds + 1)
          .collect().map(_.getLong(0)).toSeq
        if (probe.size <= JoinMatview.MaxInlineDimIds) Some(probe) else None
      }
    def dimTouched(df: DataFrame): DataFrame = tbIds match {
      case Some(Seq()) => df.limit(0)
      case Some(ids) => df.filter(col(fkCol).cast("long").isin(ids: _*))
      case None => semiOn(df, col(fkCol).cast("long"), tb)
    }
    val affNew = semiOn(vaNew, col("_fact_id"), ta)
      .unionByName(dimTouched(antiOn(vaNew, col("_fact_id"), ta)))
    val affOld = vaOldT // own id touched: every old version is affected
      .unionByName(dimTouched(antiOn(vaNew, col("_fact_id"), ta)))

    val newC = joinAgg(affNew, vbNew)
    val oldC = joinAgg(affOld, vbOld)
    // the state's sum types are pinned to the plain aggregate's types:
    // uncapped, each merge's +/- widens decimal precision by one until
    // the parquet byte width no longer matches older bucket files
    // (FIXED_LEN_BYTE_ARRAY grows at p=23 and p=26) and reads fail
    val sumT: Map[String, org.apache.spark.sql.types.DataType] =
      sumCols.map(c => sumAlias(c) ->
        newC.schema(sumAlias(c)).dataType).toMap
    val o = oldC.as("o"); val nw = newC.as("n")
    val dKey = groupCols.map(g =>
      col(s"n.$g") <=> col(s"o.$g")).reduce(_ && _)
    val delta = nw.join(o, dKey, "full_outer")
      .select(
        (groupCols.map(g =>
          coalesce(col(s"n.$g"), col(s"o.$g")).as(g)) :+
          (coalesce(col("n.n"), lit(0L)) - coalesce(col("o.n"), lit(0L)))
            .as("n")) ++
          sumCols.map { c =>
            val a = sumAlias(c)
            (coalesce(col(s"n.$a"), lit(0)) - coalesce(col(s"o.$a"), lit(0)))
              .cast(sumT(a)).as(a)
          } ++ cntCols.map { c =>
            val a = cntAlias(c)
            (coalesce(col(s"n.$a"), lit(0L)) - coalesce(col(s"o.$a"), lit(0L)))
              .as(a)
          }: _*)
      .withColumn("_bucket", bucketCol)
    // the delta feeds the affected-bucket collect, the state merge AND
    // (for min/max views) the touched-group set — checkpoint it once
    // (rows ∝ touched groups) so the Δ(A⋈B) pipeline upstream runs one
    // time, not once per consumer
    if (JoinMatview.capturePlans) JoinMatview.capturedPlans.synchronized {
      JoinMatview.capturedPlans +=
        delta.queryExecution.executedPlan.toString: Unit
    }
    val (deltaCp, deltaRows) = org.apache.spark.sql.graftbridge.RddBridge
      .localCheckpointWithCount(delta)
    val affected: Seq[Long] =
      if (deltaRows == 0L) Nil
      else deltaCp.select(col("_bucket")).distinct()
        .collect().map(_.getLong(0)).toSeq
    if (affected.isEmpty) { setWatermarks(lastA, lastB); return (lastA, lastB) }

    val state = MvState.readState(spark, stateRoot, dataDir)
      .filter(col("_bucket").isin(affected: _*))
    val s = state.as("s"); val d = deltaCp.as("d")
    val mKey = groupCols.map(g =>
      col(s"s.$g") <=> col(s"d.$g")).reduce(_ && _)
    val countSum = s.join(d, mKey, "full_outer")
      .select(
        groupCols.map(g =>
          coalesce(col(s"s.$g"), col(s"d.$g")).as(g)) ++
          ((coalesce(col("s.n"), lit(0L)) + coalesce(col("d.n"), lit(0L)))
            .as("n") +:
          (sumCols.map { c =>
            val a = sumAlias(c)
            (coalesce(col(s"s.$a"), lit(0)) + coalesce(col(s"d.$a"), lit(0)))
              .cast(sumT(a)).as(a)
          } ++ cntCols.map { c =>
            val a = cntAlias(c)
            (coalesce(col(s"s.$a"), lit(0L)) + coalesce(col(s"d.$a"), lit(0L)))
              .as(a)
          } ++
            // state's min/max ride along for groups in an affected
            // bucket that this refresh does NOT touch (null for brand
            // new groups — every new group is touched, so the re-read
            // below always overwrites it)
            mmAliases.map(a => col(s"s.$a").as(a)) :+
          coalesce(col("s._bucket"), col("d._bucket")).as("_bucket"))): _*)
      .filter(col("n") > 0) // group left the join entirely
    // MIN/MAX fallback, crossed over the join (the classic IVM
    // restriction plus the group-move case: a dim relocation can strip
    // the OLD group's extreme with zero fact ops): the TOUCHED GROUPS —
    // and only those — re-derive their member facts by re-joining at
    // the basis and recompute extremes from scratch. COUNT/SUM-only
    // views skip all of this, keeping refresh ∝ the tails.
    val merged =
      if (mmAliases.isEmpty) countSum
      else {
        val touchedGroups = deltaCp
          .select(groupCols.map(col): _*).distinct()
        // the member relation for extremes is the SIEVED join (a row
        // outside the WHERE is not a member and must not donate a
        // min/max), with derived columns attached — extremes may be
        // over an expression
        val full = prep(vaNew.join(vbNew,
          col(fkCol).cast("long") === col("_dim_id")))
        val semiKey = groupCols.map(g =>
          col(s"f.$g") <=> col(s"tg.$g")).reduce(_ && _)
        val mm = full.as("f").join(touchedGroups.as("tg"),
            semiKey, "left_semi")
          .groupBy(groupCols.map(col): _*)
          .agg(mmAggs.head, mmAggs.tail: _*)
          .select(groupCols.map(col) ++ (lit(true).as("_mm") +:
            mmAliases.map(a => col(a).as(s"_r_$a"))): _*)
        val rKey = groupCols.map(g =>
          col(s"m.$g") <=> col(s"r.$g")).reduce(_ && _)
        val mrg = countSum.as("m").join(mm.as("r"), rKey, "left")
        mrg.select(
          (groupCols.map(g => col(s"m.$g").as(g)) :+ col("m.n").as("n")) ++
            (sumCols.map(c => col(s"m.${sumAlias(c)}").as(sumAlias(c))) ++
              cntCols.map(c => col(s"m.${cntAlias(c)}").as(cntAlias(c))) ++
              // the _mm flag (not coalesce) decides: a touched group
              // whose recomputed extreme is legitimately NULL (all
              // values null) must not fall back to the stale state
              mmAliases.map(a =>
                when(col("_mm") === true, col(s"_r_$a"))
                  .otherwise(col(s"m.$a")).as(a)) :+
            col("m._bucket").as("_bucket")): _*)
      }
    MvState.swapBuckets(stateRoot, dataDir, merged, affected)
    setWatermarks(lastA, lastB)
    (lastA, lastB)
  }

  /** The maintained view: (group, n, sum_*) — read-only, no recompute. */
  def read(): DataFrame = read(spark)

  /** [[read]] bound to an EXPLICIT session (see [[Matview.read]]). */
  def read(session: SparkSession): DataFrame =
    MvState.readState(session, stateRoot, dataDir).drop("_bucket")
}

object JoinMatview {
  /** Touched-dim sets up to this size inline as a literal In predicate
    * (pushes to the fact scan → file pruning on an fk-clustered base);
    * larger sets fall back to the semi-join. ~10k longs is metadata-
    * sized on the driver, same class as the affected-bucket collect. */
  private[bitemporal] val MaxInlineDimIds = 10000

  /** Test hook: the delta executes as a bare RDD checkpoint job (no
    * QueryExecutionListener event), so the pruning spec captures its
    * physical plan here instead. Off (zero cost) outside tests. */
  @volatile private[bitemporal] var capturePlans = false
  private[bitemporal] val capturedPlans =
    scala.collection.mutable.Buffer.empty[String]
}
