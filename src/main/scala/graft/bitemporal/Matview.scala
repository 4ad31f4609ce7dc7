package graft.bitemporal

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate view over a bitemporal tx log —
  * COUNT/SUM (and anything derivable: AVG) per group at a FIXED
  * bitemporal basis, kept current by folding only the log TAIL into
  * stored per-group state instead of recomputing the aggregate.
  *
  * Classic self-maintainable IVM, shaped for the 100 TB tier:
  *
  *   - refresh work ∝ the tail: tail tx files are file-pruned by the
  *     watermark (never listed, let alone read, for old txs); the
  *     touched ids' PRIOR contribution re-folds only their history
  *     rows (sargable `_id` semi-join over the sorted, bloom-filtered
  *     log — the same point-read path `entity()` uses);
  *   - state writes ∝ touched GROUPS: state is hash-bucketed on the
  *     group key and only buckets holding a changed group are
  *     rewritten (temp-write + directory swap, the
  *     [[TxLog.compactIncremental]] pattern) — a refresh that touches
  *     3 groups rewrites ≤ 3 of [[nBuckets]] bucket directories;
  *   - no driver-side data: the only collects are the affected bucket
  *     ids (≤ nBuckets longs) and the watermark.
  *
  * The basis (`validAt`, system = latest) is fixed at construction so
  * incrementality is sound: a row's visibility at the basis changes
  * only through new transactions, never through wall-clock drift.
  * COUNT/SUM are self-maintainable; MIN/MAX are NOT under
  * deletes/updates (the classic IVM restriction) and are served by the
  * documented fallback: each refresh recomputes extremes for the
  * TOUCHED GROUPS ONLY by re-reading their member rows at the basis
  * (group predicate pushed into the base scan). A COUNT/SUM-only view
  * never pays that read — refresh stays ∝ tail.
  * For exact parity with a from-scratch recompute use exact-typed sum
  * columns (integral/DECIMAL): incremental float sums differ from
  * recomputed ones in the last bits, decimals never do.
  */
final class Matview private[graft] (
    spark: SparkSession, log: TxLog, stateRoot: Path,
    payloadCols: Seq[String], groupCols: Seq[String], sumCols: Seq[String],
    validAt: Timestamp, nBuckets: Int,
    minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
    cntCols: Seq[String] = Nil, whereSql: Option[String] = None,
    derived: Seq[(String, String)] = Nil,
    distincts: Seq[MvDistinct] = Nil,
    bucketCols: Seq[String] = Nil,
    hllCols: Seq[String] = Nil,
    rangeLayout: Boolean = false,
    pcts: Seq[MvPct] = Nil) {
  require(groupCols.nonEmpty, "at least one group column")
  // the state's bucket hash normally covers the whole group key; an aux
  // pair view buckets on the PARENT view's group prefix instead (see
  // MvDistinct's contract) — any non-default key must be a subset of
  // the group columns (a bucket must be a function of the group key)
  private val bucketKeyCols =
    if (bucketCols.isEmpty) groupCols else bucketCols
  require(bucketKeyCols.forall(groupCols.contains),
    s"bucket key $bucketKeyCols must be a subset of group columns $groupCols")
  // a range layout partitions state by groupCols.head's VALUE, but the
  // _schema sidecar stamps GroupsKey from bucketKeyCols — MvBucketPrune
  // translates predicates on GroupsKey.head, so the two MUST agree or
  // pruning would be unsound (the DDL always satisfies this; the guard
  // closes the private-API hole)
  require(!rangeLayout || bucketKeyCols.head == groupCols.head,
    s"layout = 'range' requires the bucket key to lead with the " +
      s"leading group column (got ${bucketKeyCols.headOption} vs " +
      s"${groupCols.head})")
  // DERIVED columns (name -> row-local deterministic SQL expression
  // over the payload) extend the aggregable surface to expression
  // aggregates — SUM(a*b) maintains exactly like SUM(c) because the
  // expression commutes with the Δ-rules for the same reason the WHERE
  // sieve does: an untouched row's derived value is identical on both
  // sides of the delta
  private val aggable = payloadCols ++ derived.map(_._1)
  require(sumCols.forall(aggable.contains),
    s"sum columns $sumCols must be payload or derived columns $aggable")
  require((minCols ++ maxCols).forall(aggable.contains),
    s"min/max columns ${minCols ++ maxCols} must be payload or derived columns $aggable")
  require(cntCols.forall(aggable.contains),
    s"count columns $cntCols must be payload or derived columns $aggable")
  require(hllCols.forall(aggable.contains),
    s"approx-distinct columns $hllCols must be payload or derived columns $aggable")
  require(pcts.forall(p => aggable.contains(p.arg)),
    s"percentile columns ${pcts.map(_.arg)} must be payload or derived columns $aggable")
  pcts.foreach(p => require(p.p >= 0.0 && p.p <= 1.0,
    s"percentile fraction ${p.p} must be in [0, 1]"))
  require(nBuckets > 0, "nBuckets must be positive")

  private val dataDir = stateRoot.resolve("state")
  private val wmFile = stateRoot.resolve("_watermark")
  // "system = latest" probe: any timestamp beyond every real system
  // time selects exactly the open (_system_to = ∞) rectangles
  private val sysProbe = Timestamp.valueOf("9998-01-01 00:00:00")

  /** Last tx id folded into the state, -1 before the first refresh. */
  def watermark: Long =
    if (Files.exists(wmFile))
      new String(Files.readAllBytes(wmFile), UTF_8).trim.toLong
    else -1L

  private def setWatermark(w: Long): Unit = {
    Files.createDirectories(stateRoot)
    val tmp = stateRoot.resolve("_watermark.tmp")
    Files.write(tmp, w.toString.getBytes(UTF_8))
    Files.move(tmp, wmFile,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Is the state CURRENT — would a refresh be a no-op? True when
    * neither a tx file nor a truncation point exists past the recorded
    * watermark, i.e. the served state equals what a refresh right now
    * would serve. One log directory listing, no data read — the
    * aggregate-navigation freshness gate ([[graft.server.GraftMvNav]]),
    * checked per candidate query. */
  def isFresh: Boolean = {
    def fid(p: Path): Long = p.getFileName.toString
      .stripPrefix("tx_").stripSuffix(".parquet").toLong
    (log.txFiles().map(fid) ++ log.truncatedUpTo())
      .maxOption.getOrElse(-1L) <= watermark
  }

  private def sumAlias(c: String) = s"sum_$c"
  private def minAlias(c: String) = s"min_$c"
  private def maxAlias(c: String) = s"max_$c"
  private def cntAlias(c: String) = s"cnt_$c"
  private def hllAlias(c: String) = s"hll_$c"
  // APPROX_COUNT_DISTINCT state: one mergeable DataSketches HLL sketch
  // (binary) per group — state ∝ groups where the exact pair-level
  // alternative is ∝ distinct (group, value) pairs. Sketches cannot
  // subtract, so they ride the SAME lifecycle as MIN/MAX: recomputed
  // for the TOUCHED GROUPS from their member rows at every refresh
  // (never merged incrementally) — which makes deletes/updates EXACT
  // for the sketch's own semantics: the stored sketch always describes
  // exactly the current members, no lingering tombstoned values.
  // MEDIAN/PERCENTILE_CONT (exact) and APPROX_PERCENTILE state: the
  // per-group percentile VALUE (double), recomputed for the TOUCHED
  // GROUPS from their member rows at every refresh — percentiles, like
  // extremes, are not self-maintainable under deletes/updates, so they
  // ride the same lifecycle as MIN/MAX. Exact percentile buffers one
  // touched group's values per task (fine for the recompute's member
  // slice; a group with billions of members should use the approx
  // form, whose t-digest memory is bounded by its accuracy knob).
  private def mmAliases: Seq[String] =
    minCols.map(minAlias) ++ maxCols.map(maxAlias) ++ hllCols.map(hllAlias) ++
      pcts.map(_.alias)
  private def mmAggs =
    minCols.map(c => min(col(c)).as(minAlias(c))) ++
      maxCols.map(c => max(col(c)).as(maxAlias(c))) ++
      hllCols.map(c => hll_sketch_agg(col(c)).as(hllAlias(c))) ++
      pcts.map(p => p.agg.as(p.alias))
  // COUNT(col) = per-column NON-NULL counter — self-maintainable the
  // same way n is (a delta subtracts like a count does; null cells
  // simply never contribute)
  private def cntAggs =
    cntCols.map(c => count(col(c)).as(cntAlias(c)))

  /** The maintained relation is the FILTERED visible relation when the
    * view declares a WHERE (a row-local deterministic predicate
    * commutes with the Δ-rules — a tail row that leaves or enters the
    * predicate behaves exactly like a delete or insert), with the
    * derived expression columns attached — [[MvState.prep]], shared
    * with [[JoinMatview]]. */
  private def prep(visible: DataFrame): DataFrame =
    MvState.prep(visible, whereSql, derived)

  // timezone-aware expressions make incremental refresh
  // session-timezone-sensitive — see MvState.pinTimeZone. Beyond
  // WHERE/derived expressions, a TIMESTAMP-typed group column is
  // sensitive through the bucket hash itself (the key casts to string,
  // and timestamp rendering reads the session zone) — its type is read
  // from the given schema (state sidecar, or the aggregate's own).
  private def tzSensitive(schema: org.apache.spark.sql.types.StructType)
      : Boolean =
    whereSql.nonEmpty || derived.nonEmpty ||
      groupCols.exists(g => schema.find(_.name == g).exists(
        _.dataType.typeName.startsWith("timestamp")))

  /** Stable fingerprint of the view DEFINITION — see MvState.pinDef.
    * The distinct-rollup and bucket-key parts append ONLY when
    * non-default, keeping every pre-existing plain view's fingerprint
    * (and thus its state) intact across the upgrade; a view that GAINS
    * rollup columns or changes its bucket key must rebuild (its state
    * schema/layout changes). */
  private val defFp: String = {
    val extras =
      (if (distincts.nonEmpty)
        Seq("dist:" + distincts.map(d =>
          d.arg + (if (d.needSum) "+s" else "")).mkString(","))
      else Nil) ++
      (if (bucketKeyCols != groupCols)
        Seq("bkey:" + bucketKeyCols.mkString(",")) else Nil) ++
      (if (hllCols.nonEmpty) Seq("hll:" + hllCols.mkString(",")) else Nil) ++
      (if (rangeLayout) Seq("layout:range") else Nil) ++
      (if (pcts.nonEmpty) Seq("pct:" + pcts.map(_.fpPart).mkString(","))
       else Nil)
    val parts = Seq(payloadCols, groupCols, sumCols, minCols, maxCols,
      cntCols, Seq(whereSql.getOrElse("")),
      derived.map(d => d._1 + "=" + d._2),
      Seq(validAt.toString, nBuckets.toString)) ++
      (if (extras.nonEmpty) Seq(extras) else Nil)
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.map(_.mkString("\u0001")).mkString("\u0002")
        .getBytes(UTF_8)).map(b => f"$b%02x").mkString
  }

  private def bucketCol =
    if (rangeLayout) MvState.rangeBucketCol(groupCols.head)
    else MvState.bucketCol(bucketKeyCols, nBuckets)
  private def ddAliases: Seq[String] = MvState.distinctAliases(distincts)

  /** `layout = range` partitions state by the LEADING group column's
    * VALUE — dir-level pruning for range predicates on time-keyed
    * rollups. Only lexicographically-ordered keys are sound (dir names
    * compare as strings), so any non-string leading key refuses. */
  private def checkRangeKey(schema: org.apache.spark.sql.types.StructType)
      : Unit =
    if (rangeLayout) MvState.checkRangeKey(schema, groupCols.head)

  /** Pin every DISTINCT aux to exactly the watermark this refresh will
    * record, so the rollup below reads pair state at the same log
    * prefix the main state describes. `shared` hands the aux the main
    * refresh's already-derived (touched, old/new rectangle) relations —
    * the aux aggregates the SAME table at the SAME watermarks, so
    * re-deriving them would re-fold the tail once per DISTINCT
    * argument (r16, guide §2.3). */
  private def syncAuxes(last: Long,
                        shared: Option[MvShared] = None): Unit =
    distincts.foreach(_.refreshAuxTo(Seq(last), shared))

  private def readTx(files: Seq[Path]): DataFrame =
    TxLog.readMerged(spark, files.map(_.toString))

  /** Per-group COUNT/SUM contribution of an already-folded RECTANGLE
    * relation at the view's basis — the self-maintainable part, used on
    * both sides of the delta (the old side folds once and is
    * checkpointed; the new side derives from it by fold-from-state). */
  private def contribRect(rect: DataFrame): DataFrame =
    prep(Bitemporal.asOf(rect, lit(validAt), lit(sysProbe)))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c)).as(sumAlias(c))) ++ cntAggs: _*)

  /** Full per-group aggregate INCLUDING min/max — only valid over a
    * COMPLETE visible relation (first build, truncation rebuild), never
    * over a delta: min/max don't subtract. Takes a PREPPED relation
    * (sieve + derived already applied) so the mm touched-group path can
    * semi-join on derived group keys before aggregating. */
  private def fullAgg(prepped: DataFrame): DataFrame =
    prepped.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c)).as(sumAlias(c))) ++ cntAggs ++ mmAggs: _*)

  /** Rebuild the whole state from the RECTANGLE relation (base +
    * tail via the persisted base watermark) — the path that stays
    * correct when the log has been TRUNCATED ([[TxLog.truncate]]): the
    * incremental delta needs touched ids' full op history, which a
    * truncated log no longer has; the rectangles still determine the
    * view exactly. Cost = one full view recompute — the documented
    * price of retention, paid only on the first refresh after a
    * truncation advances past this view's watermark. */
  private def rebuildFromState(last: Long): Long = {
    // upToTx pins the fold to the watermark being recorded — a tx
    // committing mid-rebuild must stay ABOVE the watermark (it would
    // otherwise fold into state now and again on the next refresh)
    val visible = Bitemporal.asOf(
      log.readAllAuto(spark, payloadCols, upToTx = last),
      lit(validAt), lit(sysProbe))
    syncAuxes(last)
    val agg = MvState.attachDistinctFull(
      fullAgg(prep(visible)).withColumn("_bucket", bucketCol),
      groupCols, distincts, spark)
    checkRangeKey(agg.schema)
    if (rangeLayout) MvState.checkRangeBuild(agg,
      MvState.rangeLeadKind(agg.schema, groupCols.head), "rebuild into")
    // temp-write + directory swap (same pattern as the incremental
    // path): a concurrent read() sees either the complete old state or
    // the complete new one — never a partial overwrite-in-place — with
    // ONE caveat: POSIX cannot atomically exchange two directories, so
    // a read landing exactly between the two renames below fails with
    // path-not-found (a retryable error, not wrong data). A crash in
    // that window self-heals: rebuildFromState derives everything from
    // the rectangles, never from prior state, so the next refresh
    // (watermark still behind) rebuilds from scratch.
    val tmp = stateRoot.resolve("state_rebuild_tmp")
    TxLog.deleteRecursively(tmp.toFile)
    MvState.writeSchema(stateRoot, agg, bucketKeyCols, nBuckets, rangeLayout)
    MvState.writeState(agg, groupCols, tmp, nBuckets)
    val old = stateRoot.resolve("state_rebuild_old")
    TxLog.deleteRecursively(old.toFile)
    if (Files.exists(dataDir)) { Files.move(dataDir, old): Unit }
    Files.move(tmp, dataDir): Unit
    TxLog.deleteRecursively(old.toFile)
    if (tzSensitive(agg.schema)) MvState.pinTimeZone(spark, stateRoot)
    MvState.pinDef(stateRoot, defFp)
    setWatermark(last)
    last
  }

  /** Fold every tx past the watermark into the state. Returns the new
    * watermark (= old one when the log has nothing new).
    *
    * Retention interaction: the incremental delta structurally needs a
    * touched id's FULL op history (old and new contribution are both
    * re-derived from its ops), so once the log has been truncated
    * ([[TxLog.truncate]]) refresh permanently switches to
    * [[rebuildFromState]] — exact at any truncation, at full-recompute
    * cost. The standard tension between retention and incremental view
    * maintenance: vacuum less often than you refresh, or accept the
    * recompute. */
  def refresh(): Long = refreshUpTo(None)

  /** [[refresh]] bounded to fold NO tx past `pin` — the DISTINCT serve
    * path refreshes its auxiliary pair-level view pinned to the main
    * view's just-recorded watermark, so both states always describe
    * the same log prefix (a tx landing between the two refreshes stays
    * wholly in the next one). A pin at or below the current watermark
    * is a no-op. */
  private[graft] def refreshUpTo(pin: Option[Long],
      sharedIn: Option[MvShared] = None): Long =
    MaintainerLease.withLease(
      java.nio.file.Paths.get(log.dir), "matview-refresh") {
    // a DEFINITION change over the same state dir (JVM restart +
    // re-CREATE, or a Scala-API re-instantiation with different
    // aggregates/WHERE/groups) invalidates the state: discard it and
    // fall through to the first-build path — folding new-definition
    // deltas into old-definition state would be silently wrong
    if (!MvState.defMatches(stateRoot, defFp)) {
      TxLog.deleteRecursively(dataDir.toFile)
      Files.deleteIfExists(wmFile): Unit
      // the sidecars go WITH the data: a surviving '_schema' would let
      // read() serve the OLD definition's column set (empty relation /
      // phantom schema) until the rebuild completes — and if the
      // rebuild fails or the log is empty, forever. Without them,
      // read() fails with the honest "has no state" story;
      // writeSchema/pinTimeZone re-create both on the rebuild.
      Files.deleteIfExists(stateRoot.resolve("_schema")): Unit
      Files.deleteIfExists(stateRoot.resolve("_tz")): Unit
    }
    val w = watermark
    val truncated = log.truncatedUpTo()
    def fid(p: Path): Long = p.getFileName.toString
      .stripPrefix("tx_").stripSuffix(".parquet").toLong
    val files0 = log.txFiles()
    val lastAll = (files0.map(fid) ++ truncated).maxOption.getOrElse(-1L)
    // under a pin, every relation this refresh folds must stop at it —
    // the file set, the tail, and the touched ids' history alike
    val last = pin.fold(lastAll)(p => math.min(p, lastAll))
    if (truncated.isDefined)
      return if (last > w) rebuildFromState(last) else w
    val files = files0.filter(fid(_) <= last)
    if (files.isEmpty) return w
    if (last <= w) return w

    // A/B gate shared with JoinMatview (same key): off = the pre-r16
    // shapes, for same-JVM measurement
    val reuseShared = spark.conf
      .getOption("spark.graft.mv.reuseShared").forall(_.toBoolean)
    if (w < 0 || !Files.exists(dataDir)) {
      // first build: one full fold, all buckets written once. With
      // DISTINCT auxes the SAME fold feeds the main build and every
      // aux's first build (each aux is a view over the same log at the
      // same basis) — fold once, checkpoint the rectangles (one write
      // + re-reads instead of one full log fold per aux; r17, guide
      // §2.3 "don't compute things twice"), hand them down like the
      // incremental path's MvSharedDelta.
      val rect0 = sharedIn match {
        case Some(sb: MvSharedBuild) if sb.last == last => sb.rect
        case _ => Bitemporal.fold(readTx(files), payloadCols)
      }
      val rect =
        if (reuseShared && distincts.nonEmpty && sharedIn.isEmpty)
          org.apache.spark.sql.graftbridge.RddBridge
            .localCheckpointWithCount(rect0)._1
        else rect0
      syncAuxes(last,
        if (reuseShared && distincts.nonEmpty) Some(MvSharedBuild(last, rect))
        else None)
      val firstAgg = MvState.attachDistinctFull(
        fullAgg(prep(Bitemporal.asOf(rect, lit(validAt), lit(sysProbe))))
          .withColumn("_bucket", bucketCol),
        groupCols, distincts, spark)
      checkRangeKey(firstAgg.schema)
      if (rangeLayout) MvState.checkRangeBuild(firstAgg,
        MvState.rangeLeadKind(firstAgg.schema, groupCols.head), "build")
      MvState.writeSchema(stateRoot, firstAgg, bucketKeyCols, nBuckets,
        rangeLayout)
      MvState.writeState(firstAgg, groupCols, dataDir, nBuckets)
      if (tzSensitive(firstAgg.schema)) MvState.pinTimeZone(spark, stateRoot)
      MvState.pinDef(stateRoot, defFp)
      setWatermark(last)
      return last
    }

    if (MvState.storedSchema(stateRoot).exists(tzSensitive))
      MvState.checkTimeZone(spark, stateRoot)
    // the tail re-lists the directory — bound it to the `last` this
    // refresh will record, so a concurrently landing tx stays wholly
    // in the NEXT refresh (its id would otherwise join `touched` while
    // the pinned hist lacks its ops — harmless for COUNT/SUM deltas,
    // but the bound makes the snapshot airtight rather than argued)
    // Old and new contributions from ONE full-history fold (r16 guide
    // §2.3 "don't compute things twice"): the pre-r16 shape folded the
    // touched ids' history TWICE (once ≤ w for the old side, once whole
    // for the new side) — two scans of every tx file, two sort shuffles.
    // Now the old rectangles fold once (the `_tx_id ≤ w` filter prunes
    // tail files via their constant-_tx_id footer stats), checkpoint
    // (rows ∝ touched ids' rectangles — the same size class as the
    // delta checkpoint below), and the new side derives by FOLD FROM
    // STATE: applyOps(old rectangles, tail ops) — the exact-equivalence
    // contract BitemporalSpec locks ("applyOps == full fold at EVERY
    // split point") under the storage-wide monotonic-system-time
    // contract every readAll/compaction path already assumes.
    //
    // An aux refresh driven by its parent over the SAME log at the SAME
    // watermarks adopts the parent's relations outright (sharedIn) —
    // zero re-derivation; the gate falls back to self-derivation on any
    // watermark drift (post-restore, def-change rebuild).
    val (touched, oldRect, newRect) = sharedIn match {
      case Some(sd: MvSharedDelta) if sd.baseW == w && sd.last == last =>
        (sd.touched, sd.oldRect, sd.newRect)
      case _ =>
        val tail = readTx(log.txFilesAfter(w).filter(_.getFileName.toString
          .stripPrefix("tx_").stripSuffix(".parquet").toLong <= last))
        val tch = tail.select(col("_id").cast("long").as("_id")).distinct()
        val hist = {
          val all = readTx(files)
          all.join(tch, all("_id").cast("long") === tch("_id"), "left_semi")
        }
        if (!reuseShared)
          (tch, Bitemporal.fold(hist.filter(col("_tx_id") <= w), payloadCols),
            Bitemporal.fold(hist, payloadCols))
        else {
          val oldRect0 =
            Bitemporal.fold(hist.filter(col("_tx_id") <= w), payloadCols)
          val (oldCp, _) = org.apache.spark.sql.graftbridge.RddBridge
            .localCheckpointWithCount(oldRect0)
          // schemaless normalization for the tail ops (refoldTouched's
          // contract): a short tail may lack payload columns older txs
          // carried
          val tailOps = payloadCols.foldLeft(tail)((d, c) =>
            if (d.columns.contains(c)) d
            else d.withColumn(c, lit(null).cast(oldCp.schema(c).dataType)))
          (tch, oldCp, Bitemporal.applyOps(oldCp, tailOps, payloadCols))
        }
    }
    // with DISTINCT auxes the new-side rectangles are consumed by this
    // refresh's delta AND by every aux's (shared) delta — pin them once
    // so the applyOps fold runs one time, not once per consumer
    val newRectS =
      if (!reuseShared || distincts.isEmpty || sharedIn.nonEmpty) newRect
      else org.apache.spark.sql.graftbridge.RddBridge
        .localCheckpointWithCount(newRect)._1
    // Delta per group: (new minus old) as ONE aggregation over the
    // SIGNED union of both rectangle contributions (r17, guide §2.4
    // "two operations keyed the same way can share one exchange") —
    // the pre-r17 shape aggregated each side separately and full-outer-
    // joined them: two exchanges plus a join where one exchange
    // suffices. Numerically identical for the exact (integral/DECIMAL)
    // sum types the views use: SUM(new) − SUM(old) = SUM(±x) term for
    // term. A/B gate: spark.graft.mv.unionDelta=false restores the
    // join shape for same-JVM measurement.
    val unionDelta = spark.conf
      .getOption("spark.graft.mv.unionDelta").forall(_.toBoolean)
    val delta0 =
      if (unionDelta) {
        def side(rect: DataFrame, sign: Int): DataFrame =
          prep(Bitemporal.asOf(rect, lit(validAt), lit(sysProbe)))
            .withColumn("_sign", lit(sign.toLong))
        side(newRectS, 1).unionByName(side(oldRect, -1))
          .groupBy(groupCols.map(col): _*)
          .agg(sum(col("_sign")).as("n"),
            sumCols.map(c => sum(when(col("_sign") === 1L, col(c))
              .otherwise(-col(c))).as(sumAlias(c))) ++
              cntCols.map(c => sum(when(col(c).isNotNull, col("_sign"))
                .otherwise(0L)).as(cntAlias(c))): _*)
      } else {
        val oldC = contribRect(oldRect)
        val newC = contribRect(newRectS)
        val o = oldC.as("o")
        val nw = newC.as("n")
        val key = groupCols.map(g =>
          col(s"n.$g") <=> col(s"o.$g")).reduce(_ && _)
        nw.join(o, key, "full_outer")
          .select(
            groupCols.map(g =>
              coalesce(col(s"n.$g"), col(s"o.$g")).as(g)) ++
              ((coalesce(col("n.n"), lit(0L)) - coalesce(col("o.n"), lit(0L))).as("n") +:
                (sumCols.map { c =>
                  val a = sumAlias(c)
                  (coalesce(col(s"n.$a"), lit(0)) - coalesce(col(s"o.$a"), lit(0))).as(a)
                } ++ cntCols.map { c =>
                  val a = cntAlias(c)
                  (coalesce(col(s"n.$a"), lit(0L)) - coalesce(col(s"o.$a"), lit(0L))).as(a)
                })): _*)
      }
    // sum types pinned to the plain aggregate's: uncapped, each delta/
    // merge +/- widens decimal precision by one per refresh until the
    // parquet FIXED_LEN byte width diverges from older bucket files
    // (grows at p=24) and state reads fail — regression-tested by
    // MatviewSpec's many-refresh test
    val sumT: Map[String, org.apache.spark.sql.types.DataType] =
      sumCols.map(c => sumAlias(c) ->
        contribRect(newRectS).schema(sumAlias(c)).dataType).toMap
    val delta = delta0.select(
      (groupCols.map(col) :+ col("n")) ++
        (sumCols.map(c => col(sumAlias(c)).cast(sumT(sumAlias(c)))
          .as(sumAlias(c))) ++
          cntCols.map(c => col(cntAlias(c)))): _*)
      .withColumn("_bucket", bucketCol)
    // the delta feeds the affected-bucket collect, the touched-group
    // probe AND the state merge below — checkpoint it once (rows ∝
    // touched groups, tiny) so the whole upstream refold+aggregate
    // pipeline runs one time, not once per consumer. The bucket set
    // and group-tuple probe ride INSIDE the materializing job (r17,
    // fused stats — they each cost one more job over the checkpoint
    // before; spark.graft.mv.fusedCollect=false restores that shape).
    val groupCap =
      if (groupCols.size == 1) MvState.MaxInlineGroups
      else MvState.MaxInlineGroupTuples
    val fusedCollect = spark.conf
      .getOption("spark.graft.mv.fusedCollect").forall(_.toBoolean)
    val (deltaCp, deltaRows, bucketsOpt, tuplesOpt) =
      if (fusedCollect)
        org.apache.spark.sql.graftbridge.RddBridge.localCheckpointWithStats(
          delta, delta.schema.fieldIndex("_bucket"),
          math.max(nBuckets, MvState.MaxRangeDirs + 1),
          groupCols.map(delta.schema.fieldIndex), groupCap)
      else {
        val (cp, n) = org.apache.spark.sql.graftbridge.RddBridge
          .localCheckpointWithCount(delta)
        (cp, n, None, None)
      }
    // ≤ nBuckets longs — the only data-dependent collect in a refresh
    val affected: Seq[Any] =
      if (deltaRows == 0L) Nil
      else bucketsOpt.getOrElse(
        deltaCp.select(col("_bucket")).distinct()
          .collect().map(_.get(0)).toSeq)
    if (affected.isEmpty) {
      MvState.pinDef(stateRoot, defFp); setWatermark(last); return last
    }
    if (rangeLayout)
      MvState.checkRangeRefresh(affected,
        MvState.rangeLeadKind(deltaCp.schema, groupCols.head))

    val state = MvState.readState(spark, stateRoot, dataDir)
      .filter(col("_bucket").isin(affected: _*))
    val s = state.as("s")
    val d = deltaCp.as("d")
    val mkey = groupCols.map(g =>
      col(s"s.$g") <=> col(s"d.$g")).reduce(_ && _)
    val countSum = s.join(d, mkey, "full_outer")
      .select(
        (groupCols.map(g =>
          coalesce(col(s"s.$g"), col(s"d.$g")).as(g)) :+
          (coalesce(col("s.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n")) ++
          (sumCols.map { c =>
            val a = sumAlias(c)
            (coalesce(col(s"s.$a"), lit(0)) + coalesce(col(s"d.$a"), lit(0)))
              .cast(sumT(a)).as(a)
          } ++ cntCols.map { c =>
            val a = cntAlias(c)
            (coalesce(col(s"s.$a"), lit(0L)) + coalesce(col(s"d.$a"), lit(0L))).as(a)
          } ++
            // state's min/max — and the distinct rollup columns — ride
            // along for groups in an affected bucket that this refresh
            // does NOT touch (null for brand new groups — every new
            // group is touched, so the overlay/re-read below always
            // overwrites it)
            (mmAliases ++ ddAliases).map(a => col(s"s.$a").as(a)) :+
          coalesce(col("s._bucket"), col("d._bucket")).as("_bucket")): _*)
      .filter(col("n") > 0) // a group whose last row left the view goes away
    // MIN/MAX (and HLL-sketch) fallback (the classic IVM restriction:
    // extremes are not self-maintainable under deletes/updates): the
    // TOUCHED GROUPS — and only those — re-read their member rows at
    // the basis and recompute from scratch. The restriction ships as a
    // LITERAL group predicate when the touched set is small (the
    // overwhelmingly common case) — plain group keys push to the base
    // parquet scan (footer/file pruning on a group-clustered base),
    // the join disappears either way; big sets fall back to the
    // semi-join (MvState.membersOfTouched). COUNT/SUM-only views skip
    // all of this, keeping refresh ∝ tail.
    // shared by the mm fallback AND the distinct-rollup overlay below
    // (one plan, built once — rows ∝ touched groups over the
    // checkpointed delta). When the fused stats already collected the
    // distinct group tuples (≤ cap), serve them as a LOCAL relation:
    // downstream probes/joins then read driver-local rows instead of
    // re-scanning the checkpoint (membersOfTouched's limit-collect
    // becomes job-free).
    lazy val touchedGroups = tuplesOpt match {
      case Some(rows) =>
        spark.createDataFrame(
          new java.util.ArrayList(
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          org.apache.spark.sql.types.StructType(
            groupCols.map(g => deltaCp.schema(g))))
      case None => deltaCp.select(groupCols.map(col): _*).distinct()
    }
    val merged =
      if (mmAliases.isEmpty) countSum
      else {
        // prep BEFORE the restriction: a derived group key must exist
        // on the member relation for the touched-group predicate
        val visible = prep(Bitemporal.asOf(
          log.readAllAuto(spark, payloadCols, upToTx = last),
          lit(validAt), lit(sysProbe)))
        val mm = fullAgg(
          MvState.membersOfTouched(visible, touchedGroups, groupCols))
          .select(groupCols.map(col) ++ (lit(true).as("_mm") +:
            mmAliases.map(a => col(a).as(s"_r_$a"))): _*)
        val mmKey = groupCols.map(g =>
          col(s"m.$g") <=> col(s"r.$g")).reduce(_ && _)
        val mrg = countSum.as("m").join(mm.as("r"), mmKey, "left")
        mrg.select(
          (groupCols.map(g => col(s"m.$g").as(g)) :+ col("m.n").as("n")) ++
            (sumCols.map(c => col(s"m.${sumAlias(c)}").as(sumAlias(c))) ++
              cntCols.map(c => col(s"m.${cntAlias(c)}").as(cntAlias(c))) ++
              // the _mm flag (not coalesce) decides: a touched group
              // whose recomputed extreme is legitimately NULL (all
              // values null) must not fall back to the stale state
              mmAliases.map(a =>
                when(col("_mm") === true, col(s"_r_$a"))
                  .otherwise(col(s"m.$a")).as(a)) ++
              ddAliases.map(a => col(s"m.$a").as(a)) :+
            col("m._bucket").as("_bucket")): _*)
      }
    // DISTINCT rollup overlay: pin the auxes to this refresh's
    // watermark, then recompute cntd/sumd for the TOUCHED groups from
    // the pair state — partition-pruned to the affected buckets (the
    // aux is bucketed on the parent group prefix with the same bucket
    // count). Untouched groups in affected buckets keep the stored
    // rollup they rode along with above.
    val finalMerged =
      if (distincts.isEmpty) merged
      else {
        syncAuxes(last,
          if (reuseShared)
            Some(MvSharedDelta(w, last, touched, oldRect, newRectS))
          else None)
        MvState.overlayDistinct(merged, groupCols, touchedGroups,
          affected, distincts, spark)
      }
    MvState.swapBuckets(stateRoot, dataDir, finalMerged, affected, groupCols,
      rangeCap = rangeLayout)
    MvState.pinDef(stateRoot, defFp)
    setWatermark(last)
    last
  }

  /** The maintained view: (group, n, sum_*) — read-only, no recompute.
    * RAW-STATE semantics: a `sum_c` column stores the additive identity
    * 0 for a group whose every input is NULL (delta merges coalesce
    * through 0). Callers that need ANSI SUM (NULL for all-NULL groups)
    * must also maintain `cnt_c` via `cntCols` and mask on it — the SQL
    * DDL layer (GraftMatviews ServeCol.Sum) does exactly that. */
  def read(): DataFrame = read(spark)

  /** [[read]] bound to an EXPLICIT session — the SQL front doors serve
    * isolated per-client sessions (Spark Connect clones session state),
    * and a DataFrame is session-bound, so serving a view inside a
    * client's session needs the read built THERE. State files are
    * shared; only the plan binding differs. */
  def read(session: SparkSession): DataFrame =
    MvState.readState(session, stateRoot, dataDir).drop("_bucket")

  /** [[read]] WITH the `_bucket` partition column — the parent view's
    * rollup scan prunes on it (aux pair views only). */
  private[graft] def readRaw(session: SparkSession): DataFrame =
    MvState.readState(session, stateRoot, dataDir)
}

/** One DISTINCT aggregate argument's maintenance hooks, supplied by the
  * composition layer (the DDL front door) that owns the auxiliary
  * pair-level view. The MAIN view's refresh drives the aux: it pins the
  * aux to the exact watermark(s) this refresh will record, then rolls
  * the aux pair state up into materialized `cntd_<arg>` /
  * `sumd_<arg>` columns of the MAIN state — so reads serve from the
  * main state alone (∝ groups, bucket-prunable) and never touch the
  * pair state. The aux stays the source of truth for EXACT distinct
  * under deletes; the rollup columns are a derived cache maintained in
  * the same bucket-scoped swap as every other state column.
  *
  * Contract: the aux MUST be bucketed on the main view's group columns
  * (the parent-key prefix) with the SAME bucket count — that makes the
  * aux's `_bucket` of a pair equal the main `_bucket` of its group, so
  * the incremental rollup scan partition-prunes to exactly the
  * refresh's affected buckets. [[graft.server.GraftMatviews]] creates
  * every aux that way. */
private[graft] final case class MvDistinct(
    arg: String,
    /** build the SUM side only when SUM/AVG(DISTINCT arg) is served —
      * sum over a non-numeric argument would fail analysis. */
    needSum: Boolean,
    /** the aux pair state (groups…, arg, n, _bucket) — WITH _bucket. */
    readAux: SparkSession => DataFrame,
    /** refresh the aux pinned to exactly these watermarks
      * ([[Matview]]: length 1; [[JoinMatview]]: fact +: dims). The
      * second argument optionally shares the parent refresh's derived
      * relations ([[MvSharedDelta]] on incremental refreshes,
      * [[MvSharedBuild]] on first builds; single-table form only —
      * star auxes ignore it). */
    refreshAuxTo: (Seq[Long], Option[MvShared]) => Unit) {
  def cntAlias: String = s"cntd_$arg"
  def sumAlias: String = s"sumd_$arg"
  def aliases: Seq[String] =
    cntAlias +: (if (needSum) Seq(sumAlias) else Nil)
}

/** A parent refresh's derived relations handed to its DISTINCT auxes
  * over the SAME tx log — the aux adopts them instead of re-deriving
  * (watermark-gated; any drift self-derives as before). */
private[graft] sealed trait MvShared

/** The parent refresh's derived incremental-delta relations, handed to
  * each DISTINCT aux over the SAME tx log so the aux does not re-read
  * the tail and re-fold the touched ids' history once per argument:
  * `baseW`/`last` gate adoption (the aux self-derives on any watermark
  * drift), `touched` the tail's id set, `oldRect` the touched ids'
  * rectangles at `baseW` (checkpointed by the parent), `newRect` the
  * same ids' rectangles at `last` (checkpointed when auxes exist). */
private[graft] final case class MvSharedDelta(
    baseW: Long, last: Long, touched: DataFrame,
    oldRect: DataFrame, newRect: DataFrame) extends MvShared

/** The parent FIRST BUILD's folded rectangle relation at `last`
  * (checkpointed by the parent when auxes exist): the aux's first
  * build aggregates the SAME rectangles at the SAME basis, so adopting
  * them saves one full log fold per DISTINCT argument (r17). */
private[graft] final case class MvSharedBuild(
    last: Long, rect: DataFrame) extends MvShared

/** One percentile aggregate: MEDIAN / PERCENTILE_CONT (`approx =
  * false`, exact — Spark's `percentile`, the standard continuous
  * interpolation) or APPROX_PERCENTILE (`approx = true`, Spark's
  * `percentile_approx` — bounded memory for huge groups, the scale
  * path). The state stores the per-group percentile VALUE (double),
  * recomputed for touched groups on the MIN/MAX lifecycle: percentiles
  * cannot subtract, so incremental merging is structurally impossible —
  * the touched-group recompute keeps deletes/updates EXACT for the
  * aggregate's own semantics. The argument casts to double up front
  * (both engines' percentile families are double-valued). */
private[graft] final case class MvPct(
    arg: String, p: Double, approx: Boolean) {
  /** basis points — a collision-free integer encoding of p for state
    * column names (0.5 -> 5000) */
  def bp: Int = math.round(p * 10000).toInt
  def alias: String = (if (approx) "apct_" else "pct_") + bp + "_" + arg
  def fpPart: String = s"$arg@$bp" + (if (approx) "~" else "")
  def agg: Column =
    if (approx)
      expr(s"percentile_approx(cast(`$arg` as double), $p, 10000)")
    else expr(s"percentile(cast(`$arg` as double), $p)")
}

/** State-store helpers shared by [[Matview]] and [[JoinMatview]]. */
private[graft] object MvState {

  /** The materialized rollup column names `distincts` contribute to the
    * main state, in stable order. */
  def distinctAliases(distincts: Seq[MvDistinct]): Seq[String] =
    distincts.flatMap(_.aliases)

  /** Per-group rollup of one aux pair state: the pairs that still exist
    * (`n > 0`) with a non-null argument, counted (and summed) per MAIN
    * group. `buckets` partition-prunes the aux scan to the refresh's
    * affected buckets — sound because the aux is bucketed on the
    * parent-key prefix with the main view's bucket count (the
    * [[MvDistinct]] contract). */
  private def rollup(aux: DataFrame, groupCols: Seq[String],
      d: MvDistinct, buckets: Option[Seq[Any]]): DataFrame = {
    val scoped = buckets.fold(aux)(b =>
      aux.filter(col("_bucket").isin(b: _*)))
    val aggs = count(lit(1)).as(d.cntAlias) +:
      (if (d.needSum) Seq(sum(col(d.arg)).as(d.sumAlias)) else Nil)
    scoped.filter(col("n") > 0 && col(d.arg).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Attach rollup columns for ALL groups of `agg` — the full-build /
    * rebuild paths, where every group is (re)computed anyway. COUNT of
    * zero distinct values is 0, SUM is NULL (SQL semantics). */
  def attachDistinctFull(agg: DataFrame, groupCols: Seq[String],
      distincts: Seq[MvDistinct], spark: SparkSession): DataFrame =
    distincts.foldLeft(agg) { (acc0, d) =>
      val keep = acc0.columns.toSeq
      val acc = acc0.as("b")
      val roll = rollup(d.readAux(spark), groupCols, d, None).as("r")
      val cond = groupCols.map(g =>
        col(s"b.$g") <=> col(s"r.$g")).reduce(_ && _)
      acc.join(roll, cond, "left").select(
        keep.map(c => col(s"b.$c")) ++
          (coalesce(col(s"r.${d.cntAlias}"), lit(0L)).as(d.cntAlias) +:
            (if (d.needSum) Seq(col(s"r.${d.sumAlias}").as(d.sumAlias))
             else Nil)): _*)
    }

  /** Overlay rollups for the TOUCHED groups onto the merged state slice
    * (which must already carry the rollup columns, ridden along from
    * stored state): touched groups take the freshly recomputed rollup —
    * including 0/NULL when their last pair vanished — untouched groups
    * in an affected bucket keep their stored values. The same
    * flag-not-coalesce discipline as the MIN/MAX merge: a touched
    * group's legitimate NULL must not fall back to stale state. */
  def overlayDistinct(merged: DataFrame, groupCols: Seq[String],
      touched: DataFrame, affected: Seq[Any],
      distincts: Seq[MvDistinct], spark: SparkSession): DataFrame =
    distincts.foldLeft(merged) { (acc0, d) =>
      val keep = acc0.columns.toSeq
      val acc = acc0.as("b")
      val roll = rollup(d.readAux(spark), groupCols, d, Some(affected))
      val rKey = groupCols.map(g =>
        col(s"tg.$g") <=> col(s"rr.$g")).reduce(_ && _)
      // every touched group gets a row, present in the rollup or not
      val tr = touched.as("tg").join(roll.as("rr"), rKey, "left")
        .select(groupCols.map(g => col(s"tg.$g").as(g)) ++
          (lit(true).as("_dd") +:
            coalesce(col(s"rr.${d.cntAlias}"), lit(0L)).as(d.cntAlias) +:
            (if (d.needSum) Seq(col(s"rr.${d.sumAlias}").as(d.sumAlias))
             else Nil)): _*)
      val cond = groupCols.map(g =>
        col(s"b.$g") <=> col(s"r.$g")).reduce(_ && _)
      acc.join(tr.as("r"), cond, "left").select(
        keep.map {
          case c if c == d.cntAlias =>
            when(col("_dd") === true, col(s"r.${d.cntAlias}"))
              .otherwise(col(s"b.$c")).as(c)
          case c if d.needSum && c == d.sumAlias =>
            when(col("_dd") === true, col(s"r.${d.sumAlias}"))
              .otherwise(col(s"b.$c")).as(c)
          case c => col(s"b.$c")
        }: _*)
    }
  /** Sieve (the view's WHERE) then attach the derived expression
    * columns — the row-local preparation every aggregation path of
    * both view kinds shares. One definition, because it feeds the
    * group-key/bucket formula below: the two must never drift apart
    * between the view kinds. */
  def prep(df: DataFrame, whereSql: Option[String],
           derived: Seq[(String, String)]): DataFrame =
    derived.foldLeft(whereSql.map(w => df.filter(expr(w))).getOrElse(df)) {
      case (d, (n, e)) => d.withColumn(n, expr(e))
    }

  /** Hash bucket of the group key (null-safe: null groups get a real
    * bucket, not a hive default partition). The single-column formula
    * is kept BIT-IDENTICAL to the pre-r12 one so existing state dirs
    * keep their bucket assignment; multi-column keys concat with a
    * \u0001 separator. */
  /** Formula constants shared with [[graft.plans.MvBucketPrune]], which
    * rebuilds the same hash over PREDICATE LITERALS — the two sides
    * must never drift or pruning would silently read the wrong bucket. */
  val NullGroupMarker = "\\u0000:null-group"
  val GroupKeySep = "\u0001"

  def bucketCol(groupCols: Seq[String], nBuckets: Int): Column = {
    val parts = groupCols.map(c =>
      coalesce(col(c).cast("string"), lit(NullGroupMarker)))
    val key = if (parts.size == 1) parts.head
      else concat_ws(GroupKeySep, parts: _*)
    pmod(xxhash64(key), lit(nBuckets.toLong))
  }

  /** `layout = range` partition column: the FIRST group column's VALUE
    * prefixed with [[RangeValuePrefix]]; nulls get the shared marker.
    * One dir per distinct leading-key value, so RANGE predicates on a
    * lexicographically-ordered key (ISO dates/months, zero-padded
    * codes) prune dirs natively — the layout for time-keyed rollups,
    * refused for non-string keys (lexicographic ≠ numeric order).
    *
    * The prefix exists for two invariants: (a) an EMPTY-string key must
    * not produce an empty partition value — Spark writes '' to the
    * __HIVE_DEFAULT_PARTITION__ dir and reads it back as NULL, which
    * would silently detach the group from its dir (found by review);
    * (b) the null marker (which starts with a backslash, ABOVE digits
    * in ASCII) must sort BELOW every real key so translated `>=`
    * bounds exclude it and `<=` bounds include it as a harmless
    * superset — the marker starts at \u0000 only the prefix guarantees
    * every real dir value starts at 'k'. Ordering of real keys is
    * preserved under the shared prefix. */
  val RangeValuePrefix = "k"
  def rangeBucketCol(leadGroupCol: String): Column =
    // the explicit string cast is the write-side format contract: for
    // STRING keys it is the identity; for DATE keys it is the ISO
    // `yyyy-MM-dd` form (timezone-free, zero-padded — lexicographic
    // order equals date order for 4-digit years, which
    // checkRangeDirValues enforces), and MvBucketPrune.pruneRange
    // rebuilds the SAME cast over predicate literals
    coalesce(concat(lit(RangeValuePrefix),
        col(leadGroupCol).cast("string")),
      lit(NullGroupMarker))

  /** Touched-group sets up to this size ship as a LITERAL membership
    * predicate on the member re-read (MIN/MAX/HLL recompute) instead
    * of a semi-join: plain stored group keys then push to the base
    * parquet scan (`PushedFilters` → footer/file pruning on a
    * group-clustered base — the same treatment [[JoinMatview]]'s
    * dim-touched fact restriction gets), and even derived keys skip
    * the join. Multi-column keys expand to a per-tuple conjunction
    * disjunction, capped lower (predicate-tree size). Past the cap the
    * semi-join is the plan, exactly as before. */
  val MaxInlineGroups = 1000
  val MaxInlineGroupTuples = 100

  /** Literal membership predicate for a small set of group-key tuples
    * (rows in `groupCols` order). NULL group keys match via isNull —
    * the null group is a real group. */
  def groupKeyIn(groupCols: Seq[String],
                 rows: Seq[org.apache.spark.sql.Row]): Column =
    if (groupCols.size == 1) {
      val vals = rows.map(_.get(0))
      val nonNull = vals.filter(_ != null)
      val base =
        if (nonNull.isEmpty) lit(false)
        else col(groupCols.head).isin(nonNull: _*)
      if (vals.contains(null)) base || col(groupCols.head).isNull else base
    } else
      rows.map(r => groupCols.zipWithIndex.map { case (g, i) =>
        val v = r.get(i)
        if (v == null) col(g).isNull else col(g) === lit(v)
      }.reduce(_ && _)).reduce(_ || _)

  /** Restrict `members` to the touched groups: literal predicate under
    * the cap (see [[MaxInlineGroups]]), semi-join past it. `touched`
    * must be cheap to collect (it derives from the checkpointed delta —
    * ≤ touched-group rows). */
  def membersOfTouched(members: DataFrame, touched: DataFrame,
                       groupCols: Seq[String]): DataFrame = {
    val cap =
      if (groupCols.size == 1) MaxInlineGroups else MaxInlineGroupTuples
    // non-atomic key types (array/struct/map group columns) cannot be
    // encoded as literals by lit()/isin() — they keep the semi-join
    // (which the null-safe <=> handles for any orderable type), found
    // by review before a small refresh of such a view could crash
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType, UserDefinedType}
    def literalEncodable(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: ArrayType | _: MapType | _: StructType |
             _: UserDefinedType[_] => false
        case _ => true
      }
    val atomicKeys = groupCols.forall(g =>
      members.schema.find(_.name == g).exists(f =>
        literalEncodable(f.dataType)))
    // the probe is one tiny driver job per mm-path refresh — it reads
    // only the checkpointed delta's partitions (rows ∝ touched groups),
    // the same cost class as the affected-bucket collect
    val probe =
      if (atomicKeys) touched.limit(cap + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    val (branch, restricted) =
      if (atomicKeys && probe.length == 0) ("empty", members.limit(0))
      else if (atomicKeys && probe.length <= cap)
        ("inline", members.filter(groupKeyIn(groupCols, probe.toSeq)))
      else {
        val v = members.as("v"); val tg = touched.as("tg")
        val semiKey = groupCols.map(g =>
          col(s"v.$g") <=> col(s"tg.$g")).reduce(_ && _)
        ("semi", v.join(tg, semiKey, "left_semi"))
      }
    // test hook — the member re-read runs inside the merged write job
    // (no QueryExecutionListener event), so the pushdown spec snapshots
    // the restricted relation's STANDALONE plan and the branch taken
    // (same pattern as JoinMatview.capturePlans). This locks the
    // pushdown within the subtree; the EXECUTED-plan evidence is the
    // ScaleSpec row that measures footer-admitted rows on a real
    // refresh (identical at 10x base). Off (zero cost) outside tests.
    if (captureMemberPlans) capturedMemberPlans.synchronized {
      capturedMemberPlans +=
        ((branch, restricted.queryExecution.executedPlan.toString)): Unit
    }
    restricted
  }

  /** Test hooks for the member-re-read pushdown spec: (branch taken,
    * physical plan) per restriction. */
  @volatile private[graft] var captureMemberPlans = false
  private[graft] val capturedMemberPlans =
    scala.collection.mutable.Buffer.empty[(String, String)]

  /** `layout = range` soundness guard, shared by both view kinds (the
    * r12 lesson: layout-critical checks live in ONE place or they
    * drift): dir names compare lexicographically, so only STRING
    * leading keys are accepted. */
  def checkRangeKey(schema: org.apache.spark.sql.types.StructType,
                    leadGroupCol: String): Unit = {
    import org.apache.spark.sql.types.{DateType, StringType,
      TimestampNTZType}
    val dt = schema.find(_.name == leadGroupCol).map(_.dataType)
    if (dt.contains(StringType) || dt.contains(DateType) ||
      dt.contains(TimestampNTZType)) return
    // rejection matrix: dir names compare lexicographically, so the
    // key's canonical string form must order like the key itself.
    //   STRING — accepted (the user owns the format contract);
    //   DATE   — accepted (ISO yyyy-MM-dd, timezone-free; 4-digit-year
    //            range enforced at write by checkRangeDirValues);
    //   TIMESTAMP_NTZ — accepted (zone-free ISO wall clock, same
    //            4-digit-year contract; fixed-width integer part keeps
    //            trimmed fractions lexicographic);
    //   TIMESTAMP — refused: its string form goes through the SESSION
    //            timezone, and a read's zone may differ from the
    //            write's (the _tz pin guards refreshes, not reads);
    //   numerics — refused: lexicographic ≠ numeric order (2 > 10).
    val hint = dt match {
      case Some(t) if t.typeName.startsWith("timestamp") =>
        "cast the bucket to DATE for day-or-coarser buckets (e.g. " +
          "CAST(date_trunc('month', ts) AS DATE)) — a TIMESTAMP key's " +
          "string form depends on the session timezone"
      case _ =>
        "lexicographic dir order must equal key order — cast or " +
          "zero-pad-format the key, or use the default hash layout"
    }
    throw new IllegalStateException(
      s"layout = 'range' requires a STRING-, DATE- or TIMESTAMP_NTZ-" +
        s"typed leading group column; got $leadGroupCol: " +
        dt.map(_.simpleString).getOrElse("?") + s" ($hint)")
  }

  /** Range layout trades the nBuckets bound for one dir per distinct
    * leading-key value — right for time buckets (10^2..10^4 dirs over
    * years), catastrophic for an id-like key (millions of dirs, and a
    * driver collect ∝ touched values). Builds and refreshes refuse
    * past this cap with the hash-layout pointer instead of melting the
    * file system. Same driver-metadata size class as
    * [[JoinMatview.MaxInlineDimIds]]. */
  // var is a TEST HOOK only (specs lower the cap instead of minting
  // 10k real dirs); production never writes it
  @volatile var MaxRangeDirs = 10000

  def checkRangeDirCount(n: Long, what: String): Unit =
    if (n > MaxRangeDirs)
      throw new IllegalStateException(
        s"layout = 'range' would $what $n leading-key dirs (cap " +
          s"$MaxRangeDirs): a range layout is for LOW-cardinality " +
          "ordered keys (time buckets); use the default hash layout " +
          "for high-cardinality group keys")

  /** The range layout's leading-key FORMAT class: 's' = STRING (the
    * user owns the format contract), 'd' = DATE (ISO day), 'n' =
    * TIMESTAMP_NTZ (zone-free ISO wall clock — trailing-zero-trimmed
    * fractions still order lexicographically because the integer part
    * is fixed-width). */
  def rangeLeadKind(schema: org.apache.spark.sql.types.StructType,
                    leadGroupCol: String): Char =
    schema.find(_.name == leadGroupCol).map(_.dataType) match {
      case Some(org.apache.spark.sql.types.DateType) => 'd'
      case Some(org.apache.spark.sql.types.TimestampNTZType) => 'n'
      case _ => 's'
    }

  private val IsoDayDirRe =
    (RangeValuePrefix + "\\d{4}-\\d{2}-\\d{2}").r
  private val IsoNtzDirRe =
    (RangeValuePrefix +
      "\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}(\\.\\d{1,6})?").r

  /** DATE/NTZ-key format contract on collected dir values (≤ cap + 1
    * strings, driver-metadata sized): lexicographic dir order equals
    * temporal order ONLY for 4-digit years — year 10000 formats to
    * five digits and sorts below "2", silently detaching range pruning
    * from the data. Out-of-range values refuse at write, so the prune
    * side may assume every existing dir obeys the contract. */
  def checkRangeDirValues(values: Seq[Any], kind: Char,
                          what: String): Unit = {
    checkRangeDirCount(values.size.toLong, what)
    val re = kind match {
      case 'd' => Some(IsoDayDirRe)
      case 'n' => Some(IsoNtzDirRe)
      case _ => None
    }
    re.foreach(r => values.foreach { v =>
      val s = String.valueOf(v)
      if (s != NullGroupMarker && !r.matches(s))
        throw new IllegalStateException(
          s"layout = 'range' temporal key produced dir value '$s': " +
            "only years 0001-9999 order lexicographically in ISO " +
            "form — keep the key inside that range or use the hash " +
            "layout")
    })
  }

  /** Build-path guard: the distinct dir values, collected (same
    * driver-metadata size class as the refresh path's affected-bucket
    * collect), bounded by [[MaxRangeDirs]] and format-checked for
    * DATE/NTZ keys. */
  def checkRangeBuild(agg: DataFrame, kind: Char,
                      what: String): Unit =
    checkRangeDirValues(
      agg.select(col("_bucket")).distinct().limit(MaxRangeDirs + 1)
        .collect().map(_.get(0)).toSeq,
      kind, what)

  /** Incremental-refresh guards, pre-merge: the DATE-key format
    * contract plus the per-refresh affected bound (which also bounds
    * the driver-side affected collect). The CUMULATIVE growth cap is
    * enforced precisely in [[swapBuckets]] — pre-destruction, on the
    * exact post-swap dir count — because a pre-merge existing∪affected
    * union over-refuses a rotation (it counts dirs this refresh
    * EMPTIES, so a near-cap view retiring old keys while new ones
    * arrive would wedge permanently even though the post-swap count
    * stays under the cap). */
  def checkRangeRefresh(affected: Seq[Any], kind: Char): Unit =
    checkRangeDirValues(affected, kind, "rewrite")

  private def listBucketDirs(dir: Path): Set[String] =
    if (!Files.isDirectory(dir)) Set.empty
    else {
      val s = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("_bucket=")).toSet
      } finally s.close()
    }

  /** `_bucket=<v>` directory name for a partition value — hash layouts
    * carry longs (digits, never escaped); range layouts carry the key
    * VALUE, escaped exactly the way Spark's partitioned write escapes
    * it, so the swap moves the same dir the write produced. */
  def bucketDirName(v: Any): String = "_bucket=" + (v match {
    case s: String => org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.escapePathName(s)
    case x => String.valueOf(x)
  })

  /** Write a state relation to `dest` partitioned by `_bucket`, rows
    * SORTED by the group key within each bucket's files: a bucket
    * holds every group that hashes to it, so unsorted files have
    * useless row-group min/max stats on the group columns — sorted, a
    * point/range read of one group over a billion-group view decodes
    * only the matching row groups (parquet footer pruning), not the
    * whole state. The sort is per-bucket-local (no extra shuffle
    * beyond the repartition every write already pays). */
  /** `width` = the number of bucket dirs this write will produce
    * (affected buckets on a swap, nBuckets on a full build): explicit
    * so the write job launches tasks ∝ its actual work — a
    * conf-derived width costs dozens of empty sort+write tasks per
    * refresh on a small view, measured at +15% on the sf1 storage
    * family. */
  def writeState(df: DataFrame, groupCols: Seq[String],
                 dest: Path, width: Int): Unit =
    df.repartition(math.max(width, 1), col("_bucket"))
      .sortWithinPartitions(("_bucket" +: groupCols).map(col): _*)
      .write.mode("overwrite").partitionBy("_bucket").parquet(dest.toString)

  /** Pin the session timezone the state was (re)built under. Catalyst
    * marks timezone-aware expressions (date_trunc over timestamps,
    * hour(), string↔timestamp casts) DETERMINISTIC, but their value
    * reads spark.sql.session.timeZone — so an incremental refresh in a
    * session with a DIFFERENT zone would subtract old contributions
    * that no longer match the stored group keys and silently corrupt
    * the view. Full (re)builds overwrite the pin (the whole state is
    * recomputed under one zone, which is consistent); incremental
    * paths verify it via [[checkTimeZone]]. */
  def pinTimeZone(spark: SparkSession, stateRoot: Path): Unit = {
    Files.createDirectories(stateRoot)
    val tmp = stateRoot.resolve("_tz.tmp")
    Files.write(tmp,
      spark.conf.get("spark.sql.session.timeZone").getBytes(UTF_8))
    Files.move(tmp, stateRoot.resolve("_tz"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Persist a fingerprint of the view DEFINITION beside the state.
    * The views registry is in-memory: after a JVM restart a CREATE (or
    * a Scala-API re-instantiation) over the same state dir with a
    * CHANGED definition — different WHERE, aggregate list, group
    * columns, dim arity — would otherwise adopt the old definition's
    * state and fold new-definition deltas into it, silently wrong
    * forever. On mismatch the refresh discards the state and rebuilds
    * from the logs (state is always derivable). A missing fingerprint
    * (state from before this guard) adopts and pins. */
  def pinDef(stateRoot: Path, fp: String): Unit = {
    Files.createDirectories(stateRoot)
    val tmp = stateRoot.resolve("_def.tmp")
    Files.write(tmp, fp.getBytes(UTF_8))
    Files.move(tmp, stateRoot.resolve("_def"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** True when the stored fingerprint matches (or none exists — legacy
    * state adopts and is pinned by the caller's next full write). */
  def defMatches(stateRoot: Path, fp: String): Boolean = {
    val f = stateRoot.resolve("_def")
    !Files.exists(f) ||
      new String(Files.readAllBytes(f), UTF_8).trim == fp
  }

  /** The persisted state schema, when the sidecar exists — lets a
    * refresh learn group-key TYPES (e.g. timestamp, which makes the
    * bucket hash timezone-sensitive) without reading data. */
  def storedSchema(stateRoot: Path)
      : Option[org.apache.spark.sql.types.StructType] = {
    val sf = stateRoot.resolve("_schema")
    if (!Files.exists(sf)) None
    else Some(org.apache.spark.sql.types.DataType
      .fromJson(new String(Files.readAllBytes(sf), UTF_8))
      .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** Loud-refusal half of [[pinTimeZone]], called before incremental
    * work on a view whose WHERE/derived expressions could be
    * timezone-aware. A missing pin (state from before this guard)
    * adopts the current zone. */
  def checkTimeZone(spark: SparkSession, stateRoot: Path): Unit = {
    val f = stateRoot.resolve("_tz")
    if (!Files.exists(f)) { pinTimeZone(spark, stateRoot); return }
    val pinned = new String(Files.readAllBytes(f), UTF_8).trim
    val cur = spark.conf.get("spark.sql.session.timeZone")
    if (pinned != cur)
      throw new IllegalStateException(
        s"materialized-view state at $stateRoot was built under session " +
          s"timezone '$pinned' but this session uses '$cur': the view " +
          "declares row-local expressions (WHERE / derived columns) " +
          "that may be timezone-aware, and an incremental refresh would " +
          "mix group keys across zones. Restore the timezone, or DROP " +
          "and re-CREATE the view to rebuild under the new one.")
  }
  /** Persist the state relation's schema beside it. A refresh that
    * empties every bucket (all rows deleted), or a join view whose
    * first build matches nothing, writes a parquet directory with NO
    * data files — a schema-less read of it would then throw
    * UNABLE_TO_INFER_SCHEMA on every later refresh() and read(),
    * permanently (found by review). With the sidecar, empty state
    * reads as an empty relation and the view keeps working. */
  /** Metadata keys stamped on the first BUCKET-KEY column of the
    * persisted state schema — [[graft.plans.MvBucketPrune]] reads them
    * off the scan's attributes to translate a full-bucket-key equality
    * predicate into `_bucket = <const>` partition pruning. GroupsKey
    * records the HASH KEY (normally the full group key; the parent
    * prefix for aux pair views) — what the rule must cover with
    * equality conjuncts to prune soundly. */
  val BucketsKey = "graft.mv.nbuckets"
  val GroupsKey = "graft.mv.groups"
  /** "range" when the state is value-partitioned on the leading group
    * column ([[rangeBucketCol]]) — [[graft.plans.MvBucketPrune]] then
    * maps range/equality predicates on that column straight onto
    * `_bucket` instead of hashing. Absent = hash layout. */
  val LayoutKey = "graft.mv.layout"

  def writeSchema(stateRoot: Path, df: DataFrame,
                  bucketKeyCols: Seq[String], nBuckets: Int,
                  rangeLayout: Boolean = false): Unit = {
    Files.createDirectories(stateRoot)
    val stamped = org.apache.spark.sql.types.StructType(df.schema.map { f =>
      if (f.name == bucketKeyCols.head)
        f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putLong(BucketsKey, nBuckets.toLong)
          .putString(GroupsKey, bucketKeyCols.mkString("\u0001"))
          .putString(LayoutKey, if (rangeLayout) "range" else "hash")
          .build())
      else f
    })
    val tmp = stateRoot.resolve("_schema.tmp")
    Files.write(tmp, stamped.json.getBytes(UTF_8))
    Files.move(tmp, stateRoot.resolve("_schema"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Temp-write + per-bucket directory swap: `merged` (which must
    * carry `_bucket`) replaces exactly the `affected` bucket dirs;
    * untouched buckets keep their files byte for byte. A bucket whose
    * groups all vanished is deleted and not replaced. */
  def swapBuckets(stateRoot: Path, dataDir: Path, merged: DataFrame,
                  affected: Seq[Any], groupCols: Seq[String],
                  rangeCap: Boolean = false): Unit = {
    val tmp = stateRoot.resolve("state_tmp")
    TxLog.deleteRecursively(tmp.toFile)
    writeState(merged, groupCols, tmp, affected.size)
    if (rangeCap) {
      // the CUMULATIVE dir cap, enforced on the EXACT post-swap count
      // (surviving untouched dirs + dirs this refresh writes — the tmp
      // listing knows which affected dirs actually have rows, so a
      // rotation that empties as many old keys as it adds new ones
      // passes), checked BEFORE the destructive loop so a refusal
      // leaves the state byte-identical and the watermark unadvanced
      val affectedNames = affected.map(bucketDirName).toSet
      val written = listBucketDirs(tmp)
      val surviving =
        listBucketDirs(dataDir).count(n => !affectedNames.contains(n))
      try checkRangeDirCount((surviving + written.size).toLong,
        "grow state to")
      catch {
        case e: IllegalStateException =>
          TxLog.deleteRecursively(tmp.toFile); throw e
      }
    }
    affected.foreach { b =>
      val name = bucketDirName(b)
      val dst = dataDir.resolve(name)
      TxLog.deleteRecursively(dst.toFile)
      val src = tmp.resolve(name)
      if (Files.exists(src)) { Files.move(src, dst): Unit }
    }
    TxLog.deleteRecursively(tmp.toFile)
  }

  /** Read the state dir, schema-pinned when the sidecar exists (also
    * immune to mixed-footer inference order); plain inference for
    * state written before the sidecar existed. */
  /** Make sure [[graft.plans.MvBucketPrune]] runs in `session`'s
    * optimizer: the config path is `spark.sql.extensions =
    * graft.GraftExtensions`, but sessions built without it (and
    * Connect-cloned sessions) still serve matviews — hook the rule
    * through the experimental-methods batch the first time this
    * session reads state. Idempotent; the rule itself is a no-op on
    * non-matview scans (schema-metadata gated). The read-modify-write
    * on `extraOptimizations` is guarded by a process-wide lock: two
    * threads doing a first readState on the same session must not
    * lose each other's append (or clobber a third-party rule added
    * concurrently). The lock is global rather than per-session —
    * appends are rare (once per session) and never block reads. */
  private val pruneRuleLock = new Object
  private[graft] def ensurePruneRule(session: SparkSession): Unit =
    pruneRuleLock.synchronized {
      val cur = session.experimental.extraOptimizations
      if (!cur.contains(graft.plans.MvBucketPrune))
        session.experimental.extraOptimizations =
          cur :+ graft.plans.MvBucketPrune
    }

  def readState(spark: SparkSession, stateRoot: Path,
                dataDir: Path): DataFrame = {
    ensurePruneRule(spark)
    val sf = stateRoot.resolve("_schema")
    // no sidecar AND no data: never refreshed against a non-empty log —
    // the state's schema is genuinely unknowable (payload types come
    // from data). Fail with the story, not PATH_NOT_FOUND.
    if (!Files.exists(sf) && !Files.exists(dataDir))
      throw new IllegalStateException(
        s"materialized view at $stateRoot has no state: it has never been " +
          "refreshed against a non-empty table (write data, then REFRESH)")
    if (Files.exists(sf))
      spark.read.schema(org.apache.spark.sql.types.DataType
          .fromJson(new String(Files.readAllBytes(sf), UTF_8))
          .asInstanceOf[org.apache.spark.sql.types.StructType])
        .parquet(dataDir.toString)
    else spark.read.parquet(dataDir.toString)
  }
}
