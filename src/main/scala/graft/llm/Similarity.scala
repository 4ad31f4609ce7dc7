package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`/`array<double>`).
  *
  * All math is built from codegen'd higher-order Column functions
  * (`zip_with` + `aggregate`), never UDFs, so the dot products stay inside
  * whole-stage codegen. The brute-force path is the exact baseline; the
  * LSH path buckets by deterministic random hyperplanes so candidate
  * generation becomes an equi-join (shuffle on bucket id) — the shape
  * that survives 100 TB, where an all-pairs cross join cannot.
  */
object Similarity {

  /** Sequential dot product — same index-order accumulation as DuckDB's
    * list_dot_product, so cross-engine results are bit-exact. Backed by
    * the codegen'd [[graft.functions.VecDot]] primitive loop (no
    * intermediate zipped array per pair — the pair-mining hot path). */
  def dot(a: Column, b: Column): Column = {
    graft.functions.VecDot.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("vec_dot", a, b)
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane weights: md5 of "plane:dim"
    * (computed once, driver-side, shipped as literals) — reproducible
    * across runs/engines with no RNG state. */
  def planeWeights(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      val h = MessageDigest.getInstance("MD5").digest(s"$p:$d".getBytes("UTF-8"))
      ((h(0) & 0xff) - 127.5) / 127.5
    }

  /** Sign-bit LSH bucket id from `nPlanes` hyperplanes over array column
    * `v`. Pure Column expression (hyperplanes are array literals). */
  def lshBucket(v: Column, nPlanes: Int, dim: Int): Column = {
    val ws = planeWeights(nPlanes, dim)
    ws.zipWithIndex.map { case (w, p) =>
      when(dot(v, array(w.map(lit): _*)) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _).cast("long")
  }

  /** Exact brute-force top-k by cosine against one (broadcast) query
    * vector — the correctness baseline; O(n·dim) scan, no shuffle. */
  def bruteForceTopK(emb: DataFrame, vCol: String, queryVec: DataFrame,
                     qCol: String, k: Int): DataFrame =
    emb.crossJoin(broadcast(queryVec))
      .withColumn("cos", cosine(col(vCol), col(qCol)))
      .orderBy(col("cos").desc)
      .limit(k)

  /** IVF (inverted-file) ANN: a coarse quantizer assigns every vector to
    * its nearest of `nCentroids` centroid "cells"; a query probes only
    * the `nProbe` cells whose centroids are closest to it, then ranks
    * exactly within them. At 100 TB the table is partitioned by cell id
    * so a query touches nProbe partitions instead of the full corpus.
    *
    * Centroid provenance is an EXPLICIT input: every IVF entry point
    * takes a centroid relation of shape `(_cid long, _cv array<double>)`
    * — borrowed ([[ivfCentroids]]), trained ([[ivfTrain]]), or loaded
    * from anywhere (the library contract for sparse/non-contiguous id
    * spaces, where the borrow would silently yield fewer cells). The
    * `(nCentroids, idStride)` overloads keep the deterministic borrow
    * as the zero-config default. */
  /** The deterministic borrowed-centroid relation (the vectors whose id
    * equals `i * idStride` for i < nCentroids): reproducible across
    * engines (the DuckDB oracle replays the exact same assignment) and
    * rebuild-free. Assumes ids are dense multiples of `idStride`; for
    * sparse id spaces pass trained/explicit centroids instead. */
  def ivfCentroids(emb: DataFrame, idCol: String, vCol: String,
                   nCentroids: Int, idStride: Long): DataFrame =
    emb.filter(col(idCol) % idStride === 0 && col(idCol) / idStride < nCentroids)
      .select((col(idCol) / idStride).cast("long").as("_cid"), col(vCol).as("_cv"))

  /** Cell assignment against an explicit centroid relation
    * `(_cid, _cv)`. nCentroids is small by construction -> broadcast.
    * The argmax cell per vector is a max_by aggregation, NOT a window:
    * aggregation gets a map-side partial, so the shuffle carries n rows
    * instead of the n×k candidate expansion a window rank would sort.
    * Ordering key (cos, -cid) = highest cosine, ties to the LOWER
    * centroid id. */
  def ivfAssign(emb: DataFrame, idCol: String, vCol: String,
                centroids: DataFrame): DataFrame = {
    val cand = emb.crossJoin(broadcast(centroids))
      .withColumn("_ccos", cosine(col(vCol), col("_cv")))
      .drop("_cv")
    val payload = struct(
      (emb.columns.filterNot(_ == idCol).map(col) :+
        col("_cid") :+ col("_ccos")): _*)
    cand.groupBy(col(idCol))
      .agg(max_by(payload, struct(col("_ccos"), -col("_cid"))).as("_best"))
      .select(col(idCol) +: cand.columns
        .filterNot(c => c == idCol || c == "_cid" || c == "_ccos")
        .map(c => col(s"_best.$c")) :+
        col("_best._cid").as("cell") :+ col("_best._ccos").as("cell_cos"): _*)
  }

  def ivfAssign(emb: DataFrame, idCol: String, vCol: String,
                nCentroids: Int, idStride: Long = 1L): DataFrame =
    ivfAssign(emb, idCol, vCol,
      ivfCentroids(emb, idCol, vCol, nCentroids, idStride))

  /** IVF ANN top-k against an explicit centroid relation: probe the
    * query's `nProbe` nearest cells only. `assigned` must carry the
    * `cell` column produced by [[ivfAssign]] with the SAME centroids. */
  def ivfTopK(assigned: DataFrame, vCol: String, queryVec: DataFrame,
              qCol: String, k: Int, nProbe: Int, centroids: DataFrame,
              tieBreak: Seq[Column]): DataFrame = {
    val probes = queryVec.crossJoin(broadcast(centroids))
      .withColumn("_ccos", cosine(col(qCol), col("_cv")))
      .orderBy(col("_ccos").desc, col("_cid"))
      .limit(nProbe)
      .select(col("_cid").as("cell"), col(qCol))
    assigned.join(broadcast(probes), "cell")
      .withColumn("cos", cosine(col(vCol), col(qCol)))
      .orderBy(col("cos").desc +: tieBreak: _*)
      .limit(k)
  }

  def ivfTopK(assigned: DataFrame, vCol: String, queryVec: DataFrame,
              qCol: String, k: Int, nCentroids: Int, nProbe: Int,
              emb: DataFrame, idCol: String, idStride: Long = 1L,
              tieBreak: Seq[Column] = Nil): DataFrame =
    ivfTopK(assigned, vCol, queryVec, qCol, k, nProbe,
      ivfCentroids(emb, idCol, vCol, nCentroids, idStride), tieBreak)

  /** Cross-engine-exact rounding (same formula as the oracle twins):
    * floor(x·10⁶+0.5)/10⁶ on exact IEEE ops. Lloyd means are rounded
    * through this so Spark and the replaying oracle produce IDENTICAL
    * centroid values (raw float sums differ sub-ulp with aggregation
    * order; rounding absorbs it and the next iteration starts from the
    * same literals in both engines). */
  private def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** Element-wise mean of the `dim`-wide array column `vCol` per group:
    * dim parallel `avg` aggregates reassembled into an array — fully
    * codegen'd, one map-side-combined shuffle, never a collect. */
  private def meanVec(df: DataFrame, groupCols: Seq[Column], vCol: String,
                      dim: Int, out: String): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(array((0 until dim).map(i => r6(avg(col(vCol).getItem(i)))): _*)
        .as(out))

  /** Distributed Lloyd's training for the IVF coarse quantizer
    * (spherical k-means): assign by max cosine (ties to the lower cell
    * id), recentre on the element-wise mean. Means are NOT normalized —
    * cosine is scale-invariant in the centroid, so the un-normalized
    * mean assigns identically to the normalized one. Deterministic end
    * to end: borrowed-centroid init, FIXED `iters` iterations (no
    * convergence test), round-6 means — an oracle replays it exactly.
    * Cells that go empty keep their previous centroid.
    *
    * Scale shape per iteration: one broadcast (k×dim centroids), one
    * max_by aggregation (map-side partial), one dim-column avg
    * aggregation over n rows — no window, no collect; localCheckpoint
    * keeps the iterated lineage flat like [[graft.ra.RA.fixpoint]]. */
  def ivfTrain(emb: DataFrame, idCol: String, vCol: String,
               nCentroids: Int, dim: Int, iters: Int,
               idStride: Long = 1L): DataFrame = {
    var cents = ivfCentroids(emb, idCol, vCol, nCentroids, idStride)
    for (_ <- 0 until iters) {
      val assigned = ivfAssign(emb.select(col(idCol), col(vCol)),
        idCol, vCol, cents)
      val means = meanVec(assigned, Seq(col("cell").as("_cid")), vCol,
        dim, "_mv")
      cents = cents.select(col("_cid"), col("_cv").as("_prev"))
        .join(means, Seq("_cid"), "left")
        .select(col("_cid"), coalesce(col("_mv"), col("_prev")).as("_cv"))
        .localCheckpoint()
    }
    cents
  }

  /** Multi-probe LSH ANN: probe the query's bucket AND every Hamming-1
    * neighbor (each sign bit flipped once) — nPlanes+1 buckets total.
    * Vectors near a hyperplane land on either side; probing the
    * neighbors recovers most of the recall single-probe loses, for
    * (p+1)/2^p of the corpus scanned. Probes ship as a tiny exploded
    * relation → one equi-join, same shape as single-probe. */
  def annTopKMultiProbe(emb: DataFrame, vCol: String, queryVec: DataFrame,
                        qCol: String, k: Int, nPlanes: Int = 8, dim: Int = 64,
                        tieBreak: Seq[Column] = Nil): DataFrame = {
    val bucketed = emb.withColumn("bucket", lshBucket(col(vCol), nPlanes, dim))
    val qb = queryVec.withColumn("_qb", lshBucket(col(qCol), nPlanes, dim))
    val probeArr = array(col("_qb") +:
      (0 until nPlanes).map(p => col("_qb").bitwiseXOR(lit(1L << p))): _*)
    val probes = qb.select(col(qCol), explode(probeArr).as("bucket"))
    bucketed.join(broadcast(probes), "bucket")
      .withColumn("cos", cosine(col(vCol), col(qCol)))
      .orderBy(col("cos").desc +: tieBreak: _*)
      .limit(k)
  }

  /** Label-free near-duplicate PAIRS via LSH blocking: vectors sharing a
    * sign-bucket are candidates (equi-join on bucket id — never
    * all-pairs), then exact cosine filters. The unlabeled-corpus
    * counterpart of label-blocked pairing. */
  def lshNearDupPairs(emb: DataFrame, idCol: String, vCol: String,
                      nPlanes: Int, dim: Int, minCos: Double): DataFrame = {
    val b = emb.select(col(idCol), col(vCol),
      lshBucket(col(vCol), nPlanes, dim).as("bucket"))
    val l = b.select(col("bucket"), col(idCol).as("id_a"), col(vCol).as("_va"))
    val r = b.select(col("bucket"), col(idCol).as("id_b"), col(vCol).as("_vb"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("_va"), col("_vb")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** LSH-bucketed ANN: candidates = rows sharing the query's bucket, then
    * exact cosine within the bucket. Single-probe; recall/cost tuned by
    * nPlanes. At scale the bucket column is precomputed + partitioned-by,
    * turning every query into a single-bucket scan. */
  def annTopK(emb: DataFrame, vCol: String, queryVec: DataFrame,
              qCol: String, k: Int, nPlanes: Int = 8, dim: Int = 64,
              tieBreak: Seq[Column] = Nil): DataFrame = {
    val bucketed = emb.withColumn("bucket", lshBucket(col(vCol), nPlanes, dim))
    val qb = queryVec.withColumn("qbucket", lshBucket(col(qCol), nPlanes, dim))
    bucketed.join(broadcast(qb), col("bucket") === col("qbucket"))
      .withColumn("cos", cosine(col(vCol), col(qCol)))
      .orderBy(col("cos").desc +: tieBreak: _*)
      .limit(k)
  }

  /** Product quantization (Jégou et al. 2011): split each vector into
    * `m` subvectors of `subDim` dims; per subspace, a k-codeword
    * codebook; a vector's code = per-subspace argmin squared distance.
    * Squared distance uses the dot identity ‖a−b‖² = a·a − 2a·b + b·b
    * with the sequential-fold dot product, so the DuckDB oracle is
    * bit-identical. Codebook size m×k is tiny by construction →
    * broadcast everywhere.
    *
    * Like the IVF family, the codebook is an EXPLICIT input of shape
    * `(j int, c long, w array<double>)` — borrowed ([[pqCodebook]]),
    * trained ([[pqTrain]]), or loaded. */
  /** Deterministic borrowed codebook: subvectors of the first k ids —
    * same reproducibility rationale (and same dense-id assumption) as
    * [[ivfCentroids]]. */
  def pqCodebook(emb: DataFrame, idCol: String, vCol: String,
                 m: Int, k: Int, subDim: Int): DataFrame = {
    val cents = emb.filter(col(idCol) < k)
      .select(col(idCol).cast("long").as("c"), col(vCol).as("_cv"))
    val js = emb.sparkSession.range(m).select(col("id").cast("int").as("j"))
    cents.crossJoin(broadcast(js))
      .select(col("j"), col("c"),
        slice(col("_cv"), col("j") * subDim + 1, lit(subDim)).as("w"))
  }

  /** Hash-sampled codebook init: the k seed vectors are the k smallest
    * by `md5(id)` — a deterministic stand-in for uniform random
    * sampling (the standard k-means init), reproducible across engines
    * (DuckDB's md5 agrees) with no RNG state, same pattern as the
    * md5-derived stratified sampling rates. Unlike [[pqCodebook]]'s
    * first-k borrow, a hash order is uncorrelated with data order, so
    * the seeds spread across the corpus's clusters instead of all
    * landing in whatever cluster happens to own the low ids — from a
    * collapsed init, Lloyd's can never recover (codewords that start
    * empty stay empty). Scale shape: orderBy+limit is a TakeOrdered
    * (top-k per partition + driver merge of k rows), never a global
    * sort. */
  def pqCodebookSampled(emb: DataFrame, idCol: String, vCol: String,
                        m: Int, k: Int, subDim: Int): DataFrame = {
    val seeds = emb
      .select(col(idCol), col(vCol),
        md5(col(idCol).cast("string")).as("_h"))
      .orderBy(col("_h"), col(idCol))
      .limit(k)
    // codeword id = hash rank; the window runs over the k collected
    // seed rows only (tiny)
    val ranked = seeds.withColumn("c",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("_h"), col(idCol))).cast("long") - 1)
      .select(col("c"), col(vCol).as("_cv"))
    val js = emb.sparkSession.range(m).select(col("id").cast("int").as("j"))
    ranked.crossJoin(broadcast(js))
      .select(col("j"), col("c"),
        slice(col("_cv"), col("j") * subDim + 1, lit(subDim)).as("w"))
  }

  private def dist2(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  /** Enforce the single-query contract AND evaluate the query-side plan
    * exactly once: collect the one row (limit(2) keeps the probe O(1))
    * and re-literalize it as a local relation, so every downstream use
    * (probe selection, ADC distance table) reads the literal instead of
    * re-running the caller's plan. */
  private def materializeSingleRow(queryVec: DataFrame, op: String): DataFrame = {
    val rows = queryVec.limit(2).collect()
    require(rows.length == 1,
      s"$op: queryVec must have exactly 1 row (got ${
        if (rows.length > 1) "2+" else "0"})")
    queryVec.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), queryVec.schema)
  }

  /** PQ encode against an explicit codebook: one (id, j, code) row per
    * vector and subspace — n×m×k distance evaluations against a
    * broadcast codebook, embarrassingly parallel (the standard PQ
    * encode cost); argmin ties break to the lower codeword id. The
    * argmin per (id, subspace) is a min_by aggregation (map-side
    * partial: shuffle n×m rows, not n×m×k). */
  def pqEncode(emb: DataFrame, idCol: String, vCol: String,
               codebook: DataFrame, subDim: Int): DataFrame =
    emb.crossJoin(broadcast(codebook))
      .withColumn("_sv", slice(col(vCol), col("j") * subDim + 1, lit(subDim)))
      .withColumn("_dist", dist2(col("_sv"), col("w")))
      .groupBy(col(idCol), col("j"))
      .agg(min_by(col("c"), struct(col("_dist"), col("c"))).as("code"))

  def pqEncode(emb: DataFrame, idCol: String, vCol: String,
               m: Int, k: Int, subDim: Int): DataFrame =
    pqEncode(emb, idCol, vCol, pqCodebook(emb, idCol, vCol, m, k, subDim),
      subDim)

  /** Distributed Lloyd's per subspace for the PQ codebook: every
    * subspace trains independently on its subvectors (assign by min
    * squared distance, ties to the lower codeword; recentre on the
    * round-6 element-wise mean; empty codewords keep their previous
    * value). Same determinism contract as [[ivfTrain]]: deterministic
    * init (hash-sampled by default, [[pqCodebookSampled]]) + fixed
    * iterations, so an oracle replays it. One broadcast + two
    * map-side-combined aggregations per iteration, across ALL subspaces
    * at once (j is just another grouping key — m never multiplies the
    * number of jobs). */
  def pqTrain(emb: DataFrame, idCol: String, vCol: String,
              m: Int, k: Int, subDim: Int, iters: Int): DataFrame =
    pqTrain(emb, idCol, vCol, m, k, subDim, iters,
      pqCodebookSampled(emb, idCol, vCol, m, k, subDim))

  /** As above with an EXPLICIT initial codebook (shape `(j, c, w)`) —
    * the hash-sampled init is the default ([[pqCodebookSampled]]; the
    * first-k borrow collapses when low ids are correlated, e.g. one
    * cluster owns them). */
  def pqTrain(emb: DataFrame, idCol: String, vCol: String,
              m: Int, k: Int, subDim: Int, iters: Int,
              init: DataFrame): DataFrame = {
    val js = emb.sparkSession.range(m).select(col("id").cast("int").as("j"))
    val sub = emb.select(col(idCol), col(vCol)).crossJoin(broadcast(js))
      .select(col(idCol), col("j"),
        slice(col(vCol), col("j") * subDim + 1, lit(subDim)).as("_sv"))
    var cb = init
    for (_ <- 0 until iters) {
      val enc = sub.join(broadcast(cb), Seq("j"))
        .withColumn("_dist", dist2(col("_sv"), col("w")))
        .groupBy(col(idCol), col("j"))
        .agg(min_by(struct(col("c"), col("_sv")),
          struct(col("_dist"), col("c"))).as("_best"))
        .select(col("j"), col("_best.c").as("c"), col("_best._sv").as("_sv"))
      val means = meanVec(enc, Seq(col("j"), col("c")), "_sv", subDim, "_mw")
      cb = cb.select(col("j"), col("c"), col("w").as("_prev"))
        .join(means, Seq("j", "c"), "left")
        .select(col("j"), col("c"),
          coalesce(col("_mw"), col("_prev")).as("w"))
        .localCheckpoint()
    }
    cb
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query builds an
    * m×k distance table against the codebook (tiny → broadcast); each
    * vector's approximate distance is the sum of its codes' table
    * entries, folded IN SUBSPACE ORDER so the accumulation is
    * deterministic and cross-engine exact. This is the IVF-PQ read
    * path at 100 TB: codes are bytes, the scan never touches the raw
    * vectors. */
  def pqAdcTopK(emb: DataFrame, idCol: String, vCol: String,
                queryVec: DataFrame, qCol: String, topK: Int,
                codebook: DataFrame, subDim: Int): DataFrame = {
    // single-query contract, enforced: a second query row would create
    // duplicate (j, code) keys in the broadcast distance table and the
    // join below would silently sum each subspace distance once per
    // query row. The probe doubles as the ONLY evaluation of the
    // query-side plan: the collected row is re-literalized as a local
    // relation, so the distance table below never recomputes it.
    val qv = Similarity.materializeSingleRow(queryVec, "pqAdcTopK")
    val dt = qv.crossJoin(codebook)
      .withColumn("_sq", slice(col(qCol), col("j") * subDim + 1, lit(subDim)))
      .select(col("j"), col("c").as("code"),
        dist2(col("_sq"), col("w")).as("_dj"))
    pqEncode(emb, idCol, vCol, codebook, subDim)
      .join(broadcast(dt), Seq("j", "code"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("j"), col("_dj")))).as("_ds"))
      .withColumn("adist",
        aggregate(col("_ds"), lit(0.0), (acc, x) => acc + x.getField("_dj")))
      .select(col(idCol), col("adist"))
      .orderBy(col("adist"), col(idCol))
      .limit(topK)
  }

  def pqAdcTopK(emb: DataFrame, idCol: String, vCol: String,
                queryVec: DataFrame, qCol: String, topK: Int,
                m: Int, k: Int, subDim: Int): DataFrame =
    pqAdcTopK(emb, idCol, vCol, queryVec, qCol, topK,
      pqCodebook(emb, idCol, vCol, m, k, subDim), subDim)

  /** ADC shortlist + EXACT re-rank — the FAISS "refine" read shape
    * (IndexRefineFlat; ScaNN calls it reordering): the quantized scan
    * ranks everything cheaply, then the true cosine is computed for
    * only the `shortlist` best candidates and the final top-k comes
    * from that exact pass. Quantization error then costs recall only
    * when a true neighbor falls outside the whole shortlist, so recall
    * jumps from the raw-ADC ceiling (measured 0.70 on the recall-spec
    * corpus) to ~1.0 at `shortlist` = 3·k, while the exact work stays
    * O(shortlist): the raw vectors are POINT-LOOKED-UP for the
    * shortlist ids (an id-keyed join the storage layer prunes via
    * min/max clustering + blooms), never scanned. */
  def pqAdcRefineTopK(emb: DataFrame, idCol: String, vCol: String,
                      queryVec: DataFrame, qCol: String, topK: Int,
                      shortlist: Int, codebook: DataFrame,
                      subDim: Int): DataFrame = {
    val qv = materializeSingleRow(queryVec, "pqAdcRefineTopK")
    val short = pqAdcTopK(emb, idCol, vCol, qv, qCol, shortlist,
      codebook, subDim).select(col(idCol))
    emb.join(broadcast(short), Seq(idCol))
      .crossJoin(broadcast(qv))
      .withColumn("cos", cosine(col(vCol), col(qCol)))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(topK)
  }

  /** Composed IVF-PQ search — the FAISS-IVFPQ read shape, i.e. the ANN
    * path that holds at 100 TB: the coarse quantizer restricts the
    * search to the query's `nProbe` cells, and distance WITHIN them
    * comes from the precomputed PQ codes via the broadcast ADC table,
    * so the search reads m byte-sized codes per candidate in the
    * probed cells and never a raw vector.
    *
    * `assigned` is [[ivfAssign]]'s output (cell per id) and `codes` is
    * [[pqEncode]]'s `(id, j, code)` — both computed ONCE at index-build
    * time; at scale both live clustered/partitioned by `cell`, which
    * turns the probe join below into a partition-pruned scan instead
    * of a shuffle. Quantizers are explicit relations (borrowed,
    * trained, or loaded). Single-query contract as [[pqAdcTopK]]. */
  def ivfPqTopK(assigned: DataFrame, idCol: String, codes: DataFrame,
                queryVec: DataFrame, qCol: String, topK: Int, nProbe: Int,
                centroids: DataFrame, codebook: DataFrame,
                subDim: Int): DataFrame = {
    // evaluate the query-side plan ONCE (it feeds the probe selection
    // AND the ADC distance table — without materialization it would
    // run up to three times per search)
    val qv = Similarity.materializeSingleRow(queryVec, "ivfPqTopK")
    val probes = qv.crossJoin(broadcast(centroids))
      .withColumn("_ccos", cosine(col(qCol), col("_cv")))
      .orderBy(col("_ccos").desc, col("_cid"))
      .limit(nProbe)
      .select(col("_cid").as("cell"))
    val dt = qv.crossJoin(codebook)
      .withColumn("_sq", slice(col(qCol), col("j") * subDim + 1, lit(subDim)))
      .select(col("j"), col("c").as("code"),
        dist2(col("_sq"), col("w")).as("_dj"))
    val candidates = assigned.join(broadcast(probes), "cell")
      .select(col(idCol))
    codes.join(candidates, Seq(idCol))
      .join(broadcast(dt), Seq("j", "code"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("j"), col("_dj")))).as("_ds"))
      .withColumn("adist",
        aggregate(col("_ds"), lit(0.0), (acc, x) => acc + x.getField("_dj")))
      .select(col(idCol), col("adist"))
      .orderBy(col("adist"), col(idCol))
      .limit(topK)
  }

  // ---- residual IVF-PQ (PQ over v − centroid, the FAISS IVFPQ
  //      encoding proper) ----

  /** Per-vector residuals against the assigned cell's centroid — the
    * quantity FAISS's IVFPQ actually product-quantizes (Jégou et al.
    * 2011 §IV.A): within a cell the residuals are centered near zero
    * and span a far smaller range than the raw vectors, so the same
    * m×k code budget quantizes them with much less error — raw-ADC
    * recall rises toward the cell-selection ceiling without any extra
    * read cost. `assigned` is [[ivfAssign]]'s output (must still carry
    * `vCol` and `cell`); output adds `out` = v − centroid(cell). One
    * broadcast join, no shuffle. */
  def ivfResiduals(assigned: DataFrame, vCol: String,
                   centroids: DataFrame, out: String = "_rv"): DataFrame =
    assigned.join(broadcast(centroids),
        assigned("cell") === centroids("_cid"))
      .withColumn(out, zip_with(col(vCol), col("_cv"), (a, b) => a - b))
      .drop("_cid", "_cv")

  /** Composed IVF-PQ search over RESIDUAL codes: the query's distance
    * table is built PER PROBED CELL against the query's own residual
    * (q − centroid), because within cell c the code approximates
    * ‖q−v‖² = ‖(q−c)−(v−c)‖². `codes` must carry `(idCol, cell, j,
    * code)` — [[pqEncode]] over [[ivfResiduals]] joined back to the
    * cell assignment. The ADC table grows to nProbe×m×k rows — still
    * broadcast-sized — and the (cell, j, code) join restricts the scan
    * to probed cells exactly as [[ivfPqTopK]]'s candidate join does. */
  def ivfPqResidualTopK(codes: DataFrame, idCol: String,
                        queryVec: DataFrame, qCol: String, topK: Int,
                        nProbe: Int, centroids: DataFrame,
                        codebook: DataFrame, subDim: Int): DataFrame =
    residualAdcTopK(codes, idCol, queryVec, qCol, topK, nProbe,
      centroids, codebook, subDim, rot = None, op = "ivfPqResidualTopK")

  /** Shared residual-ADC pipeline: probe selection → per-cell query
    * residual (optionally rotated into the codes' OPQ space) →
    * broadcast distance table → subspace-ordered ADC fold. ONE
    * implementation so tie-breaking/probe-ordering fixes can never
    * diverge between the plain and OPQ read paths. */
  private def residualAdcTopK(codes: DataFrame, idCol: String,
                              queryVec: DataFrame, qCol: String, topK: Int,
                              nProbe: Int, centroids: DataFrame,
                              codebook: DataFrame, subDim: Int,
                              rot: Option[Array[Array[Double]]],
                              op: String): DataFrame = {
    val qv = materializeSingleRow(queryVec, op)
    val qr0 = zip_with(col(qCol), col("_cv"), (a, b) => a - b)
    val qr = rot.fold(qr0)(r => rotateCol(qr0, r))
    val probes = qv.crossJoin(broadcast(centroids))
      .withColumn("_ccos", cosine(col(qCol), col("_cv")))
      .orderBy(col("_ccos").desc, col("_cid"))
      .limit(nProbe)
      .select(col("_cid").as("cell"), qr.as("_qr"))
    val dt = probes.crossJoin(codebook)
      .withColumn("_sq", slice(col("_qr"), col("j") * subDim + 1, lit(subDim)))
      .select(col("cell"), col("j"), col("c").as("code"),
        dist2(col("_sq"), col("w")).as("_dj"))
    codes.join(broadcast(dt), Seq("cell", "j", "code"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("j"), col("_dj")))).as("_ds"))
      .withColumn("adist",
        aggregate(col("_ds"), lit(0.0), (acc, x) => acc + x.getField("_dj")))
      .select(col(idCol), col("adist"))
      .orderBy(col("adist"), col(idCol))
      .limit(topK)
  }

  /** Residual IVF-PQ with the exact-refine tail — [[ivfPqResidualTopK]]
    * shortlist, then true cosine over the shortlist's raw vectors only
    * (point lookup, as [[ivfPqRefineTopK]]). */
  def ivfPqResidualRefineTopK(codes: DataFrame, idCol: String,
                              emb: DataFrame, vCol: String,
                              queryVec: DataFrame, qCol: String,
                              topK: Int, shortlist: Int, nProbe: Int,
                              centroids: DataFrame, codebook: DataFrame,
                              subDim: Int): DataFrame = {
    val qv = materializeSingleRow(queryVec, "ivfPqResidualRefineTopK")
    val short = ivfPqResidualTopK(codes, idCol, qv, qCol, shortlist,
      nProbe, centroids, codebook, subDim).select(col(idCol))
    emb.join(broadcast(short), Seq(idCol))
      .crossJoin(broadcast(qv))
      .withColumn("cos", cosine(col(vCol), col(qCol)))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(topK)
  }

  /** Composed IVF-PQ search with the exact-refine tail: probe cells →
    * ADC shortlist from byte codes ([[ivfPqTopK]]) → true cosine over
    * the shortlist only. The full 100 TB read path: corpus scan touches
    * codes in the probed cells; raw vectors are read for `shortlist`
    * ids via point lookup. Recall is then bounded by cell selection
    * (probes) rather than code resolution. */
  def ivfPqRefineTopK(assigned: DataFrame, idCol: String, codes: DataFrame,
                      emb: DataFrame, vCol: String,
                      queryVec: DataFrame, qCol: String, topK: Int,
                      shortlist: Int, nProbe: Int,
                      centroids: DataFrame, codebook: DataFrame,
                      subDim: Int): DataFrame = {
    val qv = materializeSingleRow(queryVec, "ivfPqRefineTopK")
    val short = ivfPqTopK(assigned, idCol, codes, qv, qCol, shortlist,
      nProbe, centroids, codebook, subDim).select(col(idCol))
    emb.join(broadcast(short), Seq(idCol))
      .crossJoin(broadcast(qv))
      .withColumn("cos", cosine(col(vCol), col(qCol)))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(topK)
  }

  /** Batch ANN — the production serving shape: N queries answered in
    * ONE pass instead of N jobs. The query relation `(qid, qv)` is
    * small (a request batch) and broadcasts; per-query top-k is a
    * window partitioned BY QUERY ID, so ranking parallelizes across
    * queries (no global sort, no SinglePartition; the q111-style
    * single-query `orderBy.limit` would serialize a batch). */
  def bruteForceTopKBatch(emb: DataFrame, idCol: String, vCol: String,
                          queries: DataFrame, qidCol: String, qCol: String,
                          k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("cos").desc, col(idCol))
    emb.crossJoin(broadcast(queries))
      .withColumn("cos", cosine(col(vCol), col(qCol)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col(qidCol), col(idCol), col("cos"))
  }

  /** Batch IVF ANN: each query probes ITS OWN nProbe nearest cells —
    * the probe relation is (nq × nProbe) rows, still broadcast-sized;
    * the candidate join stays a single equi-join on the cell id for
    * the whole batch. Same per-query window rank as
    * [[bruteForceTopKBatch]]. */
  def ivfTopKBatch(assigned: DataFrame, idCol: String, vCol: String,
                   queries: DataFrame, qidCol: String, qCol: String,
                   k: Int, nProbe: Int, centroids: DataFrame): DataFrame = {
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("_ccos").desc, col("_cid"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("_ccos", cosine(col(qCol), col("_cv")))
      .withColumn("_rn", row_number().over(pw))
      .filter(col("_rn") <= nProbe)
      .select(col(qidCol), col(qCol), col("_cid").as("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("cos").desc, col(idCol))
    assigned.join(broadcast(probes), "cell")
      .withColumn("cos", cosine(col(vCol), col(qCol)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col(qidCol), col(idCol), col("cos"))
  }

  /** Batch composed IVF-PQ: the full-scale read path for a request
    * batch — per-query probed cells (nq × nProbe rows) and a qid-keyed
    * ADC table (nq × m × k rows), both broadcast; one candidate join,
    * one codes join, per-query window rank. A code row joins once per
    * query that probes its cell, so the work is Σ(candidates per
    * query) — the same total as running the queries separately, in ONE
    * pass. */
  def ivfPqTopKBatch(assigned: DataFrame, idCol: String, codes: DataFrame,
                     queries: DataFrame, qidCol: String, qCol: String,
                     topK: Int, nProbe: Int, centroids: DataFrame,
                     codebook: DataFrame, subDim: Int): DataFrame = {
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("_ccos").desc, col("_cid"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("_ccos", cosine(col(qCol), col("_cv")))
      .withColumn("_rn", row_number().over(pw))
      .filter(col("_rn") <= nProbe)
      .select(col(qidCol), col("_cid").as("cell"))
    val candidates = assigned.join(broadcast(probes), "cell")
      .select(col(qidCol), col(idCol))
    val dt = queries.crossJoin(codebook)
      .withColumn("_sq", slice(col(qCol), col("j") * subDim + 1, lit(subDim)))
      .select(col(qidCol), col("j"), col("c").as("code"),
        dist2(col("_sq"), col("w")).as("_dj"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("adist"), col(idCol))
    codes.join(candidates, Seq(idCol))
      .join(broadcast(dt), Seq(qidCol, "j", "code"))
      .groupBy(col(qidCol), col(idCol))
      .agg(array_sort(collect_list(struct(col("j"), col("_dj")))).as("_ds"))
      .withColumn("adist",
        aggregate(col("_ds"), lit(0.0), (acc, x) => acc + x.getField("_dj")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= topK)
      .select(col(qidCol), col(idCol), col("adist"))
  }

  /** Batch ADC: the PQ read path for a request batch. The distance
    * table is keyed BY QUERY ID — (nq × m × k) rows, still broadcast-
    * sized — so one codes⋈table join and one (qid, id) aggregation
    * serve every query at once; this is the multi-query form whose
    * single-query contract [[pqAdcTopK]] enforces with a require. */
  def pqAdcTopKBatch(codes: DataFrame, idCol: String,
                     queries: DataFrame, qidCol: String, qCol: String,
                     topK: Int, codebook: DataFrame,
                     subDim: Int): DataFrame = {
    val dt = queries.crossJoin(codebook)
      .withColumn("_sq", slice(col(qCol), col("j") * subDim + 1, lit(subDim)))
      .select(col(qidCol), col("j"), col("c").as("code"),
        dist2(col("_sq"), col("w")).as("_dj"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("adist"), col(idCol))
    codes.join(broadcast(dt), Seq("j", "code"))
      .groupBy(col(qidCol), col(idCol))
      .agg(array_sort(collect_list(struct(col("j"), col("_dj")))).as("_ds"))
      .withColumn("adist",
        aggregate(col("_ds"), lit(0.0), (acc, x) => acc + x.getField("_dj")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= topK)
      .select(col(qidCol), col(idCol), col("adist"))
  }

  /** Batch exact-refine tail ([[pqAdcRefineTopK]]'s serving form): the
    * qid-keyed ADC shortlist proposes `shortlist` candidates per query,
    * the raw vectors are point-looked-up ONCE for the union of all
    * shortlists (one id-keyed join, pruned by the storage layer's
    * clustering/blooms), and the true cosine ranks per query via a
    * qid-partitioned window — never a global sort, same contract as the
    * other batch paths. */
  def pqAdcRefineTopKBatch(codes: DataFrame, idCol: String,
                           emb: DataFrame, vCol: String,
                           queries: DataFrame, qidCol: String, qCol: String,
                           topK: Int, shortlist: Int, codebook: DataFrame,
                           subDim: Int): DataFrame = {
    val short = pqAdcTopKBatch(codes, idCol, queries, qidCol, qCol,
      shortlist, codebook, subDim).select(col(qidCol), col(idCol))
    refineBatch(emb, idCol, vCol, short, queries, qidCol, qCol, topK)
  }

  /** Batch composed IVF-PQ with the exact-refine tail — the full
    * production serving path: per-query probed cells → qid-keyed ADC
    * shortlist from byte codes → one point-lookup of the shortlisted
    * raw vectors → per-query exact re-rank. */
  def ivfPqRefineTopKBatch(assigned: DataFrame, idCol: String,
                           codes: DataFrame, emb: DataFrame, vCol: String,
                           queries: DataFrame, qidCol: String, qCol: String,
                           topK: Int, shortlist: Int, nProbe: Int,
                           centroids: DataFrame, codebook: DataFrame,
                           subDim: Int): DataFrame = {
    val short = ivfPqTopKBatch(assigned, idCol, codes, queries, qidCol,
      qCol, shortlist, nProbe, centroids, codebook, subDim)
      .select(col(qidCol), col(idCol))
    refineBatch(emb, idCol, vCol, short, queries, qidCol, qCol, topK)
  }

  private def refineBatch(emb: DataFrame, idCol: String, vCol: String,
                          short: DataFrame, queries: DataFrame,
                          qidCol: String, qCol: String,
                          topK: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("cos").desc, col(idCol))
    emb.join(broadcast(short), Seq(idCol))
      .join(broadcast(queries), Seq(qidCol))
      .withColumn("cos", cosine(col(vCol), col(qCol)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= topK)
      .select(col(qidCol), col(idCol), col("cos"))
  }

  /** Semantic decontamination: flag training vectors whose cosine to
    * ANY eval-set vector reaches `tau` — the embedding-space complement
    * of n-gram decontamination (exact-match grams miss paraphrases;
    * embeddings catch them). Exactness is the point of a contamination
    * audit, so this is a full comparison against the eval side, NOT an
    * ANN shortcut — scalable because the eval set is small BY
    * CONSTRUCTION (benchmarks are thousands of rows, the corpus is
    * billions): broadcast the eval vectors once, one map-side pass over
    * the corpus, a per-id max aggregation, zero shuffles of the big
    * side beyond the group-by's map-side-combined partial. */
  def semanticContamination(train: DataFrame, idCol: String, vCol: String,
                            evalSet: DataFrame, eCol: String,
                            tau: Double, roundTo: Int = 4): DataFrame = {
    val p = math.pow(10, roundTo)
    train.crossJoin(broadcast(evalSet))
      .withColumn("_cos", cosine(col(vCol), col(eCol)))
      .groupBy(col(idCol))
      .agg(max(col("_cos")).as("_mc"))
      // flag on the ROUNDED value so the verdict is cross-engine exact
      .withColumn("max_eval_cos", floor(col("_mc") * p + 0.5) / p)
      .withColumn("contaminated", col("max_eval_cos") >= tau)
      .drop("_mc")
  }

  /** SemDeDup-shaped semantic dedup (Abbas et al. 2023, "SemDeDup"):
    * block vectors into IVF cells via the deterministic coarse
    * quantizer, then flag any vector whose cosine to a LOWER-id vector
    * in the SAME cell reaches `tau` as a semantic duplicate (the kept
    * representative is the cell-local min id, the paper's "keep one per
    * near-dup set" rule with a reproducible choice).
    *
    * Scale shape: the pairwise pass is an equi-join on the cell id —
    * quadratic only WITHIN a cell, the SemDeDup tradeoff; `nCentroids`
    * is the knob exactly like the paper's k-means k, and at 100 TB the
    * table is partitioned by cell so each cell's pass is local. */
  def semanticDupFlags(emb: DataFrame, idCol: String, vCol: String,
                       nCentroids: Int, tau: Double,
                       idStride: Long = 1L): DataFrame =
    semanticDupFlags(emb, idCol, vCol,
      ivfCentroids(emb, idCol, vCol, nCentroids, idStride), tau)

  /** [[semanticDupFlags]] against an explicit (borrowed/trained/loaded)
    * centroid relation. */
  def semanticDupFlags(emb: DataFrame, idCol: String, vCol: String,
                       centroids: DataFrame, tau: Double): DataFrame = {
    val assigned = ivfAssign(emb, idCol, vCol, centroids)
      .select(col(idCol), col("cell"), col(vCol))
    val a = assigned.select(col("cell"), col(idCol).as("_ia"), col(vCol).as("_va"))
    val b = assigned.select(col("cell"), col(idCol).as("_ib"), col(vCol).as("_vb"))
    val dups = a.join(b, "cell")
      .filter(col("_ib") < col("_ia"))
      .filter(cosine(col("_va"), col("_vb")) >= tau)
      .select(col("_ia").as(idCol)).distinct()
    assigned.join(dups.withColumn("_dup", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        coalesce(col("_dup"), lit(false)).as("is_dup"))
  }

  // ---- OPQ-style space rotation before the subspace split (Ge et al.,
  //      "Optimized Product Quantization", CVPR 2013) ----

  /** Per-dimension variances: one pos-exploded, map-side-combined
    * aggregation (n×d rows shuffled as d partials). */
  def dimVariances(emb: DataFrame, vCol: String, dim: Int): Array[Double] = {
    val rows = emb
      .select(posexplode(col(vCol).cast("array<double>")).as(Seq("_p", "_x")))
      .groupBy(col("_p")).agg(var_pop(col("_x")).as("_var"))
      .collect() // d rows
    val out = new Array[Double](dim)
    rows.foreach(r => out(r.getInt(0)) = r.getDouble(1))
    out
  }

  /** Variance-balanced dimension PERMUTATION — the axis-aligned special
    * case of OPQ's eigenvalue allocation: rank dimensions by variance
    * (descending, ties to the lower index) and snake-deal the ranks
    * across the m subspaces, so no subspace hoards the high-variance
    * axes the way the natural order does on PCA-like or sorted
    * embeddings. Closed-form from the rank (deal round r%..., no greedy
    * state), so a SQL oracle can replay it exactly. Returns `perm`
    * where new position i reads original dimension `perm(i)`. */
  def pqSnakePermutation(variances: Array[Double], m: Int): Seq[Int] = {
    val dim = variances.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val ranked = variances.zipWithIndex
      .sortBy { case (v, i) => (-v, i) }.map(_._2) // rank -> original dim
    val perm = new Array[Int](dim)
    ranked.zipWithIndex.foreach { case (origDim, r) =>
      val round = r / m
      val idx = r % m
      val subspace = if (round % 2 == 0) idx else m - 1 - idx // snake
      perm(subspace * subDim + round) = origDim
    }
    perm.toSeq
  }

  /** Apply a dimension permutation as a pure Column expression. */
  def permute(df: DataFrame, vCol: String, perm: Seq[Int],
              out: String): DataFrame =
    df.withColumn(out,
      array(perm.map(i => element_at(col(vCol), i + 1)): _*))

  /** OPQ non-parametric init rotation: eigendecompose the data
    * covariance (one distributed pass via RowMatrix.computeCovariance —
    * a d×d driver matrix, fine to d ≈ thousands) and allocate the
    * eigenvectors to the m subspaces balancing Σ log λ (the OPQ paper's
    * balanced-variance-product criterion), greedily into the emptiest
    * bucket. Deterministic: eigenpairs ordered by (−λ, index), greedy
    * ties to the lower bucket. Rows of the returned matrix are the
    * rotated basis in subspace order: rotated_i = R(i) · v. The
    * rotation is orthogonal, so distances — and therefore ADC — are
    * exact in the rotated space; only the subspace INDEPENDENCE
    * assumption improves. */
  def opqRotation(emb: DataFrame, vCol: String, dim: Int,
                  m: Int): Array[Array[Double]] = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    import org.apache.spark.mllib.linalg.Vectors
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rm = new RowMatrix(
      emb.select(col(vCol).cast("array<double>")).rdd
        .map(r => Vectors.dense(r.getSeq[Double](0).toArray)))
    val cov = rm.computeCovariance()
    val es = breeze.linalg.eigSym(
      new breeze.linalg.DenseMatrix(dim, dim, cov.toArray))
    // eigenpairs descending by eigenvalue
    val order = (0 until dim)
      .sortBy(i => (-es.eigenvalues(i), i))
    // greedy Σ log λ balance into m buckets of subDim slots
    val sums = new Array[Double](m)
    val buckets = Array.fill(m)(List.newBuilder[Int])
    val counts = new Array[Int](m)
    order.foreach { e =>
      val b = (0 until m).filter(counts(_) < subDim)
        .minBy(i => (sums(i), i))
      buckets(b) += e
      counts(b) += 1
      sums(b) += math.log(math.max(es.eigenvalues(e), 1e-12))
    }
    buckets.flatMap(_.result()).map { e =>
      Array.tabulate(dim)(j => es.eigenvectors(j, e))
    }
  }

  /** Rotation as a Column: d codegen'd dot products against literal
    * basis rows. */
  def rotateCol(c: Column, rot: Array[Array[Double]]): Column =
    array(rot.map(r =>
      dot(c.cast("array<double>"), typedlit(r.toSeq))).toIndexedSeq: _*)

  /** Apply a rotation matrix (rows = new basis) as Column expressions:
    * d codegen'd dot products per row against literal basis vectors. */
  def rotate(df: DataFrame, vCol: String, rot: Array[Array[Double]],
             out: String): DataFrame =
    df.withColumn(out, rotateCol(col(vCol), rot))

  /** Σ y·xᵀ over (x, y) vector pairs — the d×d Procrustes cross-matrix,
    * one distributed treeAggregate pass (a d×d accumulator per
    * partition, like RowMatrix.computeCovariance). */
  private def sumOuter(xy: DataFrame, dim: Int)
      : breeze.linalg.DenseMatrix[Double] = {
    xy.rdd.treeAggregate(breeze.linalg.DenseMatrix.zeros[Double](dim, dim))(
      (acc, row) => {
        val x = row.getSeq[Double](0)
        val y = row.getSeq[Double](1)
        var i = 0
        while (i < dim) {
          var j = 0
          while (j < dim) { acc(i, j) += y(i) * x(j); j += 1 }
          i += 1
        }
        acc
      },
      _ + _)
  }

  /** FULL OPQ (the parametric alternation of Ge et al. §4): start from
    * the eigen-allocation rotation, then alternate
    *   (1) Lloyd's PQ codebook in the rotated space,
    *   (2) the optimal orthogonal rotation for that codebook — the
    *       Procrustes solution R = U·Vᵀ of Σ y·xᵀ = U·S·Vᵀ, where y is
    *       each vector's CODEWORD RECONSTRUCTION.
    * Each alternation is two distributed passes (encode+decode, then
    * the d×d cross-matrix) plus a driver-side d×d SVD. Deterministic:
    * seeded init, fixed iteration counts, no RNG. Returns (rotation,
    * codebook-in-rotated-space); encode/search must apply the rotation
    * to vectors and queries alike ([[rotateCol]]). */
  def opqTrain(emb: DataFrame, idCol: String, vCol: String, dim: Int,
               m: Int, k: Int, subDim: Int, lloydIters: Int,
               opqIters: Int,
               initRot: Option[Array[Array[Double]]] = None)
      : (Array[Array[Double]], DataFrame) = {
    var rot = initRot.getOrElse(opqRotation(emb, vCol, dim, m))
    var cb: DataFrame = null
    val x = emb.select(col(idCol),
      col(vCol).cast("array<double>").as("_x"))
    for (t <- 0 until opqIters) {
      val w = x.withColumn("_w", rotateCol(col("_x"), rot))
      // carry the codebook across alternations (monotone total error):
      // only the FIRST round starts from the hash-sampled init
      cb = (if (cb == null) pqTrain(w, idCol, "_w", m, k, subDim, lloydIters)
            else pqTrain(w, idCol, "_w", m, k, subDim, lloydIters, cb))
        .localCheckpoint()
      if (t < opqIters - 1) {
        val recon = pqEncode(w, idCol, "_w", cb, subDim)
          .join(broadcast(cb.withColumnRenamed("c", "code")), Seq("j", "code"))
          .groupBy(col(idCol))
          .agg(array_sort(collect_list(struct(col("j"), col("w")))).as("_l"))
          .select(col(idCol),
            flatten(transform(col("_l"), s => s.getField("w"))).as("_y"))
        val a = sumOuter(x.join(recon, idCol).select(col("_x"), col("_y")), dim)
        val svd = breeze.linalg.svd(a)
        val r = svd.U * svd.Vt
        rot = Array.tabulate(dim)(i => Array.tabulate(dim)(j => r(i, j)))
      }
    }
    (rot, cb)
  }

  /** [[ivfPqResidualTopK]] with an OPQ rotation on the RESIDUAL space:
    * codes were trained on rotated residuals, so the query side rotates
    * its per-cell residual (q − centroid) with the same matrix before
    * building the distance table. The rotation is orthogonal —
    * ‖R(q−c) − R(v−c)‖ = ‖(q−c) − (v−c)‖ — so ADC stays exact in the
    * rotated space and cell selection is untouched. */
  def ivfPqOpqResidualTopK(codes: DataFrame, idCol: String,
                           queryVec: DataFrame, qCol: String, topK: Int,
                           nProbe: Int, centroids: DataFrame,
                           codebook: DataFrame, subDim: Int,
                           rot: Array[Array[Double]]): DataFrame =
    residualAdcTopK(codes, idCol, queryVec, qCol, topK, nProbe,
      centroids, codebook, subDim, rot = Some(rot),
      op = "ivfPqOpqResidualTopK")
}
