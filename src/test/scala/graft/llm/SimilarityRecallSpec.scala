package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Measures the QUALITY of the approximate-similarity family — not just
  * reproducibility. Ground truth is [[Similarity.bruteForceTopK]] (the
  * exact baseline, q44); every ANN variant's recall@10 is measured
  * against it on a clustered corpus with planted near-neighbors (the
  * regime ANN indexes exist for — uniform random vectors in high dim
  * have no meaningful neighbors to recall).
  *
  * Deterministic: corpus from a fixed-seed JVM Random, hyperplanes from
  * [[Similarity.planeWeights]] (md5), trained quantizers from
  * fixed-iteration Lloyd's with borrowed init. Thresholds hold ~15-20
  * points of margin under the measured values so they lock a quality
  * floor, not an exact number.
  */
class SimilarityRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 16
  private val nClusters = 25
  private val perCluster = 16
  private val n = nClusters * perCluster // 400
  private val k10 = 10

  /** Cluster centers on the unit sphere-ish; members = center + noise. */
  private lazy val (corpus, queries) = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
    val rows = (0 until n).map { i =>
      val c = centers(i / perCluster)
      (i.toLong, c.map(x => x + 0.25 * rnd.nextGaussian()).toSeq)
    }
    val qs = (0 until 10).map { q =>
      val c = centers((q * 2) % nClusters)
      c.map(x => x + 0.25 * rnd.nextGaussian()).toSeq
    }
    import spark.implicits._
    (rows.toDF("id", "v").cache(), qs)
  }

  private def qDf(q: Seq[Double]): DataFrame = {
    import spark.implicits._
    Seq(Tuple1(q)).toDF("qv")
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  private def recall(got: Set[Long], truth: Set[Long]): Double =
    got.intersect(truth).size.toDouble / truth.size

  /** truth top-10 per query, computed once. */
  private lazy val truths: Seq[Set[Long]] = queries.map { q =>
    ids(Similarity.bruteForceTopK(corpus, "v", qDf(q), "qv", k10))
  }

  private def avgRecall(f: Seq[Double] => DataFrame): Double =
    queries.zip(truths).map { case (q, t) => recall(ids(f(q)), t) }
      .sum / queries.size

  test("LSH single-probe recall@10 >= 0.5 on clustered corpus") {
    val r = avgRecall { q =>
      Similarity.annTopK(corpus, "v", qDf(q), "qv", k10, nPlanes = 6, dim = dim)
    }
    info(f"lsh single-probe recall@10 = $r%.3f")
    assert(r >= 0.5, f"single-probe LSH recall $r%.3f below floor")
  }

  test("LSH multi-probe recall@10 >= 0.78 and beats single-probe") {
    val single = avgRecall { q =>
      Similarity.annTopK(corpus, "v", qDf(q), "qv", k10, nPlanes = 6, dim = dim)
    }
    val multi = avgRecall { q =>
      Similarity.annTopKMultiProbe(corpus, "v", qDf(q), "qv", k10,
        nPlanes = 6, dim = dim)
    }
    info(f"lsh multi-probe recall@10 = $multi%.3f (single $single%.3f)")
    assert(multi >= 0.78, f"multi-probe LSH recall $multi%.3f below floor")
    assert(multi >= single, "multi-probe must not lose recall vs single-probe")
  }

  test("IVF 4-probe recall@10 >= 0.85 borrowed; trained >= borrowed - 0.05") {
    val borrowed = Similarity.ivfCentroids(corpus, "id", "v",
      nCentroids = nClusters, idStride = perCluster.toLong)
    val trained = Similarity.ivfTrain(corpus, "id", "v",
      nCentroids = nClusters, dim = dim, iters = 3,
      idStride = perCluster.toLong)

    def ivfRecall(cents: DataFrame): Double = {
      val assigned = Similarity.ivfAssign(corpus, "id", "v", cents).cache()
      val r = avgRecall { q =>
        Similarity.ivfTopK(assigned, "v", qDf(q), "qv", k10,
          nProbe = 4, cents, tieBreak = Seq(col("id")))
      }
      assigned.unpersist()
      r
    }

    val rb = ivfRecall(borrowed)
    val rt = ivfRecall(trained)
    info(f"ivf 4-probe recall@10: borrowed = $rb%.3f, trained = $rt%.3f")
    assert(rb >= 0.85, f"borrowed-centroid IVF recall $rb%.3f below floor")
    assert(rt >= rb - 0.05,
      f"trained centroids ($rt%.3f) regressed vs borrowed ($rb%.3f)")
  }

  test("PQ ADC recall@10 >= 0.45 borrowed; trained codebook >= borrowed - 0.1") {
    val m = 4; val kCodes = 16; val subDim = dim / m
    val borrowed = Similarity.pqCodebook(corpus, "id", "v", m, kCodes, subDim)
      .cache()
    val trained = Similarity.pqTrain(corpus, "id", "v", m, kCodes, subDim,
      iters = 3).cache()

    def pqRecall(cb: DataFrame): Double =
      avgRecall { q =>
        Similarity.pqAdcTopK(corpus, "id", "v", qDf(q), "qv", k10, cb, subDim)
      }

    val rb = pqRecall(borrowed)
    val rt = pqRecall(trained)
    info(f"pq adc recall@10: borrowed = $rb%.3f, trained = $rt%.3f")
    assert(rb >= 0.45, f"borrowed-codebook PQ recall $rb%.3f below floor")
    assert(rt >= rb - 0.1,
      f"trained codebook ($rt%.3f) regressed vs borrowed ($rb%.3f)")
  }

  test("PQ refine (ADC shortlist + exact re-rank) recall@10 >= 0.85") {
    // the production answer to raw ADC's resolution ceiling (measured
    // ~0.70 at m=4/k=16 — more Lloyd's iterations do NOT raise it, the
    // quantizer is converged): re-rank the 3k-candidate shortlist with
    // the true cosine. Recall is then bounded by shortlist membership
    val m = 4; val kCodes = 16; val subDim = dim / m
    val cb = Similarity.pqTrain(corpus, "id", "v", m, kCodes, subDim,
      iters = 3).cache()
    val r = avgRecall { q =>
      Similarity.pqAdcRefineTopK(corpus, "id", "v", qDf(q), "qv", k10,
        shortlist = 3 * k10, codebook = cb, subDim = subDim)
    }
    info(f"pq refine recall@10 = $r%.3f")
    assert(r >= 0.85, f"PQ refine recall $r%.3f below floor")
    cb.unpersist()
  }

  test("composed IVF-PQ refine recall@10 >= 0.85 (the full read path)") {
    val m = 4; val kCodes = 16; val subDim = dim / m
    val cents = Similarity.ivfTrain(corpus, "id", "v",
      nCentroids = nClusters, dim = dim, iters = 3,
      idStride = perCluster.toLong)
    val assigned = Similarity.ivfAssign(corpus, "id", "v", cents)
      .select(col("id"), col("cell")).cache()
    val cb = Similarity.pqTrain(corpus, "id", "v", m, kCodes, subDim,
      iters = 3).cache()
    val codes = Similarity.pqEncode(corpus, "id", "v", cb, subDim).cache()
    val r = avgRecall { q =>
      Similarity.ivfPqRefineTopK(assigned, "id", codes, corpus, "v",
        qDf(q), "qv", k10, shortlist = 3 * k10, nProbe = 4,
        cents, cb, subDim)
    }
    info(f"ivf-pq refine recall@10 (4-probe) = $r%.3f")
    assert(r >= 0.85, f"composed IVF-PQ refine recall $r%.3f below floor")
    assigned.unpersist(); cb.unpersist(); codes.unpersist()
  }

  test("composed IVF-PQ recall@10 >= 0.4 (both approximations stacked)") {
    // the 100 TB read path loses recall to BOTH the cell restriction
    // and the code quantization; with trained quantizers it must still
    // find a usable fraction of the true neighbors, and probing MORE
    // cells must not lose recall
    val m = 4; val kCodes = 16; val subDim = dim / m
    val cents = Similarity.ivfTrain(corpus, "id", "v",
      nCentroids = nClusters, dim = dim, iters = 3,
      idStride = perCluster.toLong)
    val assigned = Similarity.ivfAssign(corpus, "id", "v", cents)
      .select(col("id"), col("cell")).cache()
    val cb = Similarity.pqTrain(corpus, "id", "v", m, kCodes, subDim,
      iters = 3).cache()
    val codes = Similarity.pqEncode(corpus, "id", "v", cb, subDim).cache()

    def run(nProbe: Int): Double = avgRecall { q =>
      Similarity.ivfPqTopK(assigned, "id", codes, qDf(q), "qv", k10,
        nProbe, cents, cb, subDim)
    }
    val r4 = run(4)
    val r8 = run(8)
    info(f"ivf-pq recall@10: 4-probe = $r4%.3f, 8-probe = $r8%.3f")
    assert(r4 >= 0.4, f"composed IVF-PQ recall $r4%.3f below floor")
    assert(r8 >= r4, "more probes must not lose recall")
    assigned.unpersist(); cb.unpersist(); codes.unpersist()
  }

  test("RESIDUAL IVF-PQ raw-ADC recall@10 >= 0.7 and beats raw-vector codes") {
    // the FAISS-IVFPQ encoding proper: PQ over v − centroid. Within a
    // cell the residuals span a far smaller range than the raw vectors,
    // so the same m×k code budget loses far less to quantization — the
    // raw-ADC number (no refine pass) should approach the IVF
    // cell-selection ceiling (1.0 at 4 probes on this corpus)
    val m = 4; val kCodes = 16; val subDim = dim / m
    val cents = Similarity.ivfTrain(corpus, "id", "v",
      nCentroids = nClusters, dim = dim, iters = 3,
      idStride = perCluster.toLong)
    val assigned = Similarity.ivfAssign(corpus, "id", "v", cents).cache()
    val res = Similarity.ivfResiduals(assigned, "v", cents).cache()
    val cbR = Similarity.pqTrain(res, "id", "_rv", m, kCodes, subDim,
      iters = 3).cache()
    val codesR = Similarity.pqEncode(res, "id", "_rv", cbR, subDim)
      .join(res.select(col("id"), col("cell")), "id").cache()

    // raw-vector baseline at the same budget
    val cb = Similarity.pqTrain(corpus, "id", "v", m, kCodes, subDim,
      iters = 3).cache()
    val codes = Similarity.pqEncode(corpus, "id", "v", cb, subDim).cache()
    val plainAssigned = assigned.select(col("id"), col("cell"))

    val rResidual = avgRecall { q =>
      Similarity.ivfPqResidualTopK(codesR, "id", qDf(q), "qv", k10,
        nProbe = 4, cents, cbR, subDim)
    }
    val rPlain = avgRecall { q =>
      Similarity.ivfPqTopK(plainAssigned, "id", codes, qDf(q), "qv", k10,
        nProbe = 4, cents, cb, subDim)
    }
    info(f"ivf-pq raw-ADC recall@10 (4-probe): residual = $rResidual%.3f, " +
      f"raw-vector = $rPlain%.3f")
    assert(rResidual >= 0.7,
      f"residual IVF-PQ recall $rResidual%.3f below floor")
    assert(rResidual >= rPlain,
      f"residual codes ($rResidual%.3f) must not lose to raw codes ($rPlain%.3f)")
    assigned.unpersist(); res.unpersist(); cbR.unpersist()
    codesR.unpersist(); cb.unpersist(); codes.unpersist()
  }

  // ---- OPQ (r7): learned rotation before the subspace split ---------

  /** Anisotropic twin of the corpus: v' = Q·D·v with Q a seeded random
    * orthogonal matrix and D a decaying diagonal (condition ~20) — the
    * regime real embeddings live in and the one OPQ exists for. On the
    * ISOTROPIC corpus above, within-cluster noise is rotation-invariant
    * by construction, so NO rotation can improve the codes (measured:
    * OPQ lowers total quantization error 1024 -> 544 yet recall stays
    * ~0.8 — the error reduction is all in between-cluster directions).
    */
  private lazy val anisoMap: Array[Array[Double]] = {
    val rnd = new scala.util.Random(11)
    val g = breeze.linalg.DenseMatrix.fill(dim, dim)(rnd.nextGaussian())
    val q = breeze.linalg.qr(g).q
    val d = breeze.linalg.diag(breeze.linalg.DenseVector.tabulate(dim)(i =>
      math.pow(0.82, i)))
    val a = q * d
    Array.tabulate(dim)(i => Array.tabulate(dim)(j => a(i, j)))
  }

  private def mapVec(q: Seq[Double]): Seq[Double] =
    anisoMap.map(row => row.zip(q).map { case (a, b) => a * b }.sum).toSeq

  private lazy val anisoCorpus = {
    import spark.implicits._
    corpus.collect().map(r =>
      (r.getLong(0), mapVec(r.getSeq[Double](1)))).toSeq
      .toDF("id", "v").cache()
  }
  private lazy val anisoQueries: Seq[Seq[Double]] = queries.map(mapVec)
  private lazy val anisoTruths: Seq[Set[Long]] = anisoQueries.map { q =>
    ids(Similarity.bruteForceTopK(anisoCorpus, "v", qDf(q), "qv", k10))
  }
  private def anisoAvgRecall(f: Seq[Double] => DataFrame): Double =
    anisoQueries.zip(anisoTruths).map { case (q, t) => recall(ids(f(q)), t) }
      .sum / anisoQueries.size

  test("OPQ alternation monotonically reduces quantization error") {
    // the implementation invariant that holds on ANY corpus: each
    // Lloyd's step and each Procrustes rotation step lowers (never
    // raises) total squared reconstruction error
    val m = 4; val kCodes = 16; val subDim = dim / m
    val eye = Array.tabulate(dim)(i =>
      Array.tabulate(dim)(j => if (i == j) 1.0 else 0.0))
    def qerr(rot: Array[Array[Double]], cb: DataFrame): Double = {
      val w = Similarity.rotate(corpus, "v", rot, "_w")
        .select(col("id"), col("_w"))
      val recon = Similarity.pqEncode(w, "id", "_w", cb, subDim)
        .join(broadcast(cb.withColumnRenamed("c", "code")), Seq("j", "code"))
        .groupBy(col("id"))
        .agg(array_sort(collect_list(struct(col("j"), col("w")))).as("_l"))
        .select(col("id"),
          flatten(transform(col("_l"), x => x.getField("w"))).as("_y"))
      w.join(recon, "id")
        .select(aggregate(zip_with(col("_w"), col("_y"),
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x).as("e"))
        .agg(sum(col("e"))).collect()(0).getDouble(0)
    }
    val errs = (1 to 3).map { it =>
      val (rot, cb) = Similarity.opqTrain(corpus, "id", "v", dim, m, kCodes,
        subDim, lloydIters = 2, opqIters = it, initRot = Some(eye))
      qerr(rot, cb)
    }
    info(f"qerr by opqIters: ${errs.map(e => f"$e%.1f").mkString(" -> ")}")
    assert(errs.sliding(2).forall { case Seq(a, b) => b <= a + 1e-6 },
      s"alternation raised quantization error: $errs")
  }

  test("OPQ raw-ADC beats plain PQ on anisotropic embeddings (same budget)") {
    // q111's budget (m=4, k=16): on correlated dims the axis-aligned
    // split wastes codewords; the learned rotation recovers a large
    // fraction of the loss (measured 0.64 plain -> 0.77 OPQ). The
    // floors hold margin; the >= plain + 0.05 delta is the mechanism
    // claim itself.
    val m = 4; val kCodes = 16; val subDim = dim / m
    val cbPlain = Similarity.pqTrain(anisoCorpus, "id", "v", m, kCodes,
      subDim, iters = 3).cache()
    val rPlain = anisoAvgRecall { q =>
      Similarity.pqAdcTopK(anisoCorpus, "id", "v", qDf(q), "qv", k10,
        cbPlain, subDim)
    }
    val (rot, cbOpq) = Similarity.opqTrain(anisoCorpus, "id", "v", dim,
      m, kCodes, subDim, lloydIters = 4, opqIters = 2)
    val rotated = Similarity.rotate(anisoCorpus, "v", rot, "_w")
      .select(col("id"), col("_w")).cache()
    def rotQ(q: Seq[Double]): Seq[Double] =
      rot.map(row => row.zip(q).map { case (a, b) => a * b }.sum).toSeq
    val rOpq = anisoAvgRecall { q =>
      Similarity.pqAdcTopK(rotated, "id", "_w", qDf(rotQ(q)), "qv",
        k10, cbOpq, subDim)
    }
    info(f"anisotropic raw-ADC recall@10: plain = $rPlain%.3f, opq = $rOpq%.3f")
    assert(rOpq >= 0.70, f"OPQ raw-ADC $rOpq%.3f below floor")
    assert(rOpq >= rPlain + 0.05,
      f"OPQ ($rOpq%.3f) must beat plain ($rPlain%.3f) on correlated dims")
    cbPlain.unpersist(); rotated.unpersist()
  }

  test("residual raw-ADC recall@10 >= 0.85 at the 16-bit code budget") {
    // the r6 polish target (raw-ADC 0.80 -> >= 0.85, identical budget),
    // reached by SPENDING THE SAME BITS BETTER, measured on both corpus
    // geometries:
    //  - isotropic fixture: reslice m=4,k=16 (4 bits x 4 subspaces) to
    //    m=2,k=256 (8 bits x 2) — same 16 bits/vector, finer codewords
    //    where the isotropic noise needs them (0.800 -> 0.870). No
    //    rotation can help here: within-cell residual noise is
    //    rotation-invariant by construction (OPQ measured flat-to-worse
    //    while still LOWERING quantization error — MSE is not ranking).
    //  - anisotropic corpus (the realistic geometry): residual coding
    //    alone already clears the floor at m=4,k=16 (measured 0.880).
    // Guidance this test locks in: budget goes residual-first, then
    // subspace slicing, then OPQ (which wins only on correlated dims —
    // previous test).
    val cents = Similarity.ivfTrain(corpus, "id", "v",
      nCentroids = nClusters, dim = dim, iters = 3,
      idStride = perCluster.toLong)
    val assigned = Similarity.ivfAssign(corpus, "id", "v", cents).cache()
    val res = Similarity.ivfResiduals(assigned, "v", cents).cache()
    val m2 = 2; val k256 = 256; val sd2 = dim / m2
    val cb2 = Similarity.pqTrain(res, "id", "_rv", m2, k256, sd2,
      iters = 3).cache()
    val codes2 = Similarity.pqEncode(res, "id", "_rv", cb2, sd2)
      .join(res.select(col("id"), col("cell")), "id").cache()
    val rIso = avgRecall { q =>
      Similarity.ivfPqResidualTopK(codes2, "id", qDf(q), "qv", k10,
        nProbe = 4, cents, cb2, sd2)
    }

    val m4 = 4; val k16 = 16; val sd4 = dim / m4
    val centsA = Similarity.ivfTrain(anisoCorpus, "id", "v",
      nCentroids = nClusters, dim = dim, iters = 3,
      idStride = perCluster.toLong)
    val assignedA = Similarity.ivfAssign(anisoCorpus, "id", "v", centsA)
      .cache()
    val resA = Similarity.ivfResiduals(assignedA, "v", centsA).cache()
    val cbA = Similarity.pqTrain(resA, "id", "_rv", m4, k16, sd4,
      iters = 3).cache()
    val codesA = Similarity.pqEncode(resA, "id", "_rv", cbA, sd4)
      .join(resA.select(col("id"), col("cell")), "id").cache()
    val rAniso = anisoAvgRecall { q =>
      Similarity.ivfPqResidualTopK(codesA, "id", qDf(q), "qv", k10,
        nProbe = 4, centsA, cbA, sd4)
    }
    info(f"residual raw-ADC recall@10 at 16 bits: " +
      f"iso m=2/k=256 = $rIso%.3f, aniso m=4/k=16 = $rAniso%.3f")
    assert(rIso >= 0.85, f"resliced residual raw-ADC $rIso%.3f below 0.85")
    assert(rAniso >= 0.85, f"aniso residual raw-ADC $rAniso%.3f below 0.85")
    assigned.unpersist(); res.unpersist(); cb2.unpersist()
    codes2.unpersist(); assignedA.unpersist(); resA.unpersist()
    cbA.unpersist(); codesA.unpersist()
  }
}
