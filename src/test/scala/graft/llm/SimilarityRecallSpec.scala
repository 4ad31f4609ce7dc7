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
}
