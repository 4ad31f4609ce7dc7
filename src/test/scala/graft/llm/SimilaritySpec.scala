package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Semantic dedup (SemDeDup shape) and sequence packing semantics on
  * hand-built fixtures. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("semanticDupFlags: lower-id witness within a cell flags the dup") {
    // 2 orthogonal directions; centroids = ids 0 and 1. id 2 is nearly
    // id 0's vector (cos ~ 0.9987 >= 0.95 -> dup, witness id 0); id 3 is
    // a rotated vector in id 1's cell but below tau (cos ~ 0.89).
    val e = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.0, 1.0)),
      (2L, Seq(1.0, 0.05)),
      (3L, Seq(0.5, 1.0)))
      .toDF("vec_id", "v")
    val out = Similarity.semanticDupFlags(e, "vec_id", "v",
        nCentroids = 2, tau = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(0L) == (0L, false)) // centroid itself, kept
    assert(out(1L) == (1L, false))
    assert(out(2L)._1 == 0L && out(2L)._2, "near-copy of id 0 must flag")
    assert(out(3L)._1 == 1L && !out(3L)._2, "below-tau vector must keep")
  }

  test("semanticDupFlags: duplicates in different cells are NOT flagged") {
    // ids 2 and 3 are identical but land in different cells (each is a
    // centroid's near-copy) — blocking semantics: only same-cell pairs
    // are compared, so neither flags against the other; both flag
    // against their own cell's centroid instead.
    val e = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.0, 1.0)),
      (2L, Seq(1.0, 0.01)),
      (3L, Seq(0.01, 1.0)))
      .toDF("vec_id", "v")
    val out = Similarity.semanticDupFlags(e, "vec_id", "v",
        nCentroids = 2, tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(0L -> false, 1L -> false, 2L -> true, 3L -> true))
  }

  test("batch ANN == per-query single ANN (brute and IVF)") {
    val rnd = new scala.util.Random(3)
    val e = (0L until 120L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
      .toDF("vec_id", "v").cache()
    val qids = Seq(5L, 40L, 99L)
    val qs = e.filter($"vec_id".isin(qids: _*))
      .select($"vec_id".as("qid"), $"v".as("qv"))

    // brute force: the batch answer for each qid equals the single-query
    // top-k (same ranking, same tie-break)
    val batch = Similarity.bruteForceTopKBatch(e, "vec_id", "v",
        qs, "qid", "qv", k = 7)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    qids.foreach { q =>
      val single = Similarity.bruteForceTopK(e, "v",
          e.filter($"vec_id" === q).select($"v".as("qv")), "qv", 7)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      assert(batch(q) == single, s"brute batch diverged for qid $q")
    }

    // IVF: same equivalence through the probed-cell path
    val cents = Similarity.ivfCentroids(e, "vec_id", "v",
      nCentroids = 8, idStride = 15)
    val assigned = Similarity.ivfAssign(e, "vec_id", "v", cents).cache()
    val ivfBatch = Similarity.ivfTopKBatch(assigned, "vec_id", "v",
        qs, "qid", "qv", k = 7, nProbe = 3, cents)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    qids.foreach { q =>
      val single = Similarity.ivfTopK(assigned, "v",
          e.filter($"vec_id" === q).select($"v".as("qv")), "qv", 7,
          nProbe = 3, cents, tieBreak = Seq($"vec_id"))
        .collect().map(_.getAs[Long]("vec_id")).toSet
      assert(ivfBatch(q) == single, s"ivf batch diverged for qid $q")
    }
    // PQ ADC: batch result per qid == the single-query contract path
    val cb = Similarity.pqCodebook(e, "vec_id", "v", 4, 8, 2)
    val codes = Similarity.pqEncode(e, "vec_id", "v", cb, 2)
    val adcBatch = Similarity.pqAdcTopKBatch(codes, "vec_id",
        qs, "qid", "qv", topK = 7, cb, subDim = 2)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(r => (r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet }
    qids.foreach { q =>
      val single = Similarity.pqAdcTopK(e, "vec_id", "v",
          e.filter($"vec_id" === q).select($"v".as("qv")), "qv", 7, cb, 2)
        .collect().map(r => (r.getAs[Long]("vec_id"),
          math.round(r.getAs[Double]("adist") * 1e9))).toSet
      assert(adcBatch(q) == single, s"adc batch diverged for qid $q")
    }
    // composed IVF-PQ: batch per qid == the single-query composition
    val ipBatch = Similarity.ivfPqTopKBatch(assigned.select($"vec_id", $"cell"),
        "vec_id", codes, qs, "qid", "qv", topK = 7, nProbe = 3, cents, cb,
        subDim = 2)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(r => (r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet }
    qids.foreach { q =>
      val single = Similarity.ivfPqTopK(assigned.select($"vec_id", $"cell"),
          "vec_id", codes,
          e.filter($"vec_id" === q).select($"v".as("qv")), "qv", 7,
          nProbe = 3, cents, cb, subDim = 2)
        .collect().map(r => (r.getAs[Long]("vec_id"),
          math.round(r.getAs[Double]("adist") * 1e9))).toSet
      assert(ipBatch(q) == single, s"ivf-pq batch diverged for qid $q")
    }
    // REFINE tails: batch per qid == the single-query refine (both PQ
    // and composed IVF-PQ)
    val rfBatch = Similarity.pqAdcRefineTopKBatch(codes, "vec_id", e, "v",
        qs, "qid", "qv", topK = 7, shortlist = 21, cb, subDim = 2)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(r => (r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet }
    qids.foreach { q =>
      val single = Similarity.pqAdcRefineTopK(e, "vec_id", "v",
          e.filter($"vec_id" === q).select($"v".as("qv")), "qv", 7,
          shortlist = 21, cb, subDim = 2)
        .collect().map(r => (r.getAs[Long]("vec_id"),
          math.round(r.getAs[Double]("cos") * 1e9))).toSet
      assert(rfBatch(q) == single, s"pq refine batch diverged for qid $q")
    }
    val iprBatch = Similarity.ivfPqRefineTopKBatch(
        assigned.select($"vec_id", $"cell"), "vec_id", codes, e, "v",
        qs, "qid", "qv", topK = 7, shortlist = 21, nProbe = 3, cents, cb,
        subDim = 2)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(r => (r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet }
    qids.foreach { q =>
      val single = Similarity.ivfPqRefineTopK(
          assigned.select($"vec_id", $"cell"), "vec_id", codes, e, "v",
          e.filter($"vec_id" === q).select($"v".as("qv")), "qv", 7,
          shortlist = 21, nProbe = 3, cents, cb, subDim = 2)
        .collect().map(r => (r.getAs[Long]("vec_id"),
          math.round(r.getAs[Double]("cos") * 1e9))).toSet
      assert(iprBatch(q) == single, s"ivf-pq refine batch diverged for qid $q")
    }
    e.unpersist(); assigned.unpersist()
  }

  test("pqEncode: codeword-source vectors encode to their own codes") {
    // 4 vectors in 2 subspaces of 2 dims, k=2 codewords borrowed from
    // ids 0/1: ids 0 and 1 must self-encode (distance 0 to their own
    // subvector); ids 2/3 pick the nearest codeword per subspace.
    val e = Seq(
      (0L, Seq(0.0, 0.0, 10.0, 10.0)),
      (1L, Seq(5.0, 5.0, 0.0, 0.0)),
      (2L, Seq(0.1, 0.1, 0.2, 0.1)),   // near cw0 in j0, near cw1 in j1
      (3L, Seq(4.0, 4.0, 9.0, 9.0)))   // near cw1 in j0, near cw0 in j1
      .toDF("vec_id", "v")
    val codes = Similarity.pqEncode(e, "vec_id", "v", m = 2, k = 2, subDim = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(codes((0L, 0)) == 0L && codes((0L, 1)) == 0L)
    assert(codes((1L, 0)) == 1L && codes((1L, 1)) == 1L)
    assert(codes((2L, 0)) == 0L && codes((2L, 1)) == 1L)
    assert(codes((3L, 0)) == 1L && codes((3L, 1)) == 0L)
  }

  test("pqAdcTopK: the query's own vector ranks first with ~zero distance") {
    val e = Seq(
      (0L, Seq(0.0, 0.0, 10.0, 10.0)),
      (1L, Seq(5.0, 5.0, 0.0, 0.0)),
      (2L, Seq(0.1, 0.1, 9.9, 9.9)),
      (3L, Seq(6.0, 6.0, 1.0, 1.0)))
      .toDF("vec_id", "v")
    val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
    val top = Similarity.pqAdcTopK(e, "vec_id", "v", q, "qv", topK = 4,
        m = 2, k = 2, subDim = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // id 0 is a codeword source: its ADC distance is exactly the
    // query-to-codeword distance = 0; id 2 shares its codes -> next
    assert(top.head._1 == 0L && top.head._2 == 0.0)
    assert(top.map(_._1).take(2).toSet == Set(0L, 2L))
    assert(top.map(_._2).sorted.toSeq == top.map(_._2).toSeq) // ascending
  }

  test("bm25: matches the hand-computed formula on a tiny corpus") {
    val docs = Seq(
      (1L, "spark joins data with data"), // dl 5; data tf 2
      (2L, "data"),                       // dl 1; data tf 1
      (3L, "no match here at all"))       // dl 5; no term
      .toDF("doc_id", "text")
    val got = TextStats.bm25(docs, "doc_id", "text",
        terms = Seq("data", "spark"), k1 = 1.2, b = 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val n = 3.0
    val avgdl = (5.0 + 1.0 + 5.0) / 3.0
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Double, df: Double, dl: Double) =
      idf(df) * tf * (1.2 + 1.0) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    // doc 1: data(tf 2, df 2) + spark(tf 1, df 1); doc 2: data only
    val d1 = term(2, 2, 5) + term(1, 1, 5)
    val d2 = term(1, 2, 1)
    assert(math.abs(got(1L) - d1) < 1e-12, s"${got(1L)} vs $d1")
    assert(math.abs(got(2L) - d2) < 1e-12, s"${got(2L)} vs $d2")
    assert(!got.contains(3L), "termless doc must be omitted")
    // shorter doc with the rarer... sanity: both scores positive
    assert(d1 > 0 && d2 > 0)
  }

  test("chunkDocuments: overlap, boundaries, short docs") {
    // chunk 4 / overlap 1 => stride 3
    val docs = Seq(
      (1L, "a b c d e f g h"), // 8 tok: ceil(7/3)=3 chunks at 0,3,6
      (2L, "x"),               // shorter than a chunk: exactly one chunk
      (3L, "p q r s"))         // == chunkTokens: exactly one chunk
      .toDF("doc_id", "text")
    val out = TextStats.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    assert(out((1L, 0L)) == ((0L, "a b c d", 4L)))
    assert(out((1L, 1L)) == ((3L, "d e f g", 4L))) // shares 'd'
    assert(out((1L, 2L)) == ((6L, "g h", 2L)))     // tail remainder
    assert(out((2L, 0L)) == ((0L, "x", 1L)))
    assert(out((3L, 0L)) == ((0L, "p q r s", 4L)))
    assert(out.size == 5, "no spurious chunks")
    // every token of doc 1 appears in some chunk (no coverage gap)
    val covered = out.collect { case ((1L, _), (_, t, _)) => t.split(" ") }
      .flatten.toSet
    assert(covered == Set("a", "b", "c", "d", "e", "f", "g", "h"))
    intercept[IllegalArgumentException] {
      TextStats.chunkDocuments(docs, "doc_id", "text", 4, 4) // overlap too big
    }
  }

  test("packSequences: per-shard concat-and-chunk offsets") {
    val docs = Seq(
      (0L, "a b c"),        // shard 0: 3 tokens, off 0, seq 0
      (1L, "d e"),          // shard 1: 2 tokens, off 0, seq 0
      (2L, "f g h i"),      // shard 0: off 3, crosses budget 4 -> seq 0
      (4L, "j k l m n"),    // shard 0: off 7, seq 1
      (3L, "o p q r s t"))  // shard 1: off 2, seq 0
      .toDF("doc_id", "text")
    val out = TextStats.packSequences(docs, "doc_id", "text",
        (col("doc_id") % 2).cast("long"), budget = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(0L) == (0L, 3L, 0L, 0L))
    assert(out(2L) == (0L, 4L, 3L, 0L)) // starts inside seq 0
    assert(out(4L) == (0L, 5L, 7L, 1L))
    assert(out(1L) == (1L, 2L, 0L, 0L))
    assert(out(3L) == (1L, 6L, 2L, 0L))
    // shards are independent: no cross-shard offset bleed
    assert(out(1L)._3 == 0L && out(3L)._3 == 2L)
  }
}
