package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Dedup building blocks on tiny corpora, including the short-document
  * edge cases that crashed the original sequence-based shingles. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "the quick brown fox leaps"),
    (3L, "completely different words here"),
    (4L, "single"),          // shorter than n=2: no shingles
    (5L, ""),                // empty text
    (6L, "the quick brown fox jumps")) // exact dup of 1
    .toDF("doc_id", "text")

  test("shingles: bigrams, with short/empty docs yielding none") {
    val sh = Dedup.shingles(docs, "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(!sh.exists(s => s._1 == 4L || s._1 == 5L))
    val d1 = sh.filter(_._1 == 1L).map(_._2).toSet
    assert(d1 == Set("the quick", "quick brown", "brown fox", "fox jumps"))
    assert(sh.forall(_._2 != null))
  }

  test("trigram shingles") {
    val sh = Dedup.shingles(docs.filter($"doc_id" === 1), "doc_id", "text", n = 3)
      .collect().map(_.getString(1)).toSet
    assert(sh == Set("the quick brown", "quick brown fox", "brown fox jumps"))
  }

  test("jaccard on candidates: exact dup = 1.0, near dup = 3/5, no self-pairs") {
    val sh = Dedup.shingles(docs, "doc_id", "text", n = 2)
    val base = Dedup.hashedShingles(sh, "doc_id")
    val cand = Seq((1L, 2L), (1L, 6L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.jaccardOnCandidates(base, "doc_id", cand)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 6L)) == 1.0)
    assert(math.abs(got((1L, 2L)) - 3.0 / 5.0) < 1e-9)
    assert(got((1L, 3L)) == 0.0)
  }

  test("minhash LSH finds the exact and near duplicates, not the unrelated doc") {
    val sh = Dedup.shingles(docs, "doc_id", "text", n = 2)
    val base = Dedup.hashedShingles(sh, "doc_id")
    val sig = Dedup.minhashSignature(base, "doc_id", k = 16)
    val cand = Dedup.minhashCandidates(sig, "doc_id", k = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 6L)), "exact duplicate must always collide")
    assert(!cand.contains((1L, 3L)) && !cand.contains((2L, 3L)),
      "unrelated doc should not be a candidate")
  }

  test("rareShingles prunes shingles above the df fraction") {
    // 'the quick' appears in docs 1,2,6 = 3 of 5 docs with shingles
    val sh = Dedup.shingles(docs, "doc_id", "text", n = 2)
    val base = Dedup.hashedShingles(sh, "doc_id")
    val total = base.count()
    val pruned = Dedup.rareShingles(base, "doc_id", maxFrac = 0.5).count()
    assert(pruned < total)
    val keptAll = Dedup.rareShingles(base, "doc_id", maxFrac = 1.0).count()
    assert(keptAll == total)
  }

  test("rarestPrefix emits at most k keys per doc") {
    val sh = Dedup.shingles(docs, "doc_id", "text", n = 2)
    val base = Dedup.hashedShingles(sh, "doc_id")
    val perDoc = Dedup.rarestPrefix(base, "doc_id", k = 2)
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(perDoc.forall(_ <= 2))
  }

  test("connectedComponents: chain merges transitively, islands stay apart") {
    // chain 1-2-3 (via 2) plus island {10, 11}
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: ONE probe action per propagation round") {
    // path 0-1-2-3 (diameter 3) converges in exactly 4 rounds: labels
    // reach (3,2,1) changes, then (2,1), then (1), then the all-quiet
    // confirm round. Checkpoint + convergence count fuse into one
    // action per round — 4 total, deterministically.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val before = org.apache.spark.sql.graftbridge.RddBridge.probeActions.get
    val comp = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probes = org.apache.spark.sql.graftbridge.RddBridge.probeActions.get - before
    assert(comp == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
    assert(probes == 4L, s"expected 4 probe actions (1/round), got $probes")
  }

  test("simhash: identical docs get identical fingerprints") {
    val sh = Dedup.shingles(docs, "doc_id", "text", n = 1)
    val fp = Dedup.simhash(sh, "doc_id", nBits = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(6L))
    assert(fp.values.forall(v => v >= 0 && v < (1 << 16)))
  }

  // --- banded-LSH recall at PRODUCTION parameters -------------------------
  //
  // The catalog's q41 keeps k=16/b=8 so the DuckDB oracle can replay all k
  // signature columns; production corpora should run k=128/b=32 (r=4 rows
  // per band: P[candidate] = 1-(1-j^4)^32, i.e. ≥0.87 at j=0.5, ≥0.99 at
  // j≥0.6). This seeded-corpus property test PROVES that recall curve on
  // exact ground truth — and that a mis-banded config (few wide bands)
  // collapses, so a bad parameter change cannot slip through quietly.

  /** Seeded synthetic shingle-set corpus: `nPairs` (A,B) pairs built to a
    * target Jaccard in [0.6, 0.9] (exact value computed from the sets) +
    * `nNoise` unrelated docs with disjoint sets. Ids: pair docs (i, i+1)
    * for even i < 2*nPairs; noise ids from 1000. */
  private def syntheticCorpus(nPairs: Int, nNoise: Int, setSize: Int)
  : (org.apache.spark.sql.DataFrame, Map[(Long, Long), Double]) = {
    val rnd = new scala.util.Random(42)
    var wordId = 0
    def freshWords(n: Int): Seq[String] =
      (0 until n).map { _ => wordId += 1; s"w$wordId" }
    val rows = Seq.newBuilder[(Long, String)]
    val truth = Map.newBuilder[(Long, Long), Double]
    (0 until nPairs).foreach { p =>
      val a = freshWords(setSize)
      val targetJ = 0.6 + 0.1 * (p % 4) // 0.6 / 0.7 / 0.8 / 0.9
      val m = math.round(2 * setSize * targetJ / (1 + targetJ)).toInt
      val b = rnd.shuffle(a).take(m) ++ freshWords(setSize - m)
      val (idA, idB) = (2L * p, 2L * p + 1)
      rows ++= a.map((idA, _)); rows ++= b.map((idB, _))
      val inter = a.toSet.intersect(b.toSet).size.toDouble
      truth += (idA, idB) -> inter / (a.toSet ++ b.toSet).size
    }
    (1000 until 1000 + nNoise).foreach { i =>
      rows ++= freshWords(setSize).map((i.toLong, _))
    }
    (rows.result().toDF("doc_id", "shingle"), truth.result())
  }

  private def candidatePairs(corpus: org.apache.spark.sql.DataFrame,
                             k: Int, bands: Int): Set[(Long, Long)] = {
    val base = Dedup.hashedShingles(corpus, "doc_id").localCheckpoint()
    val sig = Dedup.minhashSignature(base, "doc_id", k = k)
    Dedup.minhashCandidates(sig, "doc_id", k = k, bands = bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash recall at k=128/b=32: >=95% of true j>=0.6 pairs are candidates") {
    val (corpus, truth) = syntheticCorpus(nPairs = 50, nNoise = 100, setSize = 60)
    assert(truth.values.forall(_ >= 0.55), "corpus construction drifted")
    val cands = candidatePairs(corpus, k = 128, bands = 32)
    val recall = truth.keys.count(cands.contains).toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall at k=128/b=32 " +
      s"(missed: ${truth.keys.filterNot(cands.contains).toSeq.sorted})")
  }

  test("minhash precision guard: unrelated (j~0) docs almost never collide") {
    val (corpus, truth) = syntheticCorpus(nPairs = 50, nNoise = 100, setSize = 60)
    val cands = candidatePairs(corpus, k = 128, bands = 32)
    val falseCands = cands.filterNot(truth.contains)
    // disjoint sets collide on a band only by 4-hash accident
    assert(falseCands.size <= 5, s"${falseCands.size} false candidates: $falseCands")
  }

  test("mis-banded config (k=128, 4 wide bands) collapses recall — test has teeth") {
    val (corpus, truth) = syntheticCorpus(nPairs = 50, nNoise = 0, setSize = 60)
    val cands = candidatePairs(corpus, k = 128, bands = 4)
    // r=32 rows/band: P[candidate] = 1-(1-j^32)^4 ~ 0.13 even at j=0.9
    val recall = truth.keys.count(cands.contains).toDouble / truth.size
    assert(recall < 0.5, s"wide-band recall unexpectedly high: $recall")
  }

  // ---- exact substring dedup (duplicateSpans / scrubDuplicateSpans) ----

  /** Brute-force reference: mark every k-window start whose gram occurs
    * >= 2 times corpus-wide, chain starts with gap <= k into islands,
    * report (id, span_start, span_len, n_windows). */
  private def oracleSpans(docs: Seq[(Long, String)],
                          k: Int): Set[(Long, Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, t) =>
      val w = t.split(" ", -1)
      (0 to w.length - k).map(i => (id, i + 1, w.slice(i, i + k).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).map { case (g, occ) => (g, occ.size) }
    val marked = grams.filter(g => counts(g._3) >= 2)
      .groupBy(_._1).map { case (id, occ) => (id, occ.map(_._2).sorted) }
    marked.toSeq.flatMap { case (id, ps) =>
      val islands = ps.foldLeft(List.empty[List[Int]]) { (acc, p) =>
        acc match {
          case (h @ (last :: _)) :: t if p - last <= k => (p :: h) :: t
          case _ => List(p) :: acc
        }
      }
      islands.map { isl =>
        val s = isl.min; val e = isl.max + k - 1
        (id, s.toLong, (e - s + 1).toLong, isl.size.toLong)
      }
    }.toSet
  }

  private def spansOf(df: org.apache.spark.sql.DataFrame, k: Int) =
    Dedup.duplicateSpans(df, "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  test("duplicateSpans: cross-doc shared run merges overlapping windows") {
    val d = Seq(
      (1L, "x1 x2 common one two three four x3"),
      (2L, "y1 common one two three four y2 y3 y4"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    // k=3: shared 5-token run "common one two three four" → starts chain
    val got = spansOf(d, 3)
    assert(got == Set((1L, 3L, 5L, 3L), (2L, 2L, 5L, 3L)), got)
    assert(got == oracleSpans(
      Seq((1L, "x1 x2 common one two three four x3"),
        (2L, "y1 common one two three four y2 y3 y4"),
        (3L, "z1 z2 z3 z4 z5 z6 z7 z8")), 3))
  }

  test("duplicateSpans: within-doc repetition counts as duplication") {
    val d = Seq((1L, "a b c pad1 pad2 pad3 pad4 a b c")).toDF("doc_id", "text")
    // "a b c" occurs twice IN THE SAME doc: starts 1 and 8, gap 7 > k=3
    // → two separate spans
    val got = spansOf(d, 3)
    assert(got == Set((1L, 1L, 3L, 1L), (1L, 8L, 3L, 1L)), got)
  }

  test("duplicateSpans: starts with gap <= k merge (contiguous coverage)") {
    // doc 1 repeats "a b c" at starts 1 and 4 (gap 3 = k): coverage
    // [1,3] ∪ [4,6] is contiguous → ONE span of 6; doc 2 supplies the
    // second occurrence so the gram is corpus-duplicated
    val d = Seq(
      (1L, "a b c a b c tail1 tail2"),
      (2L, "pre a b c post1 post2 post3")).toDF("doc_id", "text")
    val got = spansOf(d, 3)
    // duplicated starts are 1 and 4 ("a b c"; the straddling grams
    // "b c a"/"c a b" are unique) — gap 3 = k chains them into ONE span
    assert(got.contains((1L, 1L, 6L, 2L)), got)
    assert(got == oracleSpans(Seq(
      (1L, "a b c a b c tail1 tail2"),
      (2L, "pre a b c post1 post2 post3")), 3), got)
  }

  test("duplicateSpans: docs shorter than k and empty docs yield nothing") {
    val d = Seq((1L, "a b"), (2L, ""), (3L, "a b"))
      .toDF("doc_id", "text")
    assert(spansOf(d, 3).isEmpty)
  }

  test("duplicateSpans: seeded random corpus matches brute-force oracle") {
    val rng = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val corpus = (1L to 40L).map(id =>
      (id, Seq.fill(6 + rng.nextInt(15))(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")))
    for (k <- Seq(2, 3, 4)) {
      val got = spansOf(corpus.toDF("doc_id", "text"), k)
      assert(got == oracleSpans(corpus, k), s"k=$k")
    }
  }

  test("duplicateSpans plan: no cartesian, gram frequency partial-aggs") {
    val d = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val p = Dedup.duplicateSpans(d, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial count"), p)
  }

  test("scrubDuplicateSpans: removes spans, keeps clean docs byte-identical") {
    val d = Seq(
      (1L, "x1 x2 common one two three four x3"),
      (2L, "y1 common one two three four y2 y3 y4"),
      (3L, "z1  z2 z3"), // double space survives verbatim (no spans)
      (4L, "")).toDF("doc_id", "text")
    val got = Dedup.scrubDuplicateSpans(d, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toMap2
    assert(got(1L) == ("x1 x2 x3", 5L), got)
    assert(got(2L) == ("y1 y2 y3 y4", 5L), got)
    assert(got(3L) == ("z1  z2 z3", 0L), got)
    assert(got(4L) == ("", 0L), got)
  }

  test("scrubDuplicateSpans: fully-duplicated doc comes back empty") {
    val d = Seq(
      (1L, "a b c"),
      (2L, "a b c")).toDF("doc_id", "text")
    val got = Dedup.scrubDuplicateSpans(d, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toMap2
    assert(got(1L) == ("", 3L) && got(2L) == ("", 3L), got)
  }

  implicit private class RowsToMap(
      rows: Array[(Long, String, Long)]) {
    def toMap2: Map[Long, (String, Long)] =
      rows.map { case (id, t, n) => (id, (t, n)) }.toMap
  }
}
