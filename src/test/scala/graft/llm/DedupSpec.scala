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

  test("simhash: identical docs get identical fingerprints") {
    val sh = Dedup.shingles(docs, "doc_id", "text", n = 1)
    val fp = Dedup.simhash(sh, "doc_id", nBits = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(6L))
    assert(fp.values.forall(v => v >= 0 && v < (1 << 16)))
  }
}
