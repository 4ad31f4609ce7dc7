package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit checks for TextStats signals whose math is worth pinning with
  * hand-computed values (the oracle gate covers the full corpus paths).
  */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("lmScore: add-one unigram LM, hand-computed cross-entropy") {
    import spark.implicits._
    // corpus counts: a=3 b=2 c=1, N=6, V=3 -> p(a)=4/9 p(b)=1/3 p(c)=2/9
    val docs = Seq((1L, "a a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val got = TextStats.lmScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val ce1 = -(2 * math.log(4.0 / 9) + math.log(1.0 / 3)) / 3
    val ce2 = -(math.log(4.0 / 9) + math.log(1.0 / 3)) / 2
    val ce3 = -math.log(2.0 / 9)
    assert(got.map(_._2).toSeq == Seq(3L, 2L, 1L))
    Seq(ce1, ce2, ce3).zip(got).foreach { case (want, (_, _, ce, ppl)) =>
      assert(math.abs(ce - want) < 1e-12, s"ce $ce != $want")
      assert(math.abs(ppl - math.exp(want)) < 1e-9)
    }
    // the rare-word doc is the most surprising under the corpus LM
    assert(got(2)._4 > got(1)._4 && got(1)._4 > got(0)._4)
  }

  test("cdcChunks: chunks partition the window starts, spans cover the doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 60).map(i => s"w$i").mkString(" ")), // distinct tokens
      (2L, "a b"), // shorter than n=3: no windows, no chunks
      (3L, "")).toDF("doc_id", "text")
    val got = TextStats.cdcChunks(docs, "doc_id", "text", n = 3, divisor = 4)
      .orderBy("doc_id", "chunk_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(got.forall(_._1 == 1L), "short/empty docs yield no chunks")
    val c = got.filter(_._1 == 1L)
    // chunk indices consecutive from 0; window starts partition 1..58
    assert(c.map(_._2).toSeq == c.indices.map(_.toLong))
    assert(c.map(_._4).sum == 58L, "n_windows must partition the 58 starts")
    assert(c.head._3 == 1L, "first chunk starts at position 1")
    // consecutive chunks: next start = prev start + prev n_windows
    c.sliding(2).foreach {
      case Array(p, q) => assert(q._3 == p._3 + p._4, s"$p -> $q")
      case _ =>
    }
    // token span = windows + n - 1; last chunk reaches the doc end
    assert(c.forall(ch => ch._5 == ch._4 + 2))
    assert(c.last._3 + c.last._5 - 1 == 60L, "last chunk covers the tail")
    assert(c.map(_._6).distinct.length == c.length, "fps distinct here")
  }

  test("cdcChunks: boundaries resync after an edit (the CDC property)") {
    import spark.implicits._
    // distinct tokens: any shift changes EVERY fixed-stride chunk, so
    // the contrast assertion below has no accidental collisions
    val base = (1 to 80).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, base), (2L, "inserted " + base))
      .toDF("doc_id", "text")
    val fps = TextStats.cdcChunks(docs, "doc_id", "text", n = 3, divisor = 4)
      .select("doc_id", "chunk_fp").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val shared = fps(1L).intersect(fps(2L))
    // every chunk of the original except (at most) the first re-appears
    // byte-identical in the edited doc — content decides boundaries, so
    // one token prepended perturbs one chunk, not the whole stream.
    // Fixed-stride chunking (q127 shape) shares ZERO fingerprints here.
    assert(shared.size >= fps(1L).size - 1,
      s"resync failed: ${fps(1L).size} vs shared ${shared.size}")
    val fixed = TextStats.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 16, overlap = 0)
      .select(col("doc_id"), md5(col("chunk_text")).as("fp")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(fixed(1L).intersect(fixed(2L)).isEmpty,
      "fixed-stride chunks should all shift — the property CDC fixes")
  }
}
