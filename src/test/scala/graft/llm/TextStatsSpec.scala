package graft.llm

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
}
