package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Multimodal plumbing: typed schemas, executor-side batch shape, and
  * the deterministic stub decoder's contracts. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def files = Seq(
    Multimodal.MediaFile(1L, "s0", Array.fill[Byte](100)(7)),
    Multimodal.MediaFile(2L, "s1", Array.fill[Byte](3)(1)),
    Multimodal.MediaFile(3L, "s0", Array.emptyByteArray))
    .toDS()

  test("extractMeta: stub dimensions derive from payload length") {
    val m = Multimodal.extractMeta(files).collect().map(x => x.doc_id -> x).toMap
    assert(m(1L).n_bytes == 100 && m(1L).width == 164 && m(1L).n_frames == 1)
    assert(m(3L).n_bytes == 0 && m(3L).width == 64 && m(3L).n_frames == 1)
  }

  test("sampleFrames: every stride-th frame, 1-based, bytes from parent") {
    // doc 2: n=3 -> n_frames = 1 + 3%5 = 4 -> stride 2 -> frames 1, 3
    val f = Multimodal.sampleFrames(files, stride = 2).collect()
      .groupBy(_.doc_id).view.mapValues(_.map(_.frame_idx).sorted.toSeq).toMap
    assert(f(2L) == Seq(1L, 3L))
    assert(f(1L) == Seq(1L)) // n_frames = 1 + 100%5 = 1
    val frame = Multimodal.sampleFrames(files, stride = 1)
      .filter(_.doc_id == 1L).collect().head
    assert(frame.frame_bytes.length == 16 && frame.frame_bytes.forall(_ == 7))
    assert(frame.width == 164 && frame.height == 48 + 700 % 480)
  }

  test("resizeMeta: aspect-preserving clamp, never exceeds the box") {
    val r = Multimodal.resizeMeta(files, 320, 240).collect()
    r.foreach { x =>
      assert(x.out_width <= 320 && x.out_height <= 240)
      assert(x.out_width >= 1 && x.out_height >= 1)
      if (x.width <= 320 && x.height <= 240) {
        assert(x.out_width == x.width && x.out_height == x.height)
      } else {
        // aspect preserved within integer truncation: ow/oh ~ w/h
        val cross = math.abs(x.out_width * x.height - x.out_height * x.width)
        assert(cross <= math.max(x.width, x.height),
          s"aspect drift too large: $x")
      }
    }
  }

  test("extractFeatures: fixed dim, deterministic, values in [0,1]") {
    val a = Multimodal.extractFeatures(files, dim = 8).collect()
      .map { case (id, v) => id -> v.toSeq }.toMap
    val b = Multimodal.extractFeatures(files, dim = 8).collect()
      .map { case (id, v) => id -> v.toSeq }.toMap
    assert(a == b)
    assert(a.values.forall(v => v.length == 8 && v.forall(x => x >= 0f && x <= 1f)))
    assert(a(3L) == Seq.fill(8)(0f)) // empty payload -> zero vector
  }
}
