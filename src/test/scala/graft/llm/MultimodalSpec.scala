package graft.llm

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Multimodal: the real container-header decoder (PNG/APNG, JPEG, GIF),
  * cross-validated BOTH directions against the JDK's javax.imageio —
  * our decoder on ImageIO-encoded bytes, ImageIO on our encoder's bytes
  * — plus the typed executor-side operator plumbing. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Canonical checked-in tiny PNG: 1×1 red pixel (the classic 70-byte
    * fixture), base64 so it survives source control. */
  private val tinyPng: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8" +
      "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")

  test("decode parses the checked-in tiny PNG") {
    val m = Multimodal.decode(tinyPng)
    assert(m == Multimodal.MediaInfo("png", 1L, 1L, 1L))
  }

  test("encoder -> decoder round-trip for png/apng, jpeg, gif") {
    for ((w, h) <- Seq((1, 1), (16, 12), (79, 59), (300, 7))) {
      assert(Multimodal.decode(Multimodal.makePng(w, h, 1)) ==
        Multimodal.MediaInfo("png", w, h, 1))
      assert(Multimodal.decode(Multimodal.makePng(w, h, 4)) ==
        Multimodal.MediaInfo("png", w, h, 4))
      assert(Multimodal.decode(Multimodal.makeJpeg(w, h)) ==
        Multimodal.MediaInfo("jpeg", w, h, 1))
      assert(Multimodal.decode(Multimodal.makeGif(w, h, 3)) ==
        Multimodal.MediaInfo("gif", w, h, 3))
    }
  }

  test("our decoder agrees with ImageIO on ImageIO-encoded images") {
    val img = new java.awt.image.BufferedImage(
      23, 17, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (fmt <- Seq("png", "jpeg", "gif")) {
      val baos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, baos), s"ImageIO cannot write $fmt")
      val m = Multimodal.decode(baos.toByteArray)
      assert(m.format == fmt && m.width == 23 && m.height == 17,
        s"$fmt: got $m")
    }
  }

  test("ImageIO agrees with our encoders (files are really valid)") {
    for ((bytes, fmt) <- Seq(
        (Multimodal.makePng(23, 17, 1), "png"),
        (Multimodal.makeJpeg(23, 17), "JPEG"),
        (Multimodal.makeGif(23, 17, 3), "gif"))) {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      val readers = ImageIO.getImageReaders(iis)
      assert(readers.hasNext, s"no ImageIO reader claims our $fmt bytes")
      val r = readers.next()
      r.setInput(iis)
      assert(r.getWidth(0) == 23 && r.getHeight(0) == 17, fmt)
      if (fmt == "gif") assert(r.getNumImages(true) == 3)
      // and the pixel data itself decodes (not just the header)
      assert(r.read(0).getWidth == 23, s"$fmt pixel decode failed")
      r.dispose(); iis.close()
    }
  }

  test("decode throws loudly on unknown payloads") {
    assertThrows[IllegalArgumentException] {
      Multimodal.decode("definitely not an image".getBytes)
    }
    assertThrows[IllegalArgumentException] {
      Multimodal.decode(Array.emptyByteArray)
    }
  }

  test("decode throws IllegalArgumentException (not AIOOBE) on truncation") {
    // every prefix of every valid file must fail LOUDLY with the
    // documented exception — never ArrayIndexOutOfBoundsException
    val wholes = Seq(Multimodal.makePng(16, 8, 3), Multimodal.makeJpeg(24, 12),
      Multimodal.makeGif(10, 6, 2))
    for (whole <- wholes; cut <- 0 until whole.length) {
      val sliced = whole.take(cut)
      try { Multimodal.decode(sliced); () }
      catch {
        case _: IllegalArgumentException => () // the documented failure
        case e: Throwable =>
          fail(s"truncated at $cut/${whole.length}: got ${e.getClass.getName}")
      }
    }
    // a JPEG whose stream hits EOI before any SOF: loud, specific
    val eoiFirst = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte,
      0xff.toByte, 0xd9.toByte)
    val e = intercept[IllegalArgumentException](Multimodal.decode(eoiFirst))
    assert(e.getMessage.contains("no SOF"))
  }

  private def files = Seq(
    Multimodal.MediaFile(1L, "s0", Multimodal.makePng(64, 48, 1)),
    Multimodal.MediaFile(2L, "s1", Multimodal.makeGif(20, 10, 4)),
    Multimodal.MediaFile(3L, "s0", Multimodal.makeJpeg(100, 80)))
    .toDS()

  test("extractMeta: header-parsed metadata, executor-side") {
    val m = Multimodal.extractMeta(files).collect().map(x => x.doc_id -> x).toMap
    assert(m(1L).format == "png" && m(1L).width == 64 && m(1L).height == 48 &&
      m(1L).n_frames == 1)
    assert(m(2L).format == "gif" && m(2L).width == 20 && m(2L).n_frames == 4)
    assert(m(3L).format == "jpeg" && m(3L).width == 100 && m(3L).height == 80 &&
      m(3L).n_frames == 1)
    assert(m(1L).n_bytes == Multimodal.makePng(64, 48, 1).length)
  }

  test("sampleFrames: every stride-th frame of the parsed frame count") {
    val f = Multimodal.sampleFrames(files, stride = 2).collect()
      .groupBy(_.doc_id).view.mapValues(_.map(_.frame_idx).sorted.toSeq).toMap
    assert(f(2L) == Seq(1L, 3L)) // gif with 4 frames
    assert(f(1L) == Seq(1L) && f(3L) == Seq(1L))
    val frame = Multimodal.sampleFrames(files, stride = 1)
      .filter(_.doc_id == 2L).collect().head
    assert(frame.width == 20 && frame.height == 10)
    assert(frame.frame_bytes.length == 16) // payload slice stub
  }

  test("resizeMeta: aspect-preserving clamp, never exceeds the box") {
    val r = Multimodal.resizeMeta(files, 40, 30).collect()
    assert(r.length == 3)
    r.foreach { x =>
      assert(x.out_width <= 40 && x.out_height <= 30)
      assert(x.out_width >= 1 && x.out_height >= 1)
      if (x.width <= 40 && x.height <= 30) {
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
    val withEmpty = files.union(Seq(
      Multimodal.MediaFile(9L, "s9", Array.emptyByteArray)).toDS())
    val a = Multimodal.extractFeatures(withEmpty, dim = 8).collect()
      .map { case (id, v) => id -> v.toSeq }.toMap
    val b = Multimodal.extractFeatures(withEmpty, dim = 8).collect()
      .map { case (id, v) => id -> v.toSeq }.toMap
    assert(a == b)
    assert(a.values.forall(v => v.length == 8 && v.forall(x => x >= 0f && x <= 1f)))
    assert(a(9L) == Seq.fill(8)(0f)) // empty payload -> zero vector
  }
}
