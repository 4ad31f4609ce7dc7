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

  test("wav: encoder -> decoder round-trip, exact layout back") {
    val a = Multimodal.decodeWav(Multimodal.makeWav(16000, 2, 16, 1234))
    assert(a == Multimodal.AudioInfo("wav", 16000, 2, 16, 1234,
      1234L * 1000 / 16000))
    // mono 8-bit as well — frame size 1 byte
    val m = Multimodal.decodeWav(Multimodal.makeWav(8000, 1, 8, 800))
    assert(m.nSamples == 800 && m.durationMs == 100)
  }

  test("wav: javax.sound agrees with our encoder AND our decoder") {
    val bytes = Multimodal.makeWav(22050, 2, 16, 2000)
    val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new ByteArrayInputStream(bytes))
    assert(fmt.getFormat.getSampleRate == 22050f)
    assert(fmt.getFormat.getChannels == 2)
    assert(fmt.getFormat.getSampleSizeInBits == 16)
    assert(fmt.getFrameLength == 2000)
    val ours = Multimodal.decodeWav(bytes)
    assert(ours.sampleRate == 22050 && ours.channels == 2 &&
      ours.nSamples == 2000)
  }

  test("wav: chunk walk skips unknown + odd-length chunks (word alignment)") {
    // splice a 3-byte junk chunk (odd: consumes 4 with its pad byte)
    // between WAVE and fmt — decoder must skip it and still land
    val whole = Multimodal.makeWav(12000, 1, 16, 600)
    val out = new java.io.ByteArrayOutputStream()
    out.write(whole, 0, 12)
    out.write("junk".getBytes("US-ASCII")); out.write(Array[Byte](3, 0, 0, 0))
    out.write(Array[Byte](1, 2, 3, 0)) // payload + pad
    out.write(whole, 12, whole.length - 12)
    val spliced = out.toByteArray
    // RIFF size field is now stale, which the walker never trusts anyway
    val a = Multimodal.decodeWav(spliced)
    assert(a.sampleRate == 12000 && a.nSamples == 600)
  }

  test("wav/mp4: loud IllegalArgumentException on every truncation point") {
    def loud(name: String, f: Array[Byte] => Any, whole: Array[Byte]): Unit =
      for (cut <- 0 until whole.length) {
        try { f(whole.take(cut)); () }
        catch {
          case _: IllegalArgumentException => () // the documented failure
          case e: Throwable => fail(
            s"$name truncated at $cut/${whole.length}: got ${e.getClass.getName}")
        }
      }
    loud("wav", Multimodal.decodeWav, Multimodal.makeWav(8000, 1, 16, 100))
    loud("mp4", Multimodal.decodeMp4, Multimodal.makeMp4(600, 4500, 2))
  }

  test("mp4: encoder -> decoder round-trip; v1 mvhd; mdat never needed") {
    val v = Multimodal.decodeMp4(Multimodal.makeMp4(600, 4500, 3))
    assert(v == Multimodal.VideoInfo("mp4", 600, 4500, 4500L * 1000 / 600, 3))
    // hand-build an mvhd VERSION 1 (64-bit duration) moov: the decoder
    // must read the wide fields — our encoder only emits v0
    val v0 = Multimodal.makeMp4(1000, 7, 1)
    // v0 mvhd starts after ftyp(20) + moov header(8); grow it 12 bytes
    // (creation/modification/duration widen 4→8)
    val out = new java.io.ByteArrayOutputStream()
    def w32(x: Long): Unit =
      (3 to 0 by -1).foreach(i => out.write(((x >> (8 * i)) & 0xff).toInt))
    out.write(v0, 0, 20) // ftyp unchanged
    val moovSize = (8 + 120 + 100).toLong // header + mvhd v1 + trak
    w32(moovSize); out.write("moov".getBytes("US-ASCII"))
    w32(120); out.write("mvhd".getBytes("US-ASCII"))
    out.write(Array[Byte](1, 0, 0, 0)) // version 1
    w32(0); w32(0); w32(0); w32(0) // creation, modification (64-bit each)
    w32(90000) // timescale
    w32(1); w32(0x2A05F200L) // duration = 2^32 + 0x2A05F200 (> 32 bits)
    w32(0x00010000L); w32(0x01000000L); w32(0); w32(0)
    Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L).foreach(w32)
    (0 until 6).foreach(_ => w32(0))
    w32(2)
    out.write(v0, v0.length - 100, 100) // the one trak box, unchanged
    val wide = Multimodal.decodeMp4(out.toByteArray)
    val dur = (1L << 32) | 0x2A05F200L
    assert(wide.timescale == 90000 && wide.duration == dur &&
      wide.durationMs == dur * 1000 / 90000 && wide.nTracks == 1)
  }

  test("extractAudioMeta / extractVideoMeta: executor-side passes") {
    val wavs = Seq(
      Multimodal.MediaFile(1L, "s0", Multimodal.makeWav(8000, 1, 16, 400)),
      Multimodal.MediaFile(2L, "s1", Multimodal.makeWav(16000, 2, 16, 800)))
      .toDS()
    val am = Multimodal.extractAudioMeta(wavs).collect()
      .map(x => x.doc_id -> x).toMap
    assert(am(1L).sample_rate == 8000 && am(1L).duration_ms == 50)
    assert(am(2L).channels == 2 && am(2L).n_samples == 800)
    val mp4s = Seq(
      Multimodal.MediaFile(1L, "s0", Multimodal.makeMp4(600, 3000, 1)),
      Multimodal.MediaFile(2L, "s1", Multimodal.makeMp4(600, 4501, 2))).toDS()
    val vm = Multimodal.extractVideoMeta(mp4s).collect()
      .map(x => x.doc_id -> x).toMap
    assert(vm(1L).duration_ms == 5000 && vm(1L).n_tracks == 1)
    assert(vm(2L).duration_ms == 4501L * 1000 / 600 && vm(2L).n_tracks == 2)
  }
}
