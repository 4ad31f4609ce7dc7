package graft.llm

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import org.apache.spark.sql.Dataset

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata extraction.
  *
  * [[decode]] is a REAL container-header parser — PNG (incl. APNG frame
  * count via acTL), JPEG (SOF scan), GIF (logical screen + image-
  * descriptor walk) — pure JVM, no codec deps, allocation-free over the
  * input bytes. That is exactly the 100 TB shape for metadata
  * extraction: peek the header, never decompress pixel data, never pull
  * payloads to the driver. Full pixel decode (which WOULD need codecs)
  * remains out of scope; the one remaining stub is the per-frame
  * payload in [[sampleFrames]] (see its doc).
  *
  * The matching [[makePng]]/[[makeJpeg]]/[[makeGif]] encoders emit
  * minimal spec-valid files (real chunk CRCs, real deflate, real LZW,
  * real Huffman entropy) so fixtures are honest format bytes;
  * MultimodalSpec cross-checks both directions against `javax.imageio`.
  */
object Multimodal {

  /** A media row: opaque bytes + routing metadata. */
  final case class MediaFile(doc_id: Long, source: String, content: Array[Byte])

  /** Parsed container metadata. */
  final case class MediaInfo(format: String, width: Long, height: Long,
                             nFrames: Long)

  /** Typed metadata produced by the decoder. */
  final case class MediaMeta(doc_id: Long, source: String, format: String,
                             n_bytes: Long, width: Long, height: Long,
                             n_frames: Long)

  // ---------------------------------------------------------------- decode

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 24 && PngSig.indices.forall(i => b(i) == PngSig(i))
  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
  private def isGif(b: Array[Byte]): Boolean =
    b.length > 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Parse a media payload's container header. Throws on formats the
    * engine does not know — loud, like the arrow source. */
  def decode(bytes: Array[Byte]): MediaInfo =
    if (isPng(bytes)) decodePng(bytes)
    else if (isJpeg(bytes)) decodeJpeg(bytes)
    else if (isGif(bytes)) decodeGif(bytes)
    else throw new IllegalArgumentException(
      s"unsupported media payload (${bytes.length} bytes; " +
        "known containers: png, jpeg, gif)")

  /** PNG: IHDR is mandatorily the first chunk (w/h big-endian); frame
    * count is the APNG acTL chunk's num_frames if present before IDAT,
    * else 1. */
  private def decodePng(b: Array[Byte]): MediaInfo = {
    require(b.length >= 33 && new String(b, 12, 4, "US-ASCII") == "IHDR",
      "png: missing IHDR")
    val w = be32(b, 16)
    val h = be32(b, 20)
    var frames = 1L
    var pos = 8
    var done = false
    while (!done && pos + 12 <= b.length) {
      val len = be32(b, pos).toInt
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      if (typ == "acTL" && len >= 8) { frames = be32(b, pos + 8); done = true }
      else if (typ == "IDAT" || typ == "IEND") done = true
      pos += 12 + len
    }
    MediaInfo("png", w, h, frames)
  }

  /** JPEG: walk marker segments to the first SOFn (C0–CF minus C4 DHT,
    * C8 JPG, CC DAC); height/width are big-endian at +5/+7. */
  private def decodeJpeg(b: Array[Byte]): MediaInfo = {
    var pos = 2
    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff)
        throw new IllegalArgumentException("jpeg: marker desync")
      var m = b(pos + 1) & 0xff
      while (m == 0xff && pos + 2 < b.length) { pos += 1; m = b(pos + 1) & 0xff }
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        if (pos + 9 > b.length)
          throw new IllegalArgumentException("jpeg: truncated SOF segment")
        return MediaInfo("jpeg", be16(b, pos + 7).toLong, be16(b, pos + 5).toLong, 1L)
      } else if (m == 0xd8 || m == 0xd9 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        pos += 2 // standalone markers (incl. EOI) carry no length
      } else {
        pos += 2 + be16(b, pos + 2)
      }
    }
    throw new IllegalArgumentException("jpeg: no SOF marker before EOF")
  }

  /** GIF: logical-screen w/h little-endian at 6/8; frames = number of
    * image-descriptor blocks, found by walking the block structure
    * (extensions + data sub-blocks) WITHOUT LZW decode. */
  private def decodeGif(b: Array[Byte]): MediaInfo = {
    val w = le16(b, 6).toLong
    val h = le16(b, 8).toLong
    var pos = 13
    if ((b(10) & 0x80) != 0) pos += 3 * (1 << ((b(10) & 0x07) + 1)) // global color table
    var frames = 0L
    // every byte read is bounds-checked: a truncated payload fails with
    // the documented loud IllegalArgumentException, never an
    // ArrayIndexOutOfBoundsException from an unbounded index
    def u8(p: Int): Int = {
      if (p >= b.length)
        throw new IllegalArgumentException("gif: truncated stream")
      b(p) & 0xff
    }
    def skipSubBlocks(): Unit = {
      var sz = u8(pos)
      while (sz != 0) { pos += 1 + sz; sz = u8(pos) }
      pos += 1 // block terminator
    }
    var done = false
    while (!done && pos < b.length) {
      u8(pos) match {
        case 0x2c => // image descriptor
          frames += 1
          val packed = u8(pos + 9)
          pos += 10
          if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 0x07) + 1))
          pos += 1 // LZW min code size
          skipSubBlocks()
        case 0x21 => // extension: introducer + label, then sub-blocks
          pos += 2
          skipSubBlocks()
        case 0x3b => done = true // trailer
        case other =>
          throw new IllegalArgumentException(f"gif: unexpected block 0x$other%02x")
      }
    }
    MediaInfo("gif", w, h, frames)
  }

  // -------------------------------------------------------------- encoders

  private def crcChunk(out: ByteArrayOutputStream, typ: String,
                       data: Array[Byte]): Unit = {
    def w32(v: Long): Unit = {
      out.write((v >>> 24).toInt); out.write((v >>> 16).toInt & 0xff)
      out.write((v >>> 8).toInt & 0xff); out.write(v.toInt & 0xff)
    }
    w32(data.length.toLong)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    w32(crc.getValue)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](64 + raw.length / 2)
    val out = new ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def beBytes(vs: (Long, Int)*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    vs.foreach { case (v, n) =>
      (n - 1 to 0 by -1).foreach(i => out.write((v >>> (8 * i)).toInt & 0xff))
    }
    out.toByteArray
  }

  /** Minimal valid (A)PNG: grayscale-8, all-zero scanlines, real CRCs
    * and deflate; frames>1 emits the APNG acTL/fcTL/fdAT chunk dance. */
  def makePng(w: Int, h: Int, frames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && frames >= 1)
    val out = new ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    crcChunk(out, "IHDR", beBytes((w.toLong, 4), (h.toLong, 4),
      (8L, 1), (0L, 1), (0L, 1), (0L, 1), (0L, 1)))
    val pixels = deflate(new Array[Byte](h * (w + 1))) // filter byte + row
    def fcTL(seq: Long) = beBytes((seq, 4), (w.toLong, 4), (h.toLong, 4),
      (0L, 4), (0L, 4), (1L, 2), (10L, 2), (0L, 1), (0L, 1))
    if (frames > 1) {
      crcChunk(out, "acTL", beBytes((frames.toLong, 4), (0L, 4)))
      crcChunk(out, "fcTL", fcTL(0L))
    }
    crcChunk(out, "IDAT", pixels)
    var seq = 1L
    (2 to frames).foreach { _ =>
      crcChunk(out, "fcTL", fcTL(seq)); seq += 1
      crcChunk(out, "fdAT", beBytes((seq, 4)) ++ pixels); seq += 1
    }
    crcChunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  /** Minimal valid JPEG: single grayscale component, one-code Huffman
    * tables (symbol 0 → bit '0'), every MCU = DC-diff 0 + EOB = 2 zero
    * bits — a real decoder yields a mid-gray w×h image. */
  def makeJpeg(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val out = new ByteArrayOutputStream()
    def seg(marker: Int, data: Array[Byte]): Unit = {
      out.write(0xff); out.write(marker)
      out.write((data.length + 2) >>> 8); out.write((data.length + 2) & 0xff)
      out.write(data, 0, data.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xe0, "JFIF".getBytes("US-ASCII") ++
      beBytes((0L, 1), (1L, 1), (1L, 1), (0L, 1), (1L, 2), (1L, 2), (0L, 1), (0L, 1)))
    seg(0xdb, beBytes((0L, 1)) ++ Array.fill[Byte](64)(16)) // DQT, table 0
    seg(0xc0, beBytes((8L, 1), (h.toLong, 2), (w.toLong, 2), (1L, 1),
      (1L, 1), (0x11L, 1), (0L, 1))) // SOF0: 1 component
    def dht(clsId: Long) = // counts: one 1-bit code; symbols: {0}
      beBytes((clsId, 1)) ++ beBytes((1L, 1)) ++ new Array[Byte](15) ++ beBytes((0L, 1))
    seg(0xc4, dht(0x00L)) // DC table 0
    seg(0xc4, dht(0x10L)) // AC table 0
    seg(0xda, beBytes((1L, 1), (1L, 1), (0x00L, 1), (0L, 1), (63L, 1), (0L, 1)))
    val mcus = ((w + 7) / 8) * ((h + 7) / 8)
    out.write(new Array[Byte]((2 * mcus + 7) / 8), 0, (2 * mcus + 7) / 8)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Minimal valid GIF89a: 4-entry color table, every frame all-index-0
    * via fixed-width LZW (a clear code before each pixel keeps the code
    * width at 3 bits — no dictionary growth, trivially valid). */
  def makeGif(w: Int, h: Int, frames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && frames >= 1)
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    def le(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    le(w); le(h)
    out.write(0x91) // GCT present, 2-bit color resolution, GCT size 4
    out.write(0); out.write(0)
    out.write(Array[Byte](0, 0, 0, 85, 85, 85, -86, -86, -86, -1, -1, -1), 0, 12)
    // pixel data: min code size 2 ⇒ clear=4, eoi=5, 3-bit codes
    val bits = new java.util.BitSet()
    var nb = 0
    def code(c: Int): Unit = { (0 until 3).foreach { i =>
      if (((c >>> i) & 1) == 1) bits.set(nb + i) }; nb += 3 }
    (0 until w * h).foreach { _ => code(4); code(0) }
    code(5)
    val lzw = java.util.Arrays.copyOf(bits.toByteArray, (nb + 7) / 8)
    (1 to frames).foreach { _ =>
      out.write(0x2c); le(0); le(0); le(w); le(h); out.write(0) // descriptor
      out.write(2) // LZW min code size
      lzw.grouped(255).foreach { blk =>
        out.write(blk.length); out.write(blk, 0, blk.length)
      }
      out.write(0) // block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------- operators

  /** Executor-side metadata extraction; mapPartitions so a heavier
    * decoder could amortize per-partition setup (codec contexts, native
    * buffers). The header parse itself never decompresses pixel data. */
  def extractMeta(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map { f =>
      val m = decode(f.content)
      MediaMeta(f.doc_id, f.source, m.format, f.content.length.toLong,
        m.width, m.height, m.nFrames)
    })
  }

  /** One sampled video frame: parent id, 1-based frame index, frame
    * payload, and the decoded-at dimensions. */
  final case class Frame(doc_id: Long, frame_idx: Long, width: Long,
                         height: Long, frame_bytes: Array[Byte])

  /** Frame sampling: each media row explodes into every `stride`-th
    * frame (1-based: 1, 1+stride, …). The frame COUNT and dimensions are
    * real (parsed from the container header); the frame PAYLOAD is a
    * deterministic byte slice — a stub standing in for per-frame pixel
    * demux, which needs a codec this container doesn't ship. flatMap
    * keeps it one executor-side pass — rows-out ∝ frames, no driver
    * loop. */
  def sampleFrames(files: Dataset[MediaFile], stride: Int): Dataset[Frame] = {
    require(stride >= 1, "stride must be >= 1")
    import files.sparkSession.implicits._
    files.flatMap { f =>
      val m = decode(f.content)
      (1L to m.nFrames by stride.toLong).map { i =>
        val start = ((i - 1) * 16 % math.max(1, f.content.length)).toInt
        val bytes = f.content.slice(start, math.min(start + 16, f.content.length))
        Frame(f.doc_id, i, m.width, m.height, bytes)
      }
    }
  }

  /** Resize metadata transform: clamps each media's decoded dimensions
    * into a bounding box preserving aspect ratio — integer-exact (no
    * float rounding ambiguity cross-engine). A real impl would also
    * re-encode `content`; the geometry IS the testable contract. */
  final case class Resized(doc_id: Long, width: Long, height: Long,
                           out_width: Long, out_height: Long)

  def resizeMeta(files: Dataset[MediaFile], maxW: Long, maxH: Long): Dataset[Resized] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map { f =>
      val m = decode(f.content)
      val (w, h) = (m.width, m.height)
      val (ow, oh) =
        if (w <= maxW && h <= maxH) (w, h)
        else if (w * maxH >= h * maxW) (maxW, math.max(1L, h * maxW / w))
        else (math.max(1L, w * maxH / h), maxH)
      Resized(f.doc_id, w, h, ow, oh)
    })
  }

  // --------------------------------------------------------- audio / video

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Parsed WAV (RIFF/WAVE) metadata. */
  final case class AudioInfo(format: String, sampleRate: Long, channels: Long,
                             bitsPerSample: Long, nSamples: Long,
                             durationMs: Long)

  /** Typed audio metadata row. */
  final case class AudioMeta(doc_id: Long, source: String, format: String,
                             n_bytes: Long, sample_rate: Long, channels: Long,
                             bits_per_sample: Long, n_samples: Long,
                             duration_ms: Long)

  private def isWav(b: Array[Byte]): Boolean =
    b.length > 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** WAV: walk the RIFF chunk list — `fmt ` gives the PCM layout,
    * `data`'s length gives the sample count; duration floors to ms.
    * RIFF chunks are word-aligned (odd payloads pad one byte) and the
    * walker honors that; truncated/missing chunks throw loudly with
    * bounds checked BEFORE every read. */
  def decodeWav(b: Array[Byte]): AudioInfo = {
    require(isWav(b), s"not a RIFF/WAVE payload (${b.length} bytes)")
    var o = 12
    var sampleRate = -1L; var channels = -1L; var bits = -1L; var dataLen = -1L
    while (o + 8 <= b.length && (sampleRate < 0 || dataLen < 0)) {
      val isFmt = b(o) == 'f' && b(o + 1) == 'm' && b(o + 2) == 't' && b(o + 3) == ' '
      val isData = b(o) == 'd' && b(o + 1) == 'a' && b(o + 2) == 't' && b(o + 3) == 'a'
      val len = le32(b, o + 4)
      if (isFmt) {
        require(o + 24 <= b.length && len >= 16,
          s"truncated fmt chunk at offset $o")
        channels = le16(b, o + 10).toLong
        sampleRate = le32(b, o + 12)
        bits = le16(b, o + 22).toLong
      } else if (isData) {
        require(o + 8 + len <= b.length,
          s"data chunk claims $len bytes past end of payload")
        dataLen = len
      }
      // len is unsigned-32 as Long: advance in Long space, reject
      // anything Int can't index (no in-memory payload is that big)
      val next = o.toLong + 8L + len + (len & 1L)
      require(next <= Int.MaxValue, s"chunk at $o claims $len bytes")
      o = next.toInt
    }
    require(sampleRate > 0 && channels > 0 && bits > 0,
      "RIFF/WAVE without a valid fmt chunk")
    require(dataLen >= 0, "RIFF/WAVE without a data chunk")
    val frameBytes = math.max(1L, channels * (bits / 8))
    val n = dataLen / frameBytes
    AudioInfo("wav", sampleRate, channels, bits, n, n * 1000L / sampleRate)
  }

  /** Minimal spec-valid PCM WAV encoder: real RIFF sizes, fmt layout
    * and a deterministic sample ramp as honest payload bytes. */
  def makeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
              nSamples: Int): Array[Byte] = {
    require(bitsPerSample % 8 == 0 && bitsPerSample > 0, "whole-byte samples only")
    val frameBytes = channels * bitsPerSample / 8
    val dataLen = nSamples * frameBytes
    val out = new ByteArrayOutputStream(44 + dataLen)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    ascii("RIFF"); w32(36L + dataLen); ascii("WAVE")
    ascii("fmt "); w32(16); w16(1 /* PCM */); w16(channels)
    w32(sampleRate.toLong); w32(sampleRate.toLong * frameBytes)
    w16(frameBytes); w16(bitsPerSample)
    ascii("data"); w32(dataLen.toLong)
    (0 until dataLen).foreach(i => out.write((i * 31 + 7) & 0xff))
    out.toByteArray
  }

  /** Parsed MP4 (ISO BMFF) movie-header metadata. */
  final case class VideoInfo(format: String, timescale: Long, duration: Long,
                             durationMs: Long, nTracks: Long)

  /** Typed video metadata row. */
  final case class VideoMeta(doc_id: Long, source: String, format: String,
                             n_bytes: Long, duration_ms: Long, n_tracks: Long)

  private def isMp4(b: Array[Byte]): Boolean =
    b.length >= 16 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** MP4: walk the top-level box list to `moov`, then its children —
    * `mvhd` (version 0 or 1) gives timescale + duration, `trak` boxes
    * count tracks. Never touches `mdat`: header-only, the 100 TB shape
    * (media payload bytes stay unread on the executor). */
  def decodeMp4(b: Array[Byte]): VideoInfo = {
    require(isMp4(b), s"not an ISO BMFF payload (${b.length} bytes)")
    var timescale = -1L; var duration = -1L; var nTracks = 0L
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val size = be32(b, o)
        require(size >= 8 && o + size <= to,
          s"box at offset $o claims $size bytes in a ${to - o}-byte span")
        val typ = new String(b, o + 4, 4, "US-ASCII")
        if (depth == 0 && typ == "moov") walk(o + 8, (o + size).toInt, 1)
        else if (depth == 1 && typ == "trak") nTracks += 1
        else if (depth == 1 && typ == "mvhd") {
          require(o + 12 <= to, s"truncated mvhd at offset $o")
          val version = b(o + 8) & 0xff
          if (version == 1) {
            require(o + 40 <= to, "truncated mvhd v1")
            timescale = be32(b, o + 28)
            duration = (be32(b, o + 32) << 32) | be32(b, o + 36)
          } else {
            require(o + 28 <= to, "truncated mvhd v0")
            timescale = be32(b, o + 20)
            duration = be32(b, o + 24)
          }
        }
        o += size.toInt
      }
    }
    walk(0, b.length, 0)
    require(timescale > 0, "ISO BMFF without a moov/mvhd box")
    VideoInfo("mp4", timescale, duration, duration * 1000L / timescale, nTracks)
  }

  /** Minimal spec-valid ISO BMFF encoder: real box syntax for the
    * metadata boxes header extraction reads — `ftyp`, `moov` holding an
    * mvhd v0 and `nTracks` trak/tkhd children. No mdat (media payload):
    * exactly the byte span a metadata pass touches at scale. */
  def makeMp4(timescale: Int, duration: Long, nTracks: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w32(v: Long): Unit =
      (3 to 0 by -1).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    // ftyp: major brand isom, minor version 0, one compatible brand
    w32(20); ascii("ftyp"); ascii("isom"); w32(0); ascii("isom")
    val mvhdSize = 108
    val tkhdSize = 92
    val trakSize = 8 + tkhdSize
    w32(8L + mvhdSize + nTracks.toLong * trakSize); ascii("moov")
    w32(mvhdSize.toLong); ascii("mvhd")
    w32(0) // version 0 + flags
    w32(0); w32(0) // creation, modification
    w32(timescale.toLong); w32(duration)
    w32(0x00010000L); w32(0x01000000L) // rate 1.0; volume 1.0 + reserved
    w32(0); w32(0) // reserved
    Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L).foreach(w32)
    (0 until 6).foreach(_ => w32(0)) // pre_defined
    w32(nTracks.toLong + 1) // next_track_ID
    (1 to nTracks).foreach { t =>
      w32(trakSize.toLong); ascii("trak")
      w32(tkhdSize.toLong); ascii("tkhd")
      w32(7) // version 0, flags: enabled|in-movie|in-preview
      w32(0); w32(0) // creation, modification
      w32(t.toLong); w32(0) // track_ID, reserved
      w32(duration)
      w32(0); w32(0) // reserved
      w32(0); w32(0) // layer+group; volume+reserved
      Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L).foreach(w32)
      w32(0); w32(0) // width, height (16.16 — 0 for non-visual fixture)
    }
    out.toByteArray
  }

  /** Audio metadata extraction over binary payloads — the WAV
    * counterpart of [[extractMeta]]: one executor-side pass, header
    * bytes only. */
  def extractAudioMeta(files: Dataset[MediaFile]): Dataset[AudioMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map { f =>
      val a = decodeWav(f.content)
      AudioMeta(f.doc_id, f.source, a.format, f.content.length.toLong,
        a.sampleRate, a.channels, a.bitsPerSample, a.nSamples, a.durationMs)
    })
  }

  /** Video metadata extraction over binary payloads — ISO BMFF movie
    * header, same executor-side single pass. */
  def extractVideoMeta(files: Dataset[MediaFile]): Dataset[VideoMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map { f =>
      val v = decodeMp4(f.content)
      VideoMeta(f.doc_id, f.source, v.format, f.content.length.toLong,
        v.durationMs, v.nTracks)
    })
  }

  /** Feature extraction stub: fixed-width float vector per media row
    * (real impl: an ONNX/image-model forward pass per batch). The
    * deterministic fake hashes byte windows so the vector is stable and
    * oracle-expressible; the plumbing — one vector column out, batched
    * partition processing — is the real shape. */
  def extractFeatures(files: Dataset[MediaFile], dim: Int): Dataset[(Long, Array[Float])] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map { f =>
      val v = Array.tabulate(dim) { d =>
        val b = if (f.content.isEmpty) 0
                else f.content(d % f.content.length) & 0xff
        ((b * (d + 1)) % 256) / 255.0f
      }
      (f.doc_id, v)
    })
  }
}
