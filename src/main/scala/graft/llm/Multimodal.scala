package graft.llm

import org.apache.spark.sql.Dataset

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata extraction.
  *
  * The decode step is a clearly-marked deterministic STUB (the container
  * has no image/audio codecs); everything around it — the typed schema,
  * the partition-wise batch processing, the Dataset signature — is the
  * real 100 TB-shaped plumbing: decoding runs executor-side per
  * partition, never on the driver, and the binary payload is projected
  * only where needed so parquet column pruning keeps untouched media off
  * the wire.
  */
object Multimodal {

  /** A media row: opaque bytes + routing metadata. */
  final case class MediaFile(doc_id: Long, source: String, content: Array[Byte])

  /** Typed metadata produced by the (stubbed) decoder. */
  final case class MediaMeta(doc_id: Long, source: String, n_bytes: Long,
                             width: Long, height: Long, n_frames: Long)

  /** STUB decoder — stands in for e.g. a JPEG/ffmpeg header parse. Real
    * implementation would parse `bytes`; this fake derives deterministic
    * dimensions from the payload length so tests and oracles stay exact.
    */
  def decodeStub(bytes: Array[Byte]): (Long, Long, Long) = {
    val n = bytes.length.toLong
    (64 + n % 640, 48 + (n * 7) % 480, 1 + n % 5)
  }

  /** Executor-side metadata extraction; mapPartitions so a real decoder
    * could amortize per-partition setup (codec contexts, native buffers).
    */
  def extractMeta(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map { f =>
      val (w, h, fr) = decodeStub(f.content)
      MediaMeta(f.doc_id, f.source, f.content.length.toLong, w, h, fr)
    })
  }

  /** One sampled video frame: parent id, 1-based frame index, frame
    * payload (stub: a deterministic slice of the parent bytes), and the
    * decoded-at dimensions. */
  final case class Frame(doc_id: Long, frame_idx: Long, width: Long,
                         height: Long, frame_bytes: Array[Byte])

  /** Frame sampling: each media row explodes into every `stride`-th
    * frame (1-based: 1, 1+stride, …). flatMap keeps it one executor-side
    * pass — the 100 TB shape is rows-out ∝ frames, never a driver loop.
    * The frame "decode" is the stub: a real impl would hand `bytes` to a
    * demuxer and emit decoded frames from the same iterator. */
  def sampleFrames(files: Dataset[MediaFile], stride: Int): Dataset[Frame] = {
    require(stride >= 1, "stride must be >= 1")
    import files.sparkSession.implicits._
    files.flatMap { f =>
      val (w, h, nFrames) = decodeStub(f.content)
      (1L to nFrames by stride.toLong).map { i =>
        // stub frame payload: deterministic 16-byte slice per index
        val start = ((i - 1) * 16 % math.max(1, f.content.length)).toInt
        val bytes = f.content.slice(start, math.min(start + 16, f.content.length))
        Frame(f.doc_id, i, w, h, bytes)
      }
    }
  }

  /** Resize metadata transform: clamps each media's (stub-)decoded
    * dimensions into a bounding box preserving aspect ratio —
    * integer-exact (no float rounding ambiguity cross-engine). A real
    * impl would also re-encode `content`; the geometry IS the testable
    * contract. */
  final case class Resized(doc_id: Long, width: Long, height: Long,
                           out_width: Long, out_height: Long)

  def resizeMeta(files: Dataset[MediaFile], maxW: Long, maxH: Long): Dataset[Resized] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map { f =>
      val (w, h, _) = decodeStub(f.content)
      val (ow, oh) =
        if (w <= maxW && h <= maxH) (w, h)
        else if (w * maxH >= h * maxW) (maxW, math.max(1L, h * maxW / w))
        else (math.max(1L, w * maxH / h), maxH)
      Resized(f.doc_id, w, h, ow, oh)
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
