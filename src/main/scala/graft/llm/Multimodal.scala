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
}
