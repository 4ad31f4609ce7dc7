package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.compression.CompressionUtil
import org.apache.arrow.vector.complex.DenseUnionVector
import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryProvider}
import org.apache.arrow.vector.holders.{NullableBigIntHolder, NullableVarCharHolder}
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.arrow.vector.ipc.message.IpcOption
import org.apache.arrow.vector.types.UnionMode
import org.apache.arrow.vector.types.pojo.{ArrowType, DictionaryEncoding, Field, FieldType}

/** Writer for the Arrow chunk shapes the reference's own stores emit
  * but Spark cannot produce natively — used by specs and the q116
  * catalog entry to prove [[ArrowSource.read]] handles them:
  *
  *   - a DENSE UNION column (per-cell dynamic typing: bigint | utf8),
  *   - an `arrow.uuid` extension column (fixed-size-binary-16 storage),
  *   - an `arrow.uri` extension column (utf8 storage),
  *   - a DICTIONARY-encoded utf8 column (int32 indexes),
  *   - optional ZSTD/LZ4 body-buffer compression.
  *
  * Driver-side and small by design (a fixture generator, not a sink —
  * [[ArrowSource.write]] is the distributed path); the value is on the
  * READ side, where these files exercise every special tier of the
  * source at once. */
object ArrowFixtures {

  /** One row of the heterogeneous demo chunk: `v` carries EITHER a long
    * (`vLong`) or a string (`vStr`) — per-row dynamic typing. */
  final case class HeteroRow(id: Long, vLong: java.lang.Long, vStr: String,
                             uuid: java.util.UUID, uri: String, tag: String)

  /** Write `rows` as one Arrow IPC file at `path`. The `tag` column is
    * dictionary-encoded over its distinct values (first-appearance
    * order); `codec` as in [[ArrowSource.write]]. */
  def writeHeteroChunk(rows: Seq[HeteroRow], path: String,
                       codec: Option[String] = Some("zstd")): Unit = {
    val alloc = new RootAllocator()
    try {
      // id: plain bigint
      val idVec = new BigIntVector("id", alloc)
      idVec.allocateNew(rows.size)
      rows.zipWithIndex.foreach { case (r, i) => idVec.setSafe(i, r.id) }
      idVec.setValueCount(rows.size)

      // v: dense union of bigint (type 0) | utf8 (type 1)
      val duv = DenseUnionVector.empty("v", alloc)
      val longId = duv.registerNewTypeId(
        Field.nullable("i64", new ArrowType.Int(64, true)))
      val strId = duv.registerNewTypeId(
        Field.nullable("utf8", new ArrowType.Utf8()))
      duv.addVector(longId, new BigIntVector("i64", alloc))
      duv.addVector(strId, new VarCharVector("utf8", alloc))
      duv.allocateNew()
      val lh = new NullableBigIntHolder
      rows.zipWithIndex.foreach { case (r, i) =>
        if (r.vLong != null) {
          duv.setTypeId(i, longId)
          lh.isSet = 1; lh.value = r.vLong
          duv.setSafe(i, lh)
        } else {
          val bytes = r.vStr.getBytes("UTF-8")
          val buf = alloc.buffer(math.max(1, bytes.length).toLong)
          try {
            buf.setBytes(0, bytes)
            val sh = new NullableVarCharHolder
            sh.isSet = 1; sh.buffer = buf; sh.start = 0; sh.end = bytes.length
            duv.setTypeId(i, strId)
            duv.setSafe(i, sh)
          } finally buf.close()
        }
      }
      duv.setValueCount(rows.size)

      // doc_uuid: fixed-size-binary-16 storage + arrow.uuid metadata
      val uuidField = new Field("doc_uuid",
        new FieldType(true, new ArrowType.FixedSizeBinary(16), null,
          Map("ARROW:extension:name" -> "arrow.uuid").asJava), null)
      val uuidVec = uuidField.createVector(alloc)
        .asInstanceOf[FixedSizeBinaryVector]
      uuidVec.allocateNew(rows.size)
      rows.zipWithIndex.foreach { case (r, i) =>
        val bb = java.nio.ByteBuffer.allocate(16)
        bb.putLong(r.uuid.getMostSignificantBits)
        bb.putLong(r.uuid.getLeastSignificantBits)
        uuidVec.setSafe(i, bb.array())
      }
      uuidVec.setValueCount(rows.size)

      // src_uri: utf8 storage + arrow.uri metadata
      val uriField = new Field("src_uri",
        new FieldType(true, new ArrowType.Utf8(), null,
          Map("ARROW:extension:name" -> "arrow.uri").asJava), null)
      val uriVec = uriField.createVector(alloc).asInstanceOf[VarCharVector]
      uriVec.allocateNew()
      rows.zipWithIndex.foreach { case (r, i) =>
        uriVec.setSafe(i, r.uri.getBytes("UTF-8"))
      }
      uriVec.setValueCount(rows.size)

      // tag: int32 indexes into a utf8 dictionary
      val tags = rows.map(_.tag).distinct
      val tagIndex = tags.zipWithIndex.toMap
      val encoding = new DictionaryEncoding(1L, false,
        new ArrowType.Int(32, true))
      val dictVec = new VarCharVector("tag_values", alloc)
      dictVec.allocateNew()
      tags.zipWithIndex.foreach { case (t, i) =>
        dictVec.setSafe(i, t.getBytes("UTF-8"))
      }
      dictVec.setValueCount(tags.size)
      val dictionary = new Dictionary(dictVec, encoding)
      val tagVec = new IntVector(new Field("tag",
        new FieldType(true, new ArrowType.Int(32, true), encoding, null),
        null), alloc)
      tagVec.allocateNew(rows.size)
      rows.zipWithIndex.foreach { case (r, i) =>
        tagVec.setSafe(i, tagIndex(r.tag))
      }
      tagVec.setValueCount(rows.size)

      val provider = new DictionaryProvider.MapDictionaryProvider(dictionary)
      val root = VectorSchemaRoot.of(idVec, duv, uuidVec, uriVec, tagVec)
      try {
        root.setRowCount(rows.size)
        Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
        val ch = FileChannel.open(Paths.get(path), StandardOpenOption.CREATE,
          StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
        val w = codec match {
          case Some("zstd") => new ArrowFileWriter(root, provider, ch,
            null: java.util.Map[String, String], IpcOption.DEFAULT,
            CommonsCompressionFactory.INSTANCE, CompressionUtil.CodecType.ZSTD)
          case Some("lz4") => new ArrowFileWriter(root, provider, ch,
            null: java.util.Map[String, String], IpcOption.DEFAULT,
            CommonsCompressionFactory.INSTANCE,
            CompressionUtil.CodecType.LZ4_FRAME)
          case None => new ArrowFileWriter(root, provider, ch)
          case Some(other) => throw new IllegalArgumentException(
            s"unsupported arrow codec '$other' (zstd | lz4)")
        }
        try { w.start(); w.writeBatch(); w.end() }
        finally { w.close(); ch.close() }
      } finally { root.close(); dictVec.close() }
    } finally alloc.close()
  }
}
