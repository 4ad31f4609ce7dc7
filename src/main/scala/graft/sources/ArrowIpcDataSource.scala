package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnVector, ColumnarBatch}

/** DataSourceV2 for Arrow IPC files with COLUMNAR reads: each record
  * batch is exposed to Spark as a `ColumnarBatch` of
  * `ArrowColumnVector`s wrapping the arrow buffers directly — zero
  * per-cell decode, zero copy; Spark's ColumnarToRow (codegen'd) takes
  * over from there, and column pruning reaches the source via
  * `SupportsPushDownRequiredColumns` (unrequested vectors are never
  * wrapped).
  *
  * One input partition per file, one record batch resident per task —
  * the same scale shape as [[ArrowSource.read]]'s row path, which
  * remains the fallback for arrow types Spark's columnar accessors
  * don't cover (non-microsecond timestamps, DateMilli); [[ArrowSource
  * .read]] picks the path automatically from the footer schema. */
final class ArrowIpcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "arrow-ipc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArrowSource.sparkSchema(ArrowIpcDataSource.paths(options.asScala.toMap).head)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ArrowIpcTable(schema,
      ArrowIpcDataSource.paths(properties.asScala.toMap))

  override def supportsExternalMetadata(): Boolean = true
}

object ArrowIpcDataSource {
  /** Our own delimiter-free option key (the generic "paths" option is a
    * JSON array — needless parsing for a programmatic source). */
  val PathsOption = "arrow.paths"

  private[sources] def paths(options: Map[String, String]): Seq[String] = {
    val raw = options.getOrElse(PathsOption,
      throw new IllegalArgumentException(s"missing option $PathsOption"))
    raw.split('\n').toSeq.filter(_.nonEmpty)
  }

  /** Can every column be served through Spark's ArrowColumnVector
    * accessors? (micro-precision timestamps and day dates only;
    * recursing into list/struct children.) Dictionary-encoded and
    * extension-typed fields need per-cell conversion (index→value,
    * bytes→uuid string), so they take [[ArrowSource.read]]'s row path. */
  private[sources] def columnarSupported(f: Field): Boolean =
    f.getDictionary == null && ArrowSource.extName(f).isEmpty &&
      storageSupported(f)

  private def storageSupported(f: Field): Boolean = f.getType match {
    case i: ArrowType.Int => Seq(8, 16, 32, 64).contains(i.getBitWidth)
    case fp: ArrowType.FloatingPoint =>
      fp.getPrecision == FloatingPointPrecision.SINGLE ||
        fp.getPrecision == FloatingPointPrecision.DOUBLE
    case _: ArrowType.Utf8 | _: ArrowType.Bool | _: ArrowType.Binary |
         _: ArrowType.Decimal => true
    case d: ArrowType.Date => d.getUnit == DateUnit.DAY
    case t: ArrowType.Timestamp => t.getUnit == TimeUnit.MICROSECOND
    case _: ArrowType.List | _: ArrowType.Struct =>
      f.getChildren.asScala.forall(columnarSupported)
    case _ => false
  }
}

private final class ArrowIpcTable(tableSchema: StructType, paths: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = s"arrow-ipc(${paths.headOption.getOrElse("")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowScanBuilder(tableSchema, paths)
}

private final class ArrowScanBuilder(full: StructType, paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new ArrowScan(required, paths)
}

private final class ArrowScan(required: StructType, paths: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"arrow-ipc ${paths.size} file(s), ReadSchema: ${required.simpleString}"
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(ArrowFilePartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowReaderFactory(required.fieldNames)
}

private final case class ArrowFilePartition(path: String) extends InputPartition

private final class ArrowReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = true

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    new ArrowColumnarReader(p.asInstanceOf[ArrowFilePartition].path, columns)

  /** Row fallback (Spark may decline columnar): batches through the
    * columnar reader, iterated as InternalRows. */
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val inner = createColumnarReader(p)
    new PartitionReader[InternalRow] {
      private var rows: util.Iterator[InternalRow] =
        util.Collections.emptyIterator()
      override def next(): Boolean = {
        while (!rows.hasNext) {
          if (!inner.next()) return false
          rows = inner.get().rowIterator()
        }
        true
      }
      override def get(): InternalRow = rows.next()
      override def close(): Unit = inner.close()
    }
  }
}

/** One file, one record batch in memory at a time; the ColumnarBatch
  * wraps the live arrow vectors (refreshed per `loadNextBatch`), so the
  * batch must be consumed before the next `next()` — exactly Spark's
  * PartitionReader contract. All resources release in `close()`, which
  * Spark's DataSourceRDD invokes on task completion or early exit. */
private final class ArrowColumnarReader(path: String, columns: Array[String])
    extends PartitionReader[ColumnarBatch] {
  private val alloc = new RootAllocator()
  private val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
  private val reader = new ArrowFileReader(ch, alloc,
    org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
  private val root = reader.getVectorSchemaRoot
  private var batch: ColumnarBatch = _

  override def next(): Boolean =
    if (!reader.loadNextBatch()) false
    else {
      val vecs: Array[ColumnVector] = columns.map { c =>
        val v = root.getVector(c)
        if (v == null) throw new IllegalArgumentException(
          s"arrow file $path has no column '$c' — all files of one " +
            "read must share the first file's schema")
        new ArrowColumnVector(v): ColumnVector
      }
      batch = new ColumnarBatch(vecs, root.getRowCount)
      true
    }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = { reader.close(); ch.close(); alloc.close() }
}
