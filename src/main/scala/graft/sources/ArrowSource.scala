package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** `:arrow` — Arrow-IPC file source (SURVEY.md §2.1 #4). The reference's
  * own chunk format IS Arrow IPC (core2/operator/arrow.clj reads it);
  * Spark has no built-in arrow *file* reader, so this is a small custom
  * source on the arrow-java libs Spark already ships:
  *
  *   - the DRIVER reads only the first file's footer for the schema,
  *   - EXECUTORS open their files with `ArrowFileReader` and emit rows —
  *     one task per file, no data through the driver,
  *   - columns decode via the typed vector API (no reflection per cell).
  *
  * Scale: like any file source, parallelism = number of files; a 100 TB
  * arrow dataset is many chunk files, each a single task reading
  * record batches (per-task memory is one file's batches — arrow chunks
  * are sized for that by construction). Type subset: the primitive
  * types the reference's chunks use (int32/64, float32/64, utf8, bool).
  */
object ArrowSource {

  private def toSpark(t: ArrowType): DataType = t match {
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case f: ArrowType.FloatingPoint
      if f.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case f: ArrowType.FloatingPoint
      if f.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Bool => BooleanType
    case other =>
      throw new IllegalArgumentException(s"unsupported arrow type: $other")
  }

  /** Spark schema of an Arrow IPC file (driver-side footer read only). */
  def sparkSchema(path: String): StructType = {
    val alloc = new RootAllocator()
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val r = new ArrowFileReader(ch, alloc)
      try StructType(r.getVectorSchemaRoot.getSchema.getFields.asScala.map(f =>
        StructField(f.getName, toSpark(f.getType), f.isNullable)).toSeq)
      finally r.close()
    } finally { ch.close(); alloc.close() }
  }

  /** Read Arrow IPC files as a DataFrame — one task per file. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "arrow source: no files")
    val schema = sparkSchema(paths.head)
    val rdd = spark.sparkContext.parallelize(paths, paths.size).flatMap { p =>
      val alloc = new RootAllocator()
      val ch = FileChannel.open(Paths.get(p), StandardOpenOption.READ)
      val r = new ArrowFileReader(ch, alloc)
      try {
        val root = r.getVectorSchemaRoot
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (r.loadNextBatch()) {
          val vs = root.getFieldVectors.asScala.toIndexedSeq
          var i = 0
          while (i < root.getRowCount) {
            out += Row(vs.map(v => cell(v, i)): _*)
            i += 1
          }
        }
        out
      } finally { r.close(); ch.close(); alloc.close() }
    }
    spark.createDataFrame(rdd, schema)
  }

  private def cell(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: BigIntVector => x.get(i)
      case x: IntVector => x.get(i)
      case x: Float8Vector => x.get(i)
      case x: Float4Vector => x.get(i)
      case x: VarCharVector => new String(x.get(i), "UTF-8")
      case x: BitVector => x.get(i) == 1
      case other =>
        throw new IllegalArgumentException(s"unsupported vector: ${other.getClass}")
    }

  /** Write a DataFrame to ONE Arrow IPC file via a driver-side collect —
    * a fixture/interchange utility (small results out to arrow
    * consumers), NOT a distributed sink; [[read]] is the operator. */
  def writeOne(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val fields = schema.fields.map { f =>
      val at = f.dataType match {
        case LongType => new ArrowType.Int(64, true)
        case IntegerType => new ArrowType.Int(32, true)
        case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
        case StringType => new ArrowType.Utf8()
        case BooleanType => new ArrowType.Bool()
        case other =>
          throw new IllegalArgumentException(s"unsupported spark type: $other")
      }
      new Field(f.name, new FieldType(f.nullable, at, null), null)
    }
    val rows = df.collect()
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(new ArrowSchema(fields.toSeq.asJava), alloc)
    try {
      root.allocateNew()
      rows.zipWithIndex.foreach { case (row, i) =>
        schema.fields.zipWithIndex.foreach { case (f, j) =>
          if (!row.isNullAt(j)) f.dataType match {
            case LongType =>
              root.getVector(j).asInstanceOf[BigIntVector].setSafe(i, row.getLong(j))
            case IntegerType =>
              root.getVector(j).asInstanceOf[IntVector].setSafe(i, row.getInt(j))
            case DoubleType =>
              root.getVector(j).asInstanceOf[Float8Vector].setSafe(i, row.getDouble(j))
            case FloatType =>
              root.getVector(j).asInstanceOf[Float4Vector].setSafe(i, row.getFloat(j))
            case StringType =>
              root.getVector(j).asInstanceOf[VarCharVector]
                .setSafe(i, row.getString(j).getBytes("UTF-8"))
            case BooleanType =>
              root.getVector(j).asInstanceOf[BitVector]
                .setSafe(i, if (row.getBoolean(j)) 1 else 0)
            case _ => ()
          }
        }
      }
      root.setRowCount(rows.length)
      Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
      val ch = FileChannel.open(Paths.get(path), StandardOpenOption.CREATE,
        StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
      val w = new ArrowFileWriter(root, null, ch)
      try { w.start(); w.writeBatch(); w.end() }
      finally { w.close(); ch.close() }
    } finally { root.close(); alloc.close() }
  }
}
