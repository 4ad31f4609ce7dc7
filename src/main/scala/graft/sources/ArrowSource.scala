package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.{DenseUnionVector, ListVector, StructVector}
import org.apache.arrow.vector.compression.CompressionUtil
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.ipc.message.IpcOption
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.util.Text
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, parse_json}
import org.apache.spark.sql.types._

/** `:arrow` — Arrow-IPC file source (SURVEY.md §2.1 #4). The reference's
  * own chunk format IS Arrow IPC (core2/operator/arrow.clj reads it);
  * Spark has no built-in arrow *file* reader, so this is a small custom
  * source on the arrow-java libs Spark already ships:
  *
  *   - the DRIVER reads only the first file's footer for the schema,
  *   - EXECUTORS open their files with `ArrowFileReader` and emit rows
  *     LAZILY, one record batch in memory at a time — per-task memory is
  *     one batch, not the whole file (a 100 TB chunk store has many
  *     multi-batch files; buffering a file per task would OOM),
  *   - cleanup is tied to task completion (`addTaskCompletionListener`),
  *     so early-terminating consumers (limit, take) still release the
  *     allocator,
  *   - columns decode via the typed vector API (no reflection per cell).
  *
  * Type coverage matches the reference's chunk types (SURVEY §1.3):
  * int8/16/32/64, float32/64, utf8, bool, binary, date, timestamp
  * (second/milli/micro/nano, with and without tz), decimal, list,
  * struct — nested types recurse.
  */
object ArrowSource {

  /** Canonical Arrow extension-type name from field metadata (the IPC
    * spec's `ARROW:extension:name` key), if any. Unregistered extension
    * types come back from arrow-java as their STORAGE type with the
    * metadata preserved — exactly what we key off. */
  private[sources] def extName(f: Field): Option[String] =
    Option(f.getMetadata).flatMap(m => Option(m.get("ARROW:extension:name")))

  /** Arrow field (incl. children for list/struct) → Spark type.
    *
    * Three special tiers before the storage-type match (SURVEY §1.3/§1.4):
    *   - DICTIONARY-encoded fields (the memory-format schema shows the
    *     index type + a non-null encoding) decode to their utf8 values
    *     → StringType; non-utf8 dictionaries fail loudly at decode,
    *   - EXTENSION types: uuid (fixed-binary-16 storage) reads as its
    *     canonical string form, uri (utf8 storage) as a plain string,
    *   - DENSE UNIONS (per-cell dynamic typing, the reference's
    *     DenseUnionVector) decode to a JSON scalar string that
    *     [[read]] parses into a real VariantType column.
    */
  private def toSpark(f: Field): DataType =
    if (f.getDictionary != null) StringType
    else extName(f) match {
      case Some(n) if n == "arrow.uuid" || n.endsWith("/uuid") || n == "uuid" =>
        StringType
      case Some(n) if n == "arrow.uri" || n.endsWith("/uri") || n == "uri" =>
        StringType
      case _ => storageToSpark(f)
    }

  private def storageToSpark(f: Field): DataType = f.getType match {
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case i: ArrowType.Int if i.getBitWidth == 16 => ShortType
    case i: ArrowType.Int if i.getBitWidth == 8 => ByteType
    case fp: ArrowType.FloatingPoint
      if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case fp: ArrowType.FloatingPoint
      if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.Binary => BinaryType
    case _: ArrowType.Date => DateType
    case t: ArrowType.Timestamp =>
      if (t.getTimezone != null) TimestampType else TimestampNTZType
    case d: ArrowType.Decimal => DecimalType(d.getPrecision, d.getScale)
    case _: ArrowType.List =>
      val el = f.getChildren.get(0)
      ArrayType(toSpark(el), el.isNullable)
    case _: ArrowType.Struct =>
      StructType(f.getChildren.asScala.map(c =>
        StructField(c.getName, toSpark(c), c.isNullable)).toSeq)
    case _: ArrowType.FixedSizeBinary => BinaryType
    case _: ArrowType.Union => StringType // JSON scalar; read() → Variant
    case other =>
      throw new IllegalArgumentException(s"unsupported arrow type: $other")
  }

  private def isDenseUnion(f: Field): Boolean = f.getType match {
    case u: ArrowType.Union =>
      u.getMode == org.apache.arrow.vector.types.UnionMode.Dense
    case _ => false
  }

  /** Arrow field list from a file footer (driver-side read only). */
  private[sources] def footerFields(path: String): Seq[Field] = {
    val alloc = new RootAllocator()
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val r = new ArrowFileReader(ch, alloc, CommonsCompressionFactory.INSTANCE)
      try r.getVectorSchemaRoot.getSchema.getFields.asScala.toSeq
      finally r.close()
    } finally { ch.close(); alloc.close() }
  }

  /** Spark schema of an Arrow IPC file (driver-side footer read only). */
  def sparkSchema(path: String): StructType =
    StructType(footerFields(path).map(f =>
      StructField(f.getName, toSpark(f), f.isNullable)))

  /** Read Arrow IPC files as a DataFrame — one task per file, one
    * record batch resident per task at a time.
    *
    * Two physical paths, chosen from the footer schema: when every
    * column is coverable by Spark's `ArrowColumnVector` accessors the
    * scan goes through [[ArrowIpcDataSource]] (DataSourceV2, COLUMNAR
    * batches wrapping the arrow buffers zero-copy, column pruning
    * pushed into the source); otherwise (non-micro timestamps,
    * DateMilli) the row-at-a-time lazy iterator serves as fallback. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "arrow source: no files")
    val fields = footerFields(paths.head)
    if (fields.forall(ArrowIpcDataSource.columnarSupported)) {
      spark.read.format(classOf[ArrowIpcDataSource].getName)
        .option(ArrowIpcDataSource.PathsOption, paths.mkString("\n"))
        .load()
    } else {
      val schema = StructType(fields.map(f =>
        StructField(f.getName, toSpark(f), f.isNullable)))
      val rdd = spark.sparkContext.parallelize(paths, paths.size)
        .flatMap(p => new ArrowFileIterator(p))
      val base = spark.createDataFrame(rdd, schema)
      // dense-union columns arrive as JSON scalar strings; surface them
      // as real VariantType columns (§1.4 DUV → Variant mapping) so the
      // caller gets typed access (variant_get) + the runtime type tag
      val unions = fields.filter(isDenseUnion).map(_.getName).toSet
      if (unions.isEmpty) base
      else base.select(fields.map(f =>
        if (unions(f.getName)) parse_json(col(f.getName)).as(f.getName)
        else col(f.getName)): _*)
    }
  }

  /** Lazy per-batch row iterator over one Arrow IPC file. Loads the next
    * record batch only when the previous one is exhausted; closes the
    * reader+allocator at end-of-file, on [[close]], or (inside Spark) at
    * task completion — whichever comes first. `batchesLoaded` exists so
    * tests can PROVE streaming decode (read 1 row of an N-batch file →
    * 1 batch loaded). */
  private[graft] final class ArrowFileIterator(path: String)
      extends Iterator[Row] with AutoCloseable {
    private val alloc = new RootAllocator()
    private val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    private val reader =
      new ArrowFileReader(ch, alloc, CommonsCompressionFactory.INSTANCE)
    private val root = reader.getVectorSchemaRoot
    private var closed = false
    private var vs: IndexedSeq[FieldVector] = IndexedSeq.empty
    private var n = 0
    private var i = 0
    var batchesLoaded: Int = 0

    Option(TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => close()))

    /** Per-column decode function, chosen ONCE from the field (not per
      * cell): dictionary indexes resolve against the file's dictionary
      * values (loaded lazily by the reader with the first batch), uuid
      * extension bytes render canonically, dense unions render as JSON
      * scalars for [[read]]'s parse_json, everything else goes through
      * the generic [[cell]] decode. */
    private lazy val decoders: IndexedSeq[(FieldVector, Int) => Any] =
      root.getSchema.getFields.asScala.toIndexedSeq.map { f =>
        if (f.getDictionary != null) {
          val dictId = f.getDictionary.getId
          // resolved on first use: the reader materializes dictionary
          // batches together with the first record batch
          lazy val values = {
            val d = reader.getDictionaryVectors.get(dictId)
            require(d != null, s"arrow file $path: dictionary $dictId missing")
            d.getVector match {
              case vc: VarCharVector => vc
              case other => throw new IllegalArgumentException(
                s"only utf8 dictionaries supported, got ${other.getClass}")
            }
          }
          (v: FieldVector, i: Int) =>
            if (v.isNull(i)) null
            else {
              val idx = v match {
                case x: IntVector => x.get(i)
                case x: BigIntVector => x.get(i).toInt
                case x: SmallIntVector => x.get(i).toInt
                case x: TinyIntVector => x.get(i).toInt
                case other => throw new IllegalArgumentException(
                  s"unsupported dictionary index vector: ${other.getClass}")
              }
              new String(values.get(idx), "UTF-8")
            }
        } else if (extName(f).exists(n =>
            n == "arrow.uuid" || n.endsWith("/uuid") || n == "uuid")) {
          (v: FieldVector, i: Int) =>
            if (v.isNull(i)) null
            else uuidString(v.asInstanceOf[FixedSizeBinaryVector].get(i))
        } else if (isDenseUnion(f)) {
          (v: FieldVector, i: Int) =>
            if (v.isNull(i)) null
            else jsonScalar(v.asInstanceOf[DenseUnionVector].getObject(i))
        } else (v: FieldVector, i: Int) => cell(v, i)
      }

    def close(): Unit = if (!closed) {
      closed = true
      reader.close(); ch.close(); alloc.close()
    }

    @annotation.tailrec
    private def ensure(): Boolean =
      if (i < n) true
      else if (closed) false
      else if (reader.loadNextBatch()) {
        batchesLoaded += 1
        vs = root.getFieldVectors.asScala.toIndexedSeq
        n = root.getRowCount
        i = 0
        ensure()
      } else { close(); false }

    override def hasNext: Boolean = ensure()

    override def next(): Row = {
      if (!ensure()) throw new NoSuchElementException("arrow iterator exhausted")
      val row = Row(vs.indices.map(j => decoders(j)(vs(j), i)): _*)
      i += 1
      row
    }
  }

  /** 16 storage bytes → canonical lowercase UUID string (the typed
    * surface of the `arrow.uuid` extension type, SURVEY §1.3). */
  private def uuidString(b: Array[Byte]): String = {
    require(b.length == 16, s"uuid storage must be 16 bytes, got ${b.length}")
    val bb = java.nio.ByteBuffer.wrap(b)
    new java.util.UUID(bb.getLong, bb.getLong).toString
  }

  /** Dense-union cell value → JSON scalar text, preserving the runtime
    * type for Variant (string quotes vs bare number/bool — variant_get
    * and schema_of_variant see exactly the union's type tag). */
  private def jsonScalar(v: Any): String = v match {
    case null => null
    case t: Text => jsonQuote(t.toString)
    case s: String => jsonQuote(s)
    case b: java.lang.Boolean => b.toString
    case d: java.lang.Double => jsonDouble(d)
    case f: java.lang.Float => jsonDouble(f.toDouble)
    case n: java.lang.Number => n.toString
    case other => throw new IllegalArgumentException(
      s"unsupported dense-union member for variant decode: ${other.getClass}")
  }

  /** Floating members keep their DOUBLE runtime type through the JSON
    * intermediary: Spark's variant parser types plain decimal text
    * (`2.5`) as DECIMAL but exponent forms (`2.5E0`) as DOUBLE. */
  private def jsonDouble(d: Double): String = {
    require(!d.isNaN && !d.isInfinite,
      s"cannot represent $d in a variant (JSON has no NaN/Infinity)")
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "E0"
  }

  /** JSON-quote to PURE ASCII: control chars AND all non-ASCII escape
    * as \u sequences, so the variant parse downstream is immune to the
    * JVM default charset (containers often run POSIX/ASCII, where a
    * literal 'ö' in the JSON text would decode to replacement chars). */
  private def jsonQuote(s: String): String = {
    val sb = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Decode one cell to its Spark external type; recurses into
    * list/struct children. */
  private def cell(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: BigIntVector => x.get(i)
      case x: IntVector => x.get(i)
      case x: SmallIntVector => x.get(i)
      case x: TinyIntVector => x.get(i)
      case x: Float8Vector => x.get(i)
      case x: Float4Vector => x.get(i)
      case x: VarCharVector => new String(x.get(i), "UTF-8")
      case x: BitVector => x.get(i) == 1
      case x: VarBinaryVector => x.get(i)
      case x: DateDayVector => java.time.LocalDate.ofEpochDay(x.get(i).toLong)
      case x: DateMilliVector =>
        java.time.LocalDate.ofEpochDay(Math.floorDiv(x.get(i), 86400000L))
      case x: TimeStampVector =>
        val t = x.getField.getType.asInstanceOf[ArrowType.Timestamp]
        val raw = x.get(i)
        val micros = t.getUnit match {
          case TimeUnit.SECOND => Math.multiplyExact(raw, 1000000L)
          case TimeUnit.MILLISECOND => Math.multiplyExact(raw, 1000L)
          case TimeUnit.MICROSECOND => raw
          case TimeUnit.NANOSECOND => Math.floorDiv(raw, 1000L)
        }
        val inst = java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L)
        if (t.getTimezone != null) inst
        else java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)
      case x: DecimalVector => x.getObject(i)
      case x: FixedSizeBinaryVector => x.get(i)
      case x: ListVector =>
        val dv = x.getDataVector
        (x.getElementStartIndex(i) until x.getElementEndIndex(i))
          .map(j => cell(dv, j))
      case x: StructVector =>
        Row(x.getChildrenFromFields.asScala.map(c => cell(c, i)).toSeq: _*)
      case other =>
        throw new IllegalArgumentException(s"unsupported vector: ${other.getClass}")
    }

  private def scalarArrow(dt: DataType): ArrowType = dt match {
    case LongType => new ArrowType.Int(64, true)
    case IntegerType => new ArrowType.Int(32, true)
    case ShortType => new ArrowType.Int(16, true)
    case ByteType => new ArrowType.Int(8, true)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case StringType => new ArrowType.Utf8()
    case BooleanType => new ArrowType.Bool()
    case BinaryType => new ArrowType.Binary()
    case DateType => new ArrowType.Date(DateUnit.DAY)
    case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
    case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
    case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
    case other =>
      throw new IllegalArgumentException(s"unsupported spark type: $other")
  }

  private def toArrowField(name: String, dt: DataType, nullable: Boolean): Field =
    dt match {
      case ArrayType(et, cn) =>
        new Field(name, new FieldType(nullable, new ArrowType.List(), null),
          Seq(toArrowField("element", et, cn)).asJava)
      case st: StructType =>
        new Field(name, new FieldType(nullable, new ArrowType.Struct(), null),
          st.fields.map(f => toArrowField(f.name, f.dataType, f.nullable)).toSeq.asJava)
      case VariantType =>
        // per-cell dynamic typing writes back to its native Arrow form:
        // a dense union over the scalar member set the read side decodes
        // (§1.4 both directions). Type ids are positional (0..3).
        new Field(name,
          new FieldType(nullable,
            new ArrowType.Union(org.apache.arrow.vector.types.UnionMode.Dense,
              Array(0, 1, 2, 3)), null),
          Seq(
            Field.nullable("i64", new ArrowType.Int(64, true)),
            Field.nullable("f64",
              new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)),
            Field.nullable("utf8", new ArrowType.Utf8()),
            Field.nullable("bool", new ArrowType.Bool())).asJava)
      case scalar =>
        new Field(name, new FieldType(nullable, scalarArrow(scalar), null), null)
    }

  /** Write one Variant cell into a dense-union vector slot: the
    * variant's RUNTIME type picks the union member (long | double |
    * string | bool; variant-null and SQL-null both land as a null child
    * entry — dense unions have no validity of their own). Non-scalar
    * variants (objects/arrays) fail loudly: export them as JSON text
    * columns instead (`to_json`). */
  private def setVariant(duv: DenseUnionVector, i: Int, cell: Any): Unit = {
    import org.apache.arrow.vector.holders._
    import org.apache.spark.types.variant.VariantUtil
    val variant = cell match {
      case null => null
      case vv: org.apache.spark.unsafe.types.VariantVal =>
        new org.apache.spark.types.variant.Variant(vv.getValue, vv.getMetadata)
      case other => throw new IllegalArgumentException(
        s"not a variant cell: ${other.getClass}")
    }
    val t = if (variant == null) VariantUtil.Type.NULL else variant.getType
    t match {
      case VariantUtil.Type.LONG =>
        duv.setTypeId(i, 0)
        val h = new NullableBigIntHolder
        h.isSet = 1; h.value = variant.getLong
        duv.setSafe(i, h)
      case VariantUtil.Type.DOUBLE =>
        duv.setTypeId(i, 1)
        val h = new NullableFloat8Holder
        h.isSet = 1; h.value = variant.getDouble
        duv.setSafe(i, h)
      case VariantUtil.Type.DECIMAL =>
        // no variable-precision decimal member in the union: decimals
        // export through the f64 member (documented lossy-to-double)
        duv.setTypeId(i, 1)
        val h = new NullableFloat8Holder
        h.isSet = 1; h.value = variant.getDecimal.doubleValue
        duv.setSafe(i, h)
      case VariantUtil.Type.STRING =>
        val bytes = variant.getString.getBytes("UTF-8")
        val buf = duv.getAllocator.buffer(math.max(1, bytes.length).toLong)
        try {
          buf.setBytes(0, bytes)
          val h = new NullableVarCharHolder
          h.isSet = 1; h.buffer = buf; h.start = 0; h.end = bytes.length
          duv.setTypeId(i, 2)
          duv.setSafe(i, h)
        } finally buf.close()
      case VariantUtil.Type.BOOLEAN =>
        duv.setTypeId(i, 3)
        val h = new NullableBitHolder
        h.isSet = 1; h.value = if (variant.getBoolean) 1 else 0
        duv.setSafe(i, h)
      case VariantUtil.Type.NULL =>
        // dense unions have ONE null notion (a null child slot): variant
        // null and SQL null collapse — both read back as SQL null
        duv.setTypeId(i, 0)
        duv.setSafe(i, new NullableBigIntHolder) // isSet = 0: null slot
      case other => throw new IllegalArgumentException(
        s"unsupported variant runtime type for arrow export: $other " +
          "(scalar long/double/string/bool only; to_json object variants)")
    }
  }

  private def timestampMicros(v: Any): Long = v match {
    case ts: java.sql.Timestamp =>
      Math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L) +
        ts.getNanos / 1000L
    case inst: java.time.Instant =>
      Math.multiplyExact(inst.getEpochSecond, 1000000L) + inst.getNano / 1000L
    case ldt: java.time.LocalDateTime =>
      timestampMicros(ldt.toInstant(java.time.ZoneOffset.UTC))
    case other =>
      throw new IllegalArgumentException(s"not a timestamp: ${other.getClass}")
  }

  private def dateDays(v: Any): Int = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case other =>
      throw new IllegalArgumentException(s"not a date: ${other.getClass}")
  }

  /** Set one scalar cell on a vector (write path). */
  private def setScalar(vec: FieldVector, i: Int, dt: DataType, v: Any): Unit =
    dt match {
      case LongType => vec.asInstanceOf[BigIntVector]
        .setSafe(i, v.asInstanceOf[Long])
      case IntegerType => vec.asInstanceOf[IntVector]
        .setSafe(i, v.asInstanceOf[Int])
      case ShortType => vec.asInstanceOf[SmallIntVector]
        .setSafe(i, v.asInstanceOf[Short])
      case ByteType => vec.asInstanceOf[TinyIntVector]
        .setSafe(i, v.asInstanceOf[Byte])
      case DoubleType => vec.asInstanceOf[Float8Vector]
        .setSafe(i, v.asInstanceOf[Double])
      case FloatType => vec.asInstanceOf[Float4Vector]
        .setSafe(i, v.asInstanceOf[Float])
      case StringType => vec.asInstanceOf[VarCharVector]
        .setSafe(i, v.asInstanceOf[String].getBytes("UTF-8"))
      case BooleanType => vec.asInstanceOf[BitVector]
        .setSafe(i, if (v.asInstanceOf[Boolean]) 1 else 0)
      case BinaryType => vec.asInstanceOf[VarBinaryVector]
        .setSafe(i, v.asInstanceOf[Array[Byte]])
      case DateType => vec.asInstanceOf[DateDayVector].setSafe(i, dateDays(v))
      case TimestampType => vec.asInstanceOf[TimeStampMicroTZVector]
        .setSafe(i, timestampMicros(v))
      case TimestampNTZType => vec.asInstanceOf[TimeStampMicroVector]
        .setSafe(i, timestampMicros(v))
      case _: DecimalType => vec.asInstanceOf[DecimalVector]
        .setSafe(i, v.asInstanceOf[java.math.BigDecimal])
      case other =>
        throw new IllegalArgumentException(s"unsupported spark type: $other")
    }

  /** Write one list element through a list writer (write path; the
    * fixture writer supports scalar elements — enough for embedding
    * arrays and shingle lists). */
  private def writeListElem(
      w: org.apache.arrow.vector.complex.impl.UnionListWriter,
      dt: DataType, v: Any): Unit =
    if (v == null) throw new IllegalArgumentException(
      "arrow fixture writer: null list elements unsupported")
    else dt match {
      case LongType => w.bigInt().writeBigInt(v.asInstanceOf[Long])
      case IntegerType => w.integer().writeInt(v.asInstanceOf[Int])
      case DoubleType => w.float8().writeFloat8(v.asInstanceOf[Double])
      case FloatType => w.float4().writeFloat4(v.asInstanceOf[Float])
      case StringType => w.varChar().writeVarChar(new Text(v.asInstanceOf[String]))
      case BooleanType => w.bit().writeBit(if (v.asInstanceOf[Boolean]) 1 else 0)
      case other => throw new IllegalArgumentException(
        s"arrow fixture writer: unsupported list element type $other")
    }

  /** IPC body-buffer codec by name: the two formats real Arrow chunk
    * stores emit ("zstd", "lz4" = LZ4_FRAME). None = uncompressed. */
  private def codecType(codec: Option[String]): Option[CompressionUtil.CodecType] =
    codec.map {
      case "zstd" => CompressionUtil.CodecType.ZSTD
      case "lz4" => CompressionUtil.CodecType.LZ4_FRAME
      case other => throw new IllegalArgumentException(
        s"unsupported arrow codec '$other' (zstd | lz4)")
    }

  /** Stream rows into one Arrow IPC file, `batchSize` rows per record
    * batch — per-call memory is one batch's vectors. Shared by the
    * driver-side fixture writer and the distributed sink. */
  private def writeFile(schema: StructType, rows: Iterator[Row],
                        path: String, batchSize: Int,
                        codec: Option[String] = None): Unit = {
    val fields = schema.fields.map(f => toArrowField(f.name, f.dataType, f.nullable))
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(new ArrowSchema(fields.toSeq.asJava), alloc)
    try {
      Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
      val ch = FileChannel.open(Paths.get(path), StandardOpenOption.CREATE,
        StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
      val w = codecType(codec) match {
        case Some(ct) => new ArrowFileWriter(root, null, ch,
          null: java.util.Map[String, String], IpcOption.DEFAULT,
          CommonsCompressionFactory.INSTANCE, ct)
        case None => new ArrowFileWriter(root, null, ch)
      }
      try {
        w.start()
        writeBatches(root, w, schema, rows, batchSize)
        w.end()
      } finally { w.close(); ch.close() }
    } finally { root.close(); alloc.close() }
  }

  /** The shared row→record-batch loop behind the file and stream
    * writers — per-call memory is one `batchSize`-row batch. */
  private def writeBatches(root: VectorSchemaRoot,
                           w: org.apache.arrow.vector.ipc.ArrowWriter,
                           schema: StructType, rows: Iterator[Row],
                           batchSize: Int): Unit =
    rows.grouped(math.max(1, batchSize)).foreach { batch =>
      root.allocateNew()
      batch.zipWithIndex.foreach { case (row, i) =>
        schema.fields.zipWithIndex.foreach { case (f, j) =>
          // dense unions carry no validity buffer: a variant cell
          // must be written even when null (as a null child slot)
          if (f.dataType == VariantType)
            setVariant(root.getVector(j).asInstanceOf[DenseUnionVector],
              i, if (row.isNullAt(j)) null else row.get(j))
          else if (!row.isNullAt(j)) f.dataType match {
            case ArrayType(et, _) =>
              val lv = root.getVector(j).asInstanceOf[ListVector]
              val lw = lv.getWriter
              lw.setPosition(i)
              lw.startList()
              row.getSeq[Any](j).foreach(e => writeListElem(lw, et, e))
              lw.endList()
            case st: StructType =>
              val sv = root.getVector(j).asInstanceOf[StructVector]
              sv.setIndexDefined(i)
              val inner = row.getStruct(j)
              st.fields.zipWithIndex.foreach { case (sf, k) =>
                if (!inner.isNullAt(k))
                  setScalar(sv.getChild(sf.name), i, sf.dataType, inner.get(k))
              }
            case scalar => setScalar(root.getVector(j), i, scalar, row.get(j))
          }
        }
      }
      root.setRowCount(batch.length)
      w.writeBatch()
    }

  /** Validate that `schema` is expressible as Arrow — same check the
    * writers apply, surfaced so callers (e.g. the HTTP connector) can
    * fail fast BEFORE committing a response status. */
  def validateSchema(schema: StructType): Unit =
    schema.fields.foreach(f => toArrowField(f.name, f.dataType, f.nullable))

  /** Stream rows onto `out` in Arrow IPC STREAM format (no footer —
    * the wire format, vs the file format's seekable footer): one
    * `batchSize`-row record batch in memory at a time, so an HTTP
    * response can carry an unbounded result with bounded memory.
    * Caller owns `out`. */
  def writeIpcStream(schema: StructType, rows: Iterator[Row],
                     out: java.io.OutputStream, batchSize: Int = 4096): Unit = {
    val fields = schema.fields.map(f => toArrowField(f.name, f.dataType, f.nullable))
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(new ArrowSchema(fields.toSeq.asJava), alloc)
    try {
      val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(
        root, null, java.nio.channels.Channels.newChannel(out))
      try { w.start(); writeBatches(root, w, schema, rows, batchSize); w.end() }
      finally w.close()
    } finally { root.close(); alloc.close() }
  }

  /** Write a DataFrame to ONE Arrow IPC file via a driver-side collect —
    * a fixture/interchange utility (small results out to arrow
    * consumers); [[write]] is the distributed sink. `batchSize` splits
    * the rows into multiple record batches so tests can build
    * multi-batch files and prove streaming decode. */
  def writeOne(df: DataFrame, path: String, batchSize: Int = Int.MaxValue,
               codec: Option[String] = None): Unit =
    writeFile(df.schema, df.collect().iterator, path, batchSize, codec)

  /** DISTRIBUTED Arrow IPC sink: each non-empty partition writes its own
    * `part-NNNNN.arrow` file under `dir`, executor-side, streaming its
    * rows through `batchSize`-row record batches (per-task memory = one
    * batch). Mirrors the reference indexer sealing live chunks to the
    * object store as per-chunk Arrow files — and [[read]]'s
    * one-task-per-file parallelism on the way back. `dir` must be
    * storage every executor can reach (shared FS / object store; local
    * FS in local mode). Returns the written file paths. */
  def write(df: DataFrame, dir: String, batchSize: Int = 4096,
            codec: Option[String] = None): Seq[String] = {
    val schema = df.schema
    // fail fast on the driver for unsupported types/codec, not per-task
    schema.fields.foreach(f => toArrowField(f.name, f.dataType, f.nullable))
    codecType(codec)
    Files.createDirectories(Paths.get(dir))
    df.rdd.mapPartitionsWithIndex { case (i, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        // task-attempt-unique temp file + atomic rename: a speculative
        // or retried attempt writing the final path concurrently would
        // interleave bytes into a corrupt chunk; with rename-on-success
        // the final name only ever points at one complete file
        // (last-rename-wins), and losing attempts leave only temp junk
        val attempt = Option(TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val finalP = Paths.get(dir, f"part-$i%05d.arrow")
        val tmpP = Paths.get(dir, f".part-$i%05d.arrow.$attempt.tmp")
        writeFile(schema, rows, tmpP.toString, batchSize, codec)
        Files.move(tmpP, finalP,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        Iterator.single(finalP.toString)
      }
    }.collect().toSeq.sorted
  }
}
