package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Arrow IPC round-trip: full chunk-type coverage (SURVEY §1.3), nulls,
  * multiple files, and a streaming-decode proof (per-batch laziness). */
class ArrowSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String, name: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve(name).toString

  test("round-trip preserves primitive types and nulls") {
    val df = Seq(
      (1L, Some(10), Some(1.5), Some("a"), Some(true)),
      (2L, None, None, None, None),
      (3L, Some(-7), Some(-0.25), Some("üñïçode"), Some(false)))
      .toDF("id", "i", "d", "s", "b")
    val path = tmp("arrow_rt", "t.arrow")
    ArrowSource.writeOne(df, path)

    val back = ArrowSource.read(spark, Seq(path))
    assert(back.schema == df.schema)
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("round-trip preserves date, timestamp (tz + ntz), decimal, binary") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("tsntz", TimestampNTZType),
      StructField("dec", DecimalType(12, 3)),
      StructField("bin", BinaryType)))
    val rows = Seq(
      Row(1L, java.sql.Date.valueOf("2024-02-29"),
        java.sql.Timestamp.valueOf("2024-02-29 12:34:56.123456"),
        java.time.LocalDateTime.parse("1999-12-31T23:59:59.999999"),
        new java.math.BigDecimal("12345.678"),
        Array[Byte](1, 2, -3)),
      Row(2L, null, null, null, null, null),
      Row(3L, java.sql.Date.valueOf("1969-07-20"),
        java.sql.Timestamp.valueOf("1969-07-20 20:17:40.0"),
        java.time.LocalDateTime.parse("1969-07-20T20:17:40"),
        new java.math.BigDecimal("-0.001"),
        Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val path = tmp("arrow_temporal", "t.arrow")
    ArrowSource.writeOne(df, path)

    val back = ArrowSource.read(spark, Seq(path))
    assert(back.schema == df.schema)
    val got = back.orderBy("id").collect()
    val want = df.orderBy("id").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      (0 until 5).foreach(j => assert(g.get(j) == w.get(j), s"col $j"))
      // Array[Byte] equality is reference-based; compare contents
      assert(java.util.Arrays.equals(
        Option(g.getAs[Array[Byte]](5)).getOrElse(Array.empty),
        Option(w.getAs[Array[Byte]](5)).getOrElse(Array.empty)))
    }
  }

  test("round-trip preserves list and struct columns (nested recursion)") {
    val df = Seq(
      (1L, Seq(1.0, 2.5, -3.0), Some(("x", 10L))),
      (2L, Seq.empty[Double], None),
      (3L, Seq(0.0), Some(("y", -1L))))
      .toDF("id", "emb", "meta")
    val path = tmp("arrow_nested", "t.arrow")
    ArrowSource.writeOne(df, path)

    val back = ArrowSource.read(spark, Seq(path))
    assert(back.schema("emb").dataType ==
      ArrayType(DoubleType, containsNull = false))
    assert(back.schema("meta").dataType.isInstanceOf[StructType])
    val got = back.orderBy("id").collect()
    assert(got(0).getSeq[Double](1) == Seq(1.0, 2.5, -3.0))
    assert(got(0).getStruct(2) == Row("x", 10L))
    assert(got(1).getSeq[Double](1) == Seq.empty)
    assert(got(1).isNullAt(2))
    assert(got(2).getStruct(2) == Row("y", -1L))
  }

  test("multiple files read as one relation, one task per file") {
    val dir = java.nio.file.Files.createTempDirectory("arrow_multi")
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((3L, "z")).toDF("id", "v")
    ArrowSource.writeOne(a, dir.resolve("a.arrow").toString)
    ArrowSource.writeOne(b, dir.resolve("b.arrow").toString)
    val back = ArrowSource.read(spark,
      Seq(dir.resolve("a.arrow").toString, dir.resolve("b.arrow").toString))
    assert(back.rdd.getNumPartitions == 2)
    assert(back.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("decode is streaming: reading 3 rows of a 5-batch file loads 2 batches") {
    val df = (1L to 10L).map(i => (i, s"row$i")).toDF("id", "v")
    val path = tmp("arrow_stream", "t.arrow")
    ArrowSource.writeOne(df, path, batchSize = 2) // 5 record batches

    val it = new ArrowSource.ArrowFileIterator(path)
    try {
      val first3 = it.take(3).toList.map(_.getLong(0))
      assert(first3 == List(1L, 2L, 3L))
      assert(it.batchesLoaded == 2,
        s"expected lazy per-batch decode, loaded ${it.batchesLoaded}")
    } finally it.close()

    // and the full read over the multi-batch file is still correct
    val back = ArrowSource.read(spark, Seq(path))
    assert(back.orderBy("id").collect().map(_.getLong(0)).toSeq == (1L to 10L))
  }

  test("read is a columnar DSv2 scan with column pruning pushed down") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = (1L to 100L).map(i => (i, s"v$i", i * 0.5)).toDF("id", "v", "x")
    val path = tmp("arrow_v2", "t.arrow")
    ArrowSource.writeOne(df, path, batchSize = 40)

    val pruned = ArrowSource.read(spark, Seq(path)).select("id")
    val plan = pruned.queryExecution.executedPlan
    // the scan is the v2 columnar batch scan, rows come out of the
    // codegen'd ColumnarToRow, and only the requested column is read
    val scans = plan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, s"expected BatchScanExec, got:\n$plan")
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("id"),
      s"column pruning not pushed: ${scans.head.scan.readSchema()}")
    assert(plan.toString.contains("ColumnarToRow"), plan.toString)
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == (1L to 100L))

    // full-width read through the columnar path agrees with the source
    val back = ArrowSource.read(spark, Seq(path))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("distributed sink: one file per non-empty partition, exact round-trip") {
    val df = (1L to 1000L).map(i => (i, s"doc$i", i * 0.25)).toDF("id", "t", "x")
      .repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("arrow_sink").toString
    val paths = ArrowSource.write(df, dir, batchSize = 100)
    assert(paths.size == 4, s"expected 4 part files, got $paths")
    assert(paths.forall(_.endsWith(".arrow")))
    val back = ArrowSource.read(spark, paths)
    assert(back.rdd.getNumPartitions == 4) // one read task per part file
    assert(back.schema == df.schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    // empty partitions produce no file
    val sparse = (1L to 3L).map(i => (i, "v")).toDF("id", "v").repartition(8)
    val dir2 = java.nio.file.Files.createTempDirectory("arrow_sparse").toString
    val paths2 = ArrowSource.write(sparse, dir2)
    assert(paths2.size <= 3 && paths2.nonEmpty)
  }

  test("unsupported arrow type fails loudly, not silently") {
    val df = Seq((1L, Map("k" -> 1))).toDF("id", "m")
    assertThrows[IllegalArgumentException] {
      ArrowSource.writeOne(df, tmp("arrow_bad", "bad.arrow"))
    }
  }

  test("Variant columns round-trip through a dense union (write AND read)") {
    import org.apache.spark.sql.functions._
    // one column, four runtime types + variant-null + SQL null
    val df = Seq(
      (1L, "42"), (2L, "\"hi \\u00f6\""), (3L, "2.5"), (4L, "true"),
      (5L, "null"), (6L, null))
      .toDF("id", "j")
      .select($"id", when($"j".isNotNull, parse_json($"j")).as("v"))
    val path = tmp("arrow_variant", "v.arrow")
    ArrowSource.writeOne(df, path, codec = Some("zstd"))

    val back = ArrowSource.read(spark, Seq(path))
    assert(back.schema("v").dataType == VariantType)
    val got = back.select($"id",
        expr("schema_of_variant(v)").as("t"),
        try_variant_get($"v", "$", "long").as("l"),
        variant_get($"v", "$", "string").as("s"))
      .orderBy("id").collect()
    // variant-null and SQL null both land as a null union slot (dense
    // unions have no second null notion), so both read back as SQL null
    assert(got.map(_.getString(1)).toSeq ==
      Seq("BIGINT", "STRING", "DOUBLE", "BOOLEAN", null, null))
    assert(Option(got(0).get(2)).contains(42L))
    assert(got(1).getString(3) == "hi ö")
    assert(got(2).getString(3) == "2.5")
    assert(got(3).getString(3) == "true")
    assert(got(4).isNullAt(3) && got(5).isNullAt(3))

    // distributed sink handles variants too (driver-side type check ok)
    val dir = java.nio.file.Files.createTempDirectory("arrow_variant_d").toString
    val paths = ArrowSource.write(df.repartition(2), dir)
    assert(paths.nonEmpty)
    assert(ArrowSource.read(spark, paths).count() == 6)
  }

  test("zstd and lz4 compressed record batches round-trip exactly") {
    val df = (1L to 500L).map(i => (i, "text " * 20 + i, i * 0.5))
      .toDF("id", "s", "d")
    for (codec <- Seq("zstd", "lz4")) {
      val path = tmp(s"arrow_$codec", s"t_$codec.arrow")
      ArrowSource.writeOne(df, path, batchSize = 128, codec = Some(codec))
      val back = ArrowSource.read(spark, Seq(path))
      assert(back.orderBy("id").collect().toSeq ==
        df.orderBy("id").collect().toSeq, s"codec $codec")
      // compression must actually bite on this repetitive text
      val plain = tmp("arrow_plain", "t_plain.arrow")
      ArrowSource.writeOne(df, plain, batchSize = 128)
      assert(new java.io.File(path).length < new java.io.File(plain).length,
        s"$codec file not smaller than uncompressed")
    }
  }

  test("hetero chunk: dense union reads as Variant, uuid/uri as strings, " +
      "dictionary utf8 decodes") {
    import ArrowFixtures.HeteroRow
    def uuidOf(i: Long) = new java.util.UUID(i, i * 31 + 7)
    val rows = Seq(
      HeteroRow(1L, 42L, null, uuidOf(1), "s3://bucket/a", "news"),
      HeteroRow(2L, null, "hello \"w\"", uuidOf(2), "s3://bucket/b", "web"),
      HeteroRow(3L, -7L, null, uuidOf(3), "s3://bucket/c", "news"),
      HeteroRow(4L, null, "wörld", uuidOf(4), "s3://bucket/d", "web"))
    val path = tmp("arrow_hetero", "hetero.arrow")
    ArrowFixtures.writeHeteroChunk(rows, path, codec = Some("zstd"))

    val back = ArrowSource.read(spark, Seq(path))
    assert(back.schema("v").dataType == VariantType)
    assert(back.schema("doc_uuid").dataType == StringType)
    assert(back.schema("src_uri").dataType == StringType)
    assert(back.schema("tag").dataType == StringType)

    import org.apache.spark.sql.functions._
    val got = back.select($"id",
        try_variant_get($"v", "$", "long").as("v_long"),
        variant_get($"v", "$", "string").as("v_str"),
        expr("schema_of_variant(v)").as("v_type"),
        $"doc_uuid", $"src_uri", $"tag")
      .orderBy("id").collect()
    assert(got.map(r => Option(r.get(1))).toSeq ==
      Seq(Some(42L), None, Some(-7L), None))
    assert(got.map(_.getString(2)).toSeq ==
      Seq("42", "hello \"w\"", "-7", "wörld"))
    assert(got.map(_.getString(3)).toSeq ==
      Seq("BIGINT", "STRING", "BIGINT", "STRING"))
    assert(got.map(_.getString(4)).toSeq == rows.map(_.uuid.toString))
    assert(got.map(_.getString(5)).toSeq == rows.map(_.uri))
    assert(got.map(_.getString(6)).toSeq == Seq("news", "web", "news", "web"))
  }
}
