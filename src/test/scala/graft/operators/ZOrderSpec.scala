package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.bitemporal.ChunkMetadata

/** Z-order clustering must (a) preserve content exactly and (b) give
  * file-level min/max pruning on EVERY clustered dimension, where
  * linear clustering prunes only its own sort column — asserted from
  * the real parquet footers via the chunk-metadata relation. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a perfect 256x256 grid: the adversarial case for linear layout
  // (every x-range file spans ALL of y) and the ideal one to show what
  // the z-curve buys
  private def grid = spark.range(65536)
    .select(($"id" % 256).as("x"), ($"id" / 256).cast("long").as("y"))

  /** Fraction of files whose [min,max] on `column` admits `v`. */
  private def admitFrac(dir: String, column: String, v: Long): Double = {
    val meta = ChunkMetadata.forPaths(spark, Seq(dir))
      .filter(col("column") === column)
      .groupBy(col("file"))
      .agg(min(col("min").cast("long")).as("mn"),
        max(col("max").cast("long")).as("mx"))
    val total = meta.count().toDouble
    val admit = meta.filter(col("mn") <= v && col("mx") >= v).count().toDouble
    admit / total
  }

  test("z-order prunes on both dimensions; linear only on its own") {
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    val ldir = java.nio.file.Files.createTempDirectory("linear").toString
    ZOrder.cluster(grid, Seq("x", "y"), nFiles = 16)
      .write.mode("overwrite").parquet(zdir)
    grid.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(ldir)

    // content parity: clustering is a pure reordering
    assert(spark.read.parquet(zdir).count() == 65536)
    assert(spark.read.parquet(zdir)
      .agg(sum($"x" * 100000 + $"y")).head.getLong(0) ==
      grid.agg(sum($"x" * 100000 + $"y")).head.getLong(0))

    // linear: x prunes hard, y admits every file
    assert(admitFrac(ldir, "x", 7) <= 0.2, "linear must prune its sort column")
    assert(admitFrac(ldir, "y", 7) == 1.0, "linear cannot prune the 2nd dim")
    // z-order: BOTH dims prune to tiles (16 files ~ 4x4 tiling -> ~25%)
    val zx = admitFrac(zdir, "x", 7)
    val zy = admitFrac(zdir, "y", 7)
    assert(zx <= 0.4, s"z-order x pruning too weak: $zx")
    assert(zy <= 0.4, s"z-order y pruning too weak: $zy")
  }

  test("date and timestamp_ntz dimensions z-order without AnalysisException") {
    // Spark 4 rejects DATE/TIMESTAMP_NTZ → DOUBLE casts, so the
    // quantizer must route them through their epoch integers — before
    // the fix, ANY clusterBy containing a date column made every
    // compact() throw instead of laying out files
    val df = spark.range(512).select(
      date_add(lit(java.sql.Date.valueOf("2020-01-01")),
        ($"id" % 64).cast("int")).as("d"),
      to_timestamp_ntz(
        concat(lit("2021-01-01 00:"),
          lpad(($"id" % 60).cast("string"), 2, "0"), lit(":00"))).as("tn"),
      $"id".as("v"))
    val out = ZOrder.cluster(df, Seq("d", "tn"), nFiles = 4)
    assert(out.count() == 512)
    assert(out.columns.toSeq == Seq("d", "tn", "v"))
    // pruning materializes: a written file set carries tight date stats
    val dir = java.nio.file.Files.createTempDirectory("zdate").toString
    out.write.mode("overwrite").parquet(dir)
    val meta = ChunkMetadata.forPaths(spark, Seq(dir))
      .filter(col("column") === "d")
      .groupBy(col("file"))
      .agg(min(col("min")).as("mn"), max(col("max")).as("mx"))
    assert(meta.count() >= 2, "expected multiple files with date stats")
  }

  test("dimension names resolve case-insensitively like the session does") {
    // Spark resolves 'SHIP_DATE' to a column named 'ship_date' under
    // the default caseSensitive=false; the quantizer's type lookup must
    // use the same resolver, or the DATE column misses its epoch-int
    // branch and the double cast throws in Spark 4
    val df = spark.range(64).select(
      date_add(lit(java.sql.Date.valueOf("2020-01-01")),
        ($"id" % 16).cast("int")).as("ship_date"),
      ($"id" % 8).as("qty"))
    val out = ZOrder.cluster(df, Seq("SHIP_DATE", "QTY"), nFiles = 2)
    assert(out.count() == 64)
  }

  test("skewed + null values stay exact and clamp into range") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 5L), (2L, null), (1000000L, 5L), (null, 7L), (3L, 9L))
      .toDF("x", "y")
    val out = ZOrder.cluster(df, Seq("x", "y"), nFiles = 2).collect()
    assert(out.length == 5)
    // exact multiset of rows survives, nulls included
    assert(out.map(r => (Option(r.get(0)), Option(r.get(1)))).toSet ==
      Set((Some(1L), Some(5L)), (Some(2L), None), (Some(1000000L), Some(5L)),
        (None, Some(7L)), (Some(3L), Some(9L))))
  }
}
