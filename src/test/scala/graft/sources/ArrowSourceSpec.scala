package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Arrow IPC round-trip: all supported types, nulls, multiple files. */
class ArrowSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("round-trip preserves all supported types and nulls") {
    val df = Seq(
      (1L, Some(10), Some(1.5), Some("a"), Some(true)),
      (2L, None, None, None, None),
      (3L, Some(-7), Some(-0.25), Some("üñïçode"), Some(false)))
      .toDF("id", "i", "d", "s", "b")
    val path = java.nio.file.Files.createTempDirectory("arrow_rt")
      .resolve("t.arrow").toString
    ArrowSource.writeOne(df, path)

    val back = ArrowSource.read(spark, Seq(path))
    assert(back.schema == df.schema)
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
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

  test("unsupported arrow type fails loudly, not silently") {
    val df = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    assertThrows[IllegalArgumentException] {
      ArrowSource.writeOne(df,
        java.nio.file.Files.createTempDirectory("arrow_bad")
          .resolve("bad.arrow").toString)
    }
  }
}
