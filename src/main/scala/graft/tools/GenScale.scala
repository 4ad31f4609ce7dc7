package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scale-up: replicate an sf directory `factor`×
  * with consistent key offsets — copy c's keys live at `c * STRIDE +
  * key`, so every foreign-key join (lineitem→orders→customer,
  * lineitem→part/supplier) stays consistent: the result is `factor`
  * disjoint shards of the source database, the standard way to scale a
  * bench fixture without a generator. Dimensions (nation/region) stay
  * single — they are broadcast dimensions in every plan.
  *
  * Text/embedding corpora must be DECORRELATED across copies, not just
  * de-duplicated: a replicated text is a near-duplicate of its source
  * (shared shingles), so every doc would sit in a `factor`-sized
  * near-dup group and the dedup family would bench a pathological
  * corpus (~quadratic pair blowup — measured 50× on q42 with a
  * trailing-token variant) instead of a bigger one. Copies >0 therefore
  * suffix EVERY word with the copy id (disjoint shingle sets between
  * copies, near-dup structure preserved within each copy, `n_chars`
  * recomputed) and embeddings offset `label` per copy (disjoint
  * similarity blocks) while nudging `embedding[0]` by `c/1000`.
  *
  * Usage: `runMain graft.tools.GenScale <srcDir> <outDir> [factor]`
  * (default factor 10 — sf0.1 → sf1). Deterministic: pure column maps
  * over the source, no RNG. */
object GenScale {

  private val Stride = 1000000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenScale <srcDir> <outDir> [factor]")
    val (src, out) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try generate(spark, src, out, factor)
    finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String,
               factor: Int): Unit = {
    val copies = spark.range(factor).select(col("id").as("_c"))

    def rep(df: DataFrame): DataFrame = df.crossJoin(broadcast(copies))
    def off(c: String): Column = col("_c") * Stride + col(c)

    def write(name: String, df: DataFrame): Unit = {
      // many-file layout: a scaled table must also scale its SPLIT
      // count — a single-row-group file caps every downstream scan at
      // one task regardless of cluster size (real 100 TB tables are
      // thousands of files; the fixture should have the same shape)
      val parts = math.max(spark.sparkContext.defaultParallelism, factor)
      df.drop("_c").repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      println(s"[genscale] $name: ${factor}x written ($parts files)")
    }

    def load(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // dimensions: single copy
    Seq("region", "nation").foreach(n => write(n, load(n)))

    write("customer", rep(load("customer"))
      .withColumn("c_custkey", off("c_custkey")))
    write("supplier", rep(load("supplier"))
      .withColumn("s_suppkey", off("s_suppkey")))
    write("part", rep(load("part"))
      .withColumn("p_partkey", off("p_partkey")))
    write("orders", rep(load("orders"))
      .withColumn("o_orderkey", off("o_orderkey"))
      .withColumn("o_custkey", off("o_custkey")))
    write("lineitem", rep(load("lineitem"))
      .withColumn("l_orderkey", off("l_orderkey"))
      .withColumn("l_partkey", off("l_partkey"))
      .withColumn("l_suppkey", off("l_suppkey")))

    // events: keep ts as the fixture's raw int64 nanos so Tables.load's
    // nanos decoding path applies unchanged to the generated tier
    val eventsRaw = {
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try spark.read.parquet(s"$src/events.parquet")
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    write("events", rep(eventsRaw)
      .withColumn("event_id", off("event_id"))
      .withColumn("user_id", off("user_id")))

    write("documents", rep(load("documents"))
      .withColumn("doc_id", off("doc_id"))
      .withColumn("text",
        when(col("_c") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_"), col("_c")))))
      .withColumn("n_chars", length(col("text")).cast("long")))

    write("embeddings", rep(load("embeddings"))
      .withColumn("vec_id", off("vec_id"))
      .withColumn("label",
        (col("label") + col("_c").cast("int") * 1000).cast("int"))
      .withColumn("embedding",
        transform(col("embedding"),
          (x, i) => when(i === 0 && col("_c") > 0,
            (x + col("_c").cast("float") / lit(1000.0f)).cast("float"))
            .otherwise(x))))
  }
}
