package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimension file pruning.
  *
  * Range-clustering a table on ONE column gives parquet files tight
  * min/max stats on that column and useless stats on every other; a
  * selective predicate on the second dimension then admits every file.
  * Interleaving the bits of several normalized dimensions into one sort
  * key makes each written file cover a small HYPER-RECTANGLE of the
  * value space, so min/max footer stats prune files for predicates on
  * ANY of the clustered dimensions — the standard layout trick for
  * multi-tenant scan tables (Delta/Iceberg `ZORDER BY`).
  *
  * Shape: one 1-row min/max aggregate (broadcast back), one range
  * shuffle on the interleaved key, an in-task sort — all linear, no
  * driver data. The z-value is a pure Column expression (codegen'd
  * shift/mask terms), exact for any numeric/date/timestamp input.
  */
object ZOrder {

  /** A monotonic NUMERIC view of column `c` for quantization. Plain
    * `cast("double")` covers numerics/booleans/timestamptz, but Spark
    * 4 rejects DATE and TIMESTAMP_NTZ → DOUBLE outright (they'd make
    * every z-ordered write throw at analysis); map those through their
    * epoch integer first. NTZ goes via the session-zone instant —
    * exact under the default UTC session and, in a DST-shifted
    * session, at worst duplicates ranks inside the overlap hour, which
    * only loosens file stats (z-order is a layout, never a result). */
  private def zNumeric(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    // match the session's resolution semantics (case-insensitive by
    // default) — a 'SHIP_DATE' spelling for a DATE column must still
    // take the DateType branch, or the double cast below throws.
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    df.schema.fields.find(f => resolver(f.name, c)).map(_.dataType) match {
      case Some(DateType) => unix_date(col(c)).cast("double")
      case Some(TimestampNTZType) =>
        unix_micros(col(c).cast(TimestampType)).cast("double")
      case _ => col(c).cast("double")
    }
  }

  /** Bit-interleaved z-value over the pre-normalized `_zv_<c>` value
    * columns, each min/max-normalized to `bits` bits using the
    * ALREADY-JOINED `_zmn_<c>`/`_zmx_<c>` bounds columns. k·bits must
    * fit a long. */
  private def zExpr(cols: Seq[String], bits: Int): Column = {
    val k = cols.size
    val maxQ = (1L << bits) - 1
    val quantized = cols.map { c =>
      val mn = col(s"_zmn_$c")
      val mx = col(s"_zmx_$c")
      val span = mx - mn
      val v = col(s"_zv_$c")
      val q = when(span <= 0.0 || v.isNull, lit(0L))
        .otherwise(least(lit(maxQ),
          floor((v - mn) / span * maxQ).cast("long")))
      q
    }
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      quantized.zipWithIndex.foldLeft(acc) { case (a, (q, i)) =>
        a + shiftleft(shiftright(q, b) bitwiseAND lit(1L), b * k + i)
      }
    }
  }

  /** `df` + a `_z` column holding the bit-interleaved z-value of `cols`
    * (bounds joined in and dropped) — for callers that need to compose
    * the z-key with their own partitioning (e.g. a storage layout that
    * must also range-partition on a date column). */
  def withZ(df: DataFrame, cols: Seq[String], bits: Int = 12): DataFrame = {
    require(cols.size >= 2, "z-order needs at least two dimensions")
    require(cols.size * bits <= 62, s"${cols.size} dims x $bits bits overflow")
    val valued = cols.foldLeft(df)((d, c) =>
      d.withColumn(s"_zv_$c", zNumeric(df, c)))
    val aggs = cols.flatMap(c => Seq(
      min(col(s"_zv_$c")).as(s"_zmn_$c"),
      max(col(s"_zv_$c")).as(s"_zmx_$c")))
    val bounds = valued.agg(aggs.head, aggs.tail: _*)
    valued.crossJoin(broadcast(bounds))
      .withColumn("_z", zExpr(cols, bits))
      .drop(cols.flatMap(c =>
        Seq(s"_zv_$c", s"_zmn_$c", s"_zmx_$c")): _*)
  }

  /** Cluster `df` into `nFiles` z-ordered range partitions on `cols`
    * (each written file then covers a tile of the value space). The
    * result is ready to `.write.parquet(...)`: same rows, same schema,
    * z-curve order. */
  def cluster(df: DataFrame, cols: Seq[String], nFiles: Int,
              bits: Int = 12): DataFrame =
    withZ(df, cols, bits)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
}
