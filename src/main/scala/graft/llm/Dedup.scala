package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora.
  *
  * Scale design: exact dedup is a hash group-by (one shuffle); near-dup
  * goes shingle → minhash signature → banded bucket join, so candidate
  * generation is an equi-join on band hashes rather than an all-pairs
  * cross join — the only shape that works at 100 TB. Verification
  * (exact Jaccard) then runs only on the candidate set.
  *
  * Hashes are md5-based Column expressions (not Scala RNG) so results
  * are deterministic and reproducible in any engine.
  */
object Dedup {

  /** Distinct word-n-gram shingles per document: (id, shingle) rows. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame = {
    val w = split(col(textCol), " ")
    val grams =
      if (n == 1) array_distinct(w)
      else array_distinct(transform(
        sequence(lit(0), size(w) - n),
        i => (0 until n).map(j => element_at(w, (i + j + 1).cast("int")))
          .reduce((a, b) => concat(a, lit(" "), b))))
    df.select(col(idCol), explode(grams).as("shingle"))
  }

  /** k-hash minhash signature per id from (id, shingle) rows: the
    * signature columns are min(md5(seed:shingle)) — one aggregation. */
  def minhashSignature(sh: DataFrame, idCol: String, k: Int = 4): DataFrame =
    sh.groupBy(col(idCol))
      .agg(
        min(md5(concat(lit("0:"), col("shingle")))).as("h0"),
        (1 until k).map(i =>
          min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i")): _*)

  /** Banded LSH candidate pairs (id_a < id_b) from signatures: docs agree
    * on all hashes of any band → candidate. Equi-join on (band, hash). */
  def minhashCandidates(sig: DataFrame, idCol: String, k: Int = 4,
                        bands: Int = 2): DataFrame = {
    val rows = k / bands
    val banded = (0 until bands).map { b =>
      val bandHash = md5(concat_ws("|",
        (0 until rows).map(r => col(s"h${b * rows + r}")): _*))
      sig.select(col(idCol).as("_id"), lit(b).as("_band"), bandHash.as("_bh"))
    }.reduce(_ union _)
    banded.as("a").join(banded.as("b"),
        col("a._band") === col("b._band") && col("a._bh") === col("b._bh") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard over candidate pairs, from (id, shingle) rows. */
  def jaccardOnCandidates(sh: DataFrame, idCol: String,
                          candidates: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("_n"))
    val inter = candidates
      .join(sh.select(col(idCol).as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("shingle").as("_s2")), "id_b")
      .filter(col("shingle") === col("_s2"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("_i"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("_n").as("_na")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("_n").as("_nb")), "id_b")
      .withColumn("jaccard",
        col("_i") * lit(1.0) / (col("_na") + col("_nb") - col("_i")))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash fingerprint (nBits ≤ 16) per id from (id, shingle) rows:
    * per-bit ±1 votes from md5-nibble bits, sign → bit. Pure aggregation,
    * one shuffle, no pairwise work. */
  def simhash(sh: DataFrame, idCol: String, nBits: Int = 16): DataFrame = {
    val hex = "0123456789abcdef"
    val nibble = (j: Int) =>
      instr(lit(hex), substring(md5(col("shingle")), j + 1, 1)) - 1
    val bitCols = (0 until nBits).map { b =>
      val v = nibble(b / 4)
      val bit = shiftright(v, b % 4) % 2
      when(sum(when(bit === 1, 1).otherwise(-1)) > 0, lit(1L << b)).otherwise(lit(0L))
    }
    sh.groupBy(col(idCol))
      .agg(bitCols.reduce(_ + _).cast("long").as("simhash"))
  }
}
