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
    // Guard documents shorter than n words: sequence(0, size-n) would be
    // DESCENDING there (crashing element_at with index 0); such docs have
    // no n-grams, matching SQL generate_series semantics.
    val grams =
      if (n == 1) array_distinct(w)
      else when(size(w) >= n,
        array_distinct(transform(
          sequence(lit(0), size(w) - n),
          i => (0 until n).map(j => element_at(w, (i + j + 1).cast("int")))
            .reduce((a, b) => concat(a, lit(" "), b)))))
        .otherwise(array().cast("array<string>"))
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

  /** Keep only shingles whose document frequency is ≤ maxDf. Ultra-common
    * shingles carry no dedup signal but make pair generation quadratic on
    * hot keys (join skew) — pruning them is the standard trick that keeps
    * shingle-join blocking linear-ish at corpus scale. */
  def rareShingles(sh: DataFrame, maxDf: Int): DataFrame = {
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDf).select("shingle")
    sh.join(dfreq, Seq("shingle"), "left_semi")
  }

  /** Per-id rarest-`k` shingle prefix (globally ordered by document
    * frequency asc, then shingle): the All-Pairs/PPJoin prefix-filtering
    * idea — near-identical sets share their globally-rarest members, so
    * joining only on the prefix turns candidate generation near-linear
    * while keeping recall high (k = ⌊(1-t)·n⌋+1 makes it exact; small
    * fixed k trades a provable bound for a much smaller join on corpora
    * with uniform shingle frequencies). */
  def rarestPrefix(sh: DataFrame, idCol: String, k: Int): DataFrame = {
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("_df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_df"), col("shingle"))
    sh.join(broadcast(dfreq), "shingle")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col(idCol), col("shingle"))
  }

  /** Exact Jaccard over candidate pairs. Verification is array-based:
    * each id's full shingle set is collected ONCE as sorted xxhash64
    * values (long arrays intersect far faster than string arrays and the
    * intersection COUNT is hash-invariant, so results are unchanged),
    * then every candidate pair does a single codegen'd `array_intersect`
    * — O(|candidates|·set size), never touching non-candidate pairs.
    * `broadcastSets` fits fixture scale; disable it when the per-id set
    * table itself is large (it then shuffles on id like any equi-join). */
  def jaccardOnCandidates(sh: DataFrame, idCol: String, candidates: DataFrame,
                          broadcastSets: Boolean = true): DataFrame = {
    val arrs0 = sh.groupBy(col(idCol))
      .agg(sort_array(array_distinct(collect_list(xxhash64(col("shingle"))))).as("_arr"))
      .withColumn("_n", size(col("_arr")))
    val arrs = if (broadcastSets) broadcast(arrs0) else arrs0
    candidates
      .join(arrs.select(col(idCol).as("id_a"), col("_arr").as("_aa"), col("_n").as("_na")), "id_a")
      .join(arrs.select(col(idCol).as("id_b"), col("_arr").as("_ab"), col("_n").as("_nb")), "id_b")
      .withColumn("_i", size(array_intersect(col("_aa"), col("_ab"))))
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
