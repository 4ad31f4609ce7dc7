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

  /** Distinct word-n-gram shingles per document: (id, shingle) rows.
    *
    * n-grams are built by `zip_with` over shifted `slice`s — O(words) per
    * document and fully codegen'd, where `transform` + `element_at` is
    * O(words·n) with a per-element array walk (measured 8× slower).
    * Documents shorter than n words yield no shingles: zip_with pads the
    * shorter (shifted) side with nulls, the null-component grams are
    * dropped after explode — matching SQL generate_series semantics. */
  def shingles(df0: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame = {
    val df = graft.util.Par.spread(df0)
    val w = split(col(textCol), " ")
    val grams = (1 until n).foldLeft(w) { (acc, j) =>
      zip_with(acc, slice(w, lit(j + 1), greatest(size(w) - j, lit(0))),
        (a, b) => when(a.isNotNull && b.isNotNull, concat(a, lit(" "), b)))
    }
    df.select(col(idCol), explode(array_distinct(grams)).as("shingle"))
      .filter(col("shingle").isNotNull)
  }

  /** Hashed shingle base: (id, _ha, _hb) with `_ha`/`_hb` the two 32-bit
    * halves of one md5 per (doc, shingle). Every downstream dedup stage —
    * k minhash functions (Kirsch–Mitzenmacher double hashing `a + i·b`),
    * document frequency, prefixes, exact-verify arrays — derives from
    * these two ints, so the expensive text processing runs ONCE and all
    * later joins/aggregations move longs, not strings. Callers should
    * `localCheckpoint()` the result when a pipeline consumes it in more
    * than one branch: Catalyst has no cross-branch subexpression reuse,
    * so an uncheckpointed base re-runs the text work per branch.
    *
    * md5 (not xxhash64) so the DuckDB oracle can replicate:
    * `CAST(concat('0x', substring(md5(s), 1, 8)) AS BIGINT)`. */
  def hashedShingles(sh: DataFrame, idCol: String): DataFrame = {
    val d = md5(col("shingle"))
    sh.select(col(idCol),
      conv(substring(d, 1, 8), 16, 10).cast("long").as("_ha"),
      conv(substring(d, 9, 8), 16, 10).cast("long").as("_hb"))
  }

  /** 63-bit combined shingle key (collision-safe set element). */
  def shingleKey: Column =
    (col("_ha") % 2147483648L) * 4294967296L + col("_hb")

  /** Mersenne prime 2^31-1: the modulus of the double-hashing family. */
  val HashPrime = 2147483647L

  /** k-hash minhash signature per id from the hashed base: column `h_i`
    * is `min((_ha + i·_hb) mod p)` — k hash functions for ONE md5 per
    * shingle (Kirsch–Mitzenmacher double hashing). The `mod p`
    * (p = 2^31-1) is LOAD-BEARING: without it `_ha + i·_hb` grows with
    * i, so for large i the minimum is always the element with the
    * smallest `_hb` — signature coordinates become correlated, recall
    * at k=128/b=32 drops ~15 points and banding loses selectivity
    * (measured by DedupSpec's seeded-corpus recall property test). */
  def minhashSignature(base: DataFrame, idCol: String, k: Int = 16): DataFrame =
    base.groupBy(col(idCol))
      .agg(min(pmod(col("_ha"), lit(HashPrime))).as("h0"),
        (1 until k).map(i =>
          min(pmod(col("_ha") + lit(i) * col("_hb"), lit(HashPrime))).as(s"h$i")): _*)

  /** Banded LSH candidate pairs (id_a < id_b) from signatures: docs agree
    * on all hashes of any band → candidate. Equi-join on (band, hash) —
    * never all-pairs. k/bands = rows per band; more bands = higher
    * recall, more rows per band = higher precision. */
  def minhashCandidates(sig: DataFrame, idCol: String, k: Int = 16,
                        bands: Int = 8): DataFrame = {
    val rows = k / bands
    // one struct-array + explode, NOT a union of `bands` projections —
    // a union would re-evaluate the signature subtree once per band
    val bandArr = array((0 until bands).map { b =>
      val bandHash = md5(concat_ws("|",
        (0 until rows).map(r => col(s"h${b * rows + r}").cast("string")): _*))
      struct(lit(b).as("_band"), bandHash.as("_bh"))
    }: _*)
    val banded = sig.select(col(idCol).as("_id"), explode(bandArr).as("_bb"))
      .select(col("_id"), col("_bb._band").as("_band"), col("_bb._bh").as("_bh"))
    banded.as("a").join(banded.as("b"),
        col("a._band") === col("b._band") && col("a._bh") === col("b._bh") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .distinct()
  }

  /** Distinct word-n-gram shingles as ONE ARRAY COLUMN per document —
    * the un-exploded twin of [[shingles]], for per-row (shuffle-free)
    * signature computation via higher-order functions. */
  def shingleArray(textCol: Column, n: Int = 2): Column = {
    val w = split(textCol, " ")
    val grams = (1 until n).foldLeft(w) { (acc, j) =>
      zip_with(acc, slice(w, lit(j + 1), greatest(size(w) - j, lit(0))),
        (a, b) => when(a.isNotNull && b.isNotNull, concat(a, lit(" "), b)))
    }
    array_compact(array_distinct(grams))
  }

  /** Per-ROW minhash signature columns over a shingle ARRAY — identical
    * values to [[minhashSignature]] (same md5 split + mod-p double
    * hashing) but computed with `transform`/`array_min`, so there is NO
    * aggregation shuffle: the signature is a pure map over each row.
    * This is the streaming-friendly form (and the batch form when the
    * doc already carries its shingle set). */
  def minhashSignatureCols(gramsCol: Column, k: Int): Seq[Column] = {
    def ha(g: Column) = conv(substring(md5(g), 1, 8), 16, 10).cast("long")
    def hb(g: Column) = conv(substring(md5(g), 9, 8), 16, 10).cast("long")
    (0 until k).map(i =>
      array_min(transform(gramsCol,
        g => pmod(ha(g) + lit(i) * hb(g), lit(HashPrime)))).as(s"h$i"))
  }

  /** Keep only shingles appearing in at most `maxFrac` of documents.
    * Ultra-common shingles carry no dedup signal but make pair generation
    * quadratic on hot keys (join skew) — df-pruning is the standard trick
    * that keeps shingle-join blocking linear-ish on Zipfian corpora. The
    * doc count is a 1-row aggregate cross-joined in (broadcast, lazy), so
    * the whole thing stays a shuffled plan with no driver action. */
  def rareShingles(base: DataFrame, idCol: String, maxFrac: Double): DataFrame = {
    val n = base.select(count_distinct(col(idCol)).as("_ndocs"))
    val keep = base.groupBy(col("_ha"), col("_hb"))
      .agg(count(lit(1)).as("_df"))
      .crossJoin(n)
      .filter(col("_df") <= col("_ndocs") * maxFrac)
      .select("_ha", "_hb")
    base.join(keep, Seq("_ha", "_hb"), "left_semi")
  }

  /** Per-id rarest-`k` shingle prefix (globally ordered by document
    * frequency asc, then key): the All-Pairs/PPJoin prefix-filtering
    * idea — near-identical sets share their globally-rarest members, so
    * joining only on the prefix turns candidate generation near-linear
    * while keeping recall high (k = ⌊(1-t)·n⌋+1 makes it exact; small
    * fixed k trades a provable bound for a much smaller join on corpora
    * with uniform shingle frequencies). The df join carries no broadcast
    * hint: the aggregated dfreq table is unbounded at corpus scale, so
    * AQE decides from its actual size. */
  def rarestPrefix(base: DataFrame, idCol: String, k: Int): DataFrame = {
    val key = shingleKey.as("_k")
    val keyed = base.select(col(idCol), key)
    val dfreq = keyed.groupBy(col("_k")).agg(count(lit(1)).as("_df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_df"), col("_k"))
    keyed.join(dfreq, "_k")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col(idCol), col("_k"))
  }

  /** Exact Jaccard over candidate pairs. Each id's full shingle set is
    * collected ONCE as a sorted long array ([[shingleKey]] — intersection
    * COUNT is hash-invariant, so results are unchanged), then every
    * candidate pair does a single codegen'd `array_intersect` —
    * O(|candidates|·set size), never touching non-candidate pairs. The
    * per-id set table shuffles on id like any equi-join (AQE broadcasts
    * it when it is actually small; no hint — at corpus scale it isn't). */
  def jaccardOnCandidates(base: DataFrame, idCol: String,
                          candidates: DataFrame): DataFrame = {
    graft.functions.SortedIntersectCount.register(base.sparkSession)
    val arrs = base.groupBy(col(idCol))
      .agg(sort_array(array_distinct(collect_list(shingleKey))).as("_arr"))
      .withColumn("_n", size(col("_arr")))
    candidates
      .join(arrs.select(col(idCol).as("id_a"), col("_arr").as("_aa"), col("_n").as("_na")), "id_a")
      .join(arrs.select(col(idCol).as("id_b"), col("_arr").as("_ab"), col("_n").as("_nb")), "id_b")
      // codegen'd single merge pass over the sorted arrays — no
      // intermediate array / hash set per pair (SortedIntersectCount)
      .withColumn("_i", expr("sorted_intersect_count(_aa, _ab)"))
      .withColumn("jaccard",
        col("_i") * lit(1.0) / (col("_na") + col("_nb") - col("_i")))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Connected components over an undirected pair graph (the dedup
    * clustering step: near-dup PAIRS → duplicate CLUSTERS → one
    * canonical doc per cluster). Iterative min-label propagation:
    * each round every node takes the min component label among itself
    * and its neighbors — O(E) shuffle work per round, rounds = graph
    * diameter (near-dup clusters are shallow), checkpointed lineage.
    * This is the scalable alternative to a transitive-closure fixpoint,
    * whose intermediate relation is O(component²). */
  def connectedComponents(edges: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 50): DataFrame = {
    val und = edges.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(edges.select(col(idB).as("src"), col(idA).as("dst")))
      .localCheckpoint()
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    val compType = labels.schema("comp").dataType
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // carry each node's previous label (_old) through the same
      // aggregation — every id has exactly one labels row, so
      // max(_old) recovers it; the convergence check ("did any label
      // change") is a boolean column counted DURING the checkpoint
      // materialization, so each round is ONE job, not
      // eager-checkpoint + filter().count()
      val nbr = und.join(labels, und("dst") === labels("id"))
        .select(und("src").as("id"), col("comp"),
          lit(null).cast(compType).as("_old"))
      val next = labels.select(col("id"), col("comp"), col("comp").as("_old"))
        .unionByName(nbr)
        .groupBy("id").agg(min("comp").as("comp"), max("_old").as("_old"))
        .withColumn("_chg", !(col("comp") <=> col("_old")))
      val (cp, nChanged) = org.apache.spark.sql.graftbridge.RddBridge
        .localCheckpointWithTrueCount(next, boolOrdinal = 3)
      changed = nChanged
      labels = cp.select("id", "comp")
      i += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents: no convergence after $maxIter rounds")
    labels
  }

  /** SimHash near-dup pairs within Hamming distance `maxDist`, found by
    * pigeonhole banding: the nBits fingerprint splits into `maxDist + 1`
    * bands — two fingerprints within maxDist must agree EXACTLY on at
    * least one band, so candidates come from a band equi-join (never
    * all-pairs) and are verified with one `bit_count(xor)`. */
  def simhashPairs(fp: DataFrame, idCol: String, nBits: Int,
                   maxDist: Int): DataFrame = {
    val bands = maxDist + 1
    val width = nBits / bands
    val bandArr = array((0 until bands).map { b =>
      val bits = shiftright(col("simhash"), b * width) % (1L << width)
      struct(lit(b).as("_band"), bits.as("_bh"))
    }: _*)
    val banded = fp.select(col(idCol).as("_id"), col("simhash"),
        explode(bandArr).as("_bb"))
      .select(col("_id"), col("simhash"),
        col("_bb._band").as("_band"), col("_bb._bh").as("_bh"))
    banded.as("a").join(banded.as("b"),
        col("a._band") === col("b._band") && col("a._bh") === col("b._bh") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("long").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** POSITIONAL word-n-gram shingles: (id, pos, shingle) rows, pos
    * 1-based — the input to windowed/rolling fingerprints where gram
    * ORDER matters (unlike the distinct-set shingles above). */
  def positionalShingles(df0: DataFrame, idCol: String, textCol: String,
                         n: Int = 2): DataFrame = {
    val df = graft.util.Par.spread(df0, force = true)
    val w = split(col(textCol), " ")
    val grams = (1 until n).foldLeft(w) { (acc, j) =>
      zip_with(acc, slice(w, lit(j + 1), greatest(size(w) - j, lit(0))),
        (a, b) => when(a.isNotNull && b.isNotNull, concat(a, lit(" "), b)))
    }
    df.select(col(idCol), posexplode(grams).as(Seq("_pos0", "shingle")))
      .filter(col("shingle").isNotNull)
      .select(col(idCol), (col("_pos0") + 1).as("pos"), col("shingle"))
  }

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken): hash every
    * positional shingle (the rolling-hash step — one md5-derived int per
    * gram), then keep the MIN hash of each sliding window of `w`
    * consecutive grams; the distinct survivors are the document's
    * fingerprint set. Guarantees any shared run of w+n-1 words between
    * two documents shares a fingerprint — the standard plagiarism/
    * near-dup sketch with provable recall, unlike bag-of-words md5.
    * One window over (id, pos) — single shuffle on id. */
  def winnowing(df: DataFrame, idCol: String, textCol: String,
                n: Int = 2, w: Int = 4): DataFrame = {
    val pos = positionalShingles(df, idCol, textCol, n)
      .withColumn("_h", conv(substring(md5(col("shingle")), 1, 8), 16, 10)
        .cast("long"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    pos
      .withColumn("_wmin", min(col("_h")).over(win))
      .withColumn("_wn", count(lit(1)).over(win))
      .filter(col("_wn") === w) // only full windows fingerprint
      .select(col(idCol), col("_wmin").as("fp"))
      .distinct()
  }

  /** Exact substring duplicate spans — the suffix-array dedup family
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better") re-expressed for a distributed engine: every
    * maximal token interval covered by k-token windows that occur at
    * ≥ 2 positions anywhere in the corpus (other documents OR the same
    * document). A suffix array finds duplicates of ANY length; fixing
    * the window at k detects exactly the spans of length ≥ k — the
    * practical use (Lee et al. use 50 BPE tokens) — at O(tokens) work
    * and no giant global sort.
    *
    * Scale shape: tokenize → positional k-gram windows (zip_with chain,
    * codegen'd, one row per window start) → window-content frequency
    * (ONE shuffle on the gram; partial aggregation combines map-side,
    * so a mega-duplicated gram ships one (gram, count) row per
    * partition, not its occurrence list — skew-safe) → left-semi join
    * duplicated grams back (AQE broadcasts the duplicated set when
    * small — it is sublinear in corpus size for natural text; an
    * ordinary equi-join otherwise) → per-document merge of overlapping
    * window coverage into maximal spans (window over (id, pos) —
    * partitioned by document, never global).
    *
    * Two window starts p < q produce contiguous coverage iff q ≤ p + k,
    * so islands break where the start gap exceeds k (lag + running sum
    * of break flags — gap-and-islands with variable gap). Output:
    * (id, span_start, span_len, n_windows), span_start 1-based,
    * span_len ≥ k. Documents shorter than k tokens yield no windows
    * and no spans. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, "duplicateSpans: k must be >= 1")
    // frequency + semi-join move an 8-byte hash of the gram, not the
    // k-token gram string itself — the hash is INTERNAL (the output is
    // (id, pos) spans; the oracle recomputes duplication on strings),
    // so the cheap codegen'd xxhash64 applies rather than the md5 path
    // the oracle-replayed hashes need. Same 64-bit collision-safety
    // trade as every hashed dedup path in this file. Measured at
    // sf0.1: parity with shuffling the strings (shuffle bytes aren't
    // the bottleneck at that size) and ~1 s faster than an md5+conv
    // key (string hex parsing bill); kept because the ~5×-narrower
    // shuffle is what matters when the gram stream is TBs.
    val grams = positionalShingles(df, idCol, textCol, k)
      .select(col(idCol), col("pos"), xxhash64(col("shingle")).as("_k"))
    val dup = grams.groupBy(col("_k"))
      .agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= 2)
      .select(col("_k"))
    val marked = grams.join(dup, Seq("_k"), "left_semi")
      .select(col(idCol), col("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val runW = w.rowsBetween(Long.MinValue, 0)
    marked
      .withColumn("_brk",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") - lag(col("pos"), 1).over(w) > k, 1).otherwise(0))
      .withColumn("_grp", sum(col("_brk")).over(runW))
      .groupBy(col(idCol), col("_grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + k - 1).as("_span_end"),
        count(lit(1)).cast("long").as("n_windows"))
      .select(col(idCol),
        col("span_start").cast("long").as("span_start"),
        (col("_span_end") - col("span_start") + 1).cast("long").as("span_len"),
        col("n_windows"))
  }

  /** Remove every duplicated span found by [[duplicateSpans]] from the
    * corpus — the aggressive variant of Lee et al.'s dedup (ALL
    * occurrences go, no canonical survivor; the conservative
    * keep-one-occurrence variant needs a global canonical-occurrence
    * choice that serves no training-data purpose the MinHash document
    * path doesn't already cover). Returns one row per input document:
    * (id, clean_text, n_removed) — documents without duplicated spans
    * keep their text verbatim (byte-identical, including any run of
    * separator spaces), fully-duplicated documents come back with
    * clean_text = '' so downstream length filters can drop them.
    *
    * Scale shape: cost of [[duplicateSpans]] + one per-id equi-join of
    * the (small) span lists against the corpus + a codegen'd
    * index-lambda filter over each token array — no extra shuffle over
    * the token stream, no re-tokenization join. */
  def scrubDuplicateSpans(df0: DataFrame, idCol: String, textCol: String,
                          k: Int): DataFrame = {
    val df = graft.util.Par.spread(df0, force = true)
    val spans = duplicateSpans(df, idCol, textCol, k)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_len")))
        .as("_spans"))
    df.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        when(col("_spans").isNull, col(textCol)).otherwise(
          array_join(filter(split(col(textCol), " "), (_, i) =>
            !exists(col("_spans"), s =>
              i + 1 >= s("span_start") &&
                i + 1 <= s("span_start") + s("span_len") - 1)), " "))
          .as("clean_text"),
        when(col("_spans").isNull, 0L).otherwise(
          aggregate(col("_spans"), lit(0L), (acc, s) =>
            acc + s("span_len").cast("long"))).as("n_removed"))
  }

  /** SimHash fingerprint (nBits ≤ 63) per id from (id, shingle) rows:
    * per-bit ±1 votes from md5-nibble bits, sign → bit. Pure aggregation,
    * one shuffle, no pairwise work. Use ≥48 bits when the fingerprint
    * feeds [[simhashPairs]] — banding needs wide bands for selective
    * blocking (a 4-bit band has 16 values: every bucket is hot). */
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
