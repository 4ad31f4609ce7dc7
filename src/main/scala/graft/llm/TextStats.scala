package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators: language ID, quality scoring, token counting,
  * document fingerprinting. All pure Column expressions (codegen'd,
  * shuffle only where an aggregation is inherent).
  */
object TextStats {

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deterministic and oracle-expressible (IN lists). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  /** (id, word) rows. */
  def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.util.Par.spread(df)
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))

  /** Stopword-vote language ID per id; ties resolve en > es > de. */
  def languageId(toks: DataFrame, idCol: String): DataFrame = {
    def score(lang: String): Column =
      sum(when(col("word").isInCollection(stopwords(lang)), 1).otherwise(0))
    toks.groupBy(col(idCol))
      .agg(score("en").as("s_en"), score("es").as("s_es"), score("de").as("s_de"))
      .withColumn("pred_lang",
        when(col("s_en") >= greatest(col("s_es"), col("s_de")), "en")
          .when(col("s_es") >= col("s_de"), "es").otherwise("de"))
  }

  /** Whitespace and regex ("BPE-ish" [a-z]+|[0-9]+ pieces) token counts. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+"), lit(0)))
        .cast("long").as("n_re_tokens"))

  /** Canonical content fingerprint: md5 of the sorted distinct token set —
    * an order-insensitive rolling-hash analog for near-identical docs. */
  def fingerprint(textCol: Column): Column =
    md5(array_join(array_sort(array_distinct(split(textCol, " "))), " "))

  /** Unigram-LM cross-entropy + perplexity per document — the CCNet-
    * style "how surprising is this text under a corpus LM" quality
    * signal used to bucket training data (head/middle/tail). The LM is
    * trained on the corpus itself in the same job: global add-one-
    * smoothed word probabilities p(w) = (c(w)+1)/(N+V), per-doc score
    * −Σ tf(w)·ln p(w) / len(doc), perplexity = exp of that.
    *
    * Scale shape: one shuffle for the vocab count, one equi-join of
    * per-doc tf rows against the vocab (AQE broadcasts small vocabs;
    * shuffles on `word` otherwise — vocab is sublinear in corpus size),
    * one shuffle for the per-doc aggregate; corpus N/V ride along as a
    * broadcast 1-row frame. Per-doc summation runs over the word-sorted
    * list so float results are bit-identical in any engine. */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(df, idCol, textCol)
    val counts = toks.groupBy(col("word"))
      .agg(count(lit(1)).cast("double").as("_c"))
    val stats = counts.agg(sum(col("_c")).as("_n"),
      count(lit(1)).cast("double").as("_v"))
    val tf = toks.groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    tf.join(counts, "word")
      .crossJoin(broadcast(stats))
      .withColumn("_b",
        -log((col("_c") + 1.0) / (col("_n") + col("_v"))) * col("_tf"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("word"), col("_b")))).as("_ws"),
        sum(col("_tf")).as("_ntok"))
      .withColumn("_sum",
        aggregate(col("_ws"), lit(0.0), (acc, x) => acc + x.getField("_b")))
      .withColumn("cross_entropy", col("_sum") / col("_ntok"))
      .withColumn("ppl", exp(col("cross_entropy")))
      .select(col(idCol), col("_ntok").cast("long").as("n_tokens"),
        col("cross_entropy"), col("ppl"))
  }

  /** Gopher/MassiveText-style REPETITION quality signals per document —
    * the boilerplate filters applied before LLM training:
    *   `top2_frac`  mass fraction of the most frequent word 2-gram,
    *   `dup5_frac`  fraction of 5-gram occurrences that are repeats.
    * Word-based (the fixture corpus has no line structure); each order
    * is one explode + one shuffle on the id — no pairwise work. Docs
    * too short for an order yield NULL for that signal (left joins). */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_words"))
    val top2 = Dedup.positionalShingles(df, idCol, textCol, n = 2)
      .groupBy(col(idCol), col("shingle")).agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol))
      .agg((max(col("_c")) * lit(1.0) / sum(col("_c"))).as("top2_frac"))
    val dup5 = Dedup.positionalShingles(df, idCol, textCol, n = 5)
      .groupBy(col(idCol))
      .agg((lit(1.0) - count_distinct(col("shingle")) * lit(1.0) / count(lit(1)))
        .as("dup5_frac"))
    base.join(top2, Seq(idCol), "left").join(dup5, Seq(idCol), "left")
  }

  /** BM25 relevance (Robertson–Spärck Jones; Lucene's +1 idf variant)
    * of each document against a literal term set:
    *   Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    *   idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
    * Docs matching no term are omitted. Per-doc term scores fold in
    * TERM ORDER (sorted struct collect) so the floating-point sum is
    * deterministic and cross-engine exact. Shape: one token explode,
    * keyed aggregations, df/corpus stats broadcast — no pairwise work;
    * at 100 TB this is the standard two-pass sparse scorer. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty)
    val toks = tokens(df, idCol, textCol)
    val dl = toks.groupBy(col(idCol))
      .agg(count(lit(1)).cast("double").as("_dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("_n"),
      avg(col("_dl")).as("_avgdl"))
    val tf = toks.filter(col("word").isInCollection(terms))
      .groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    val dfreq = tf.groupBy(col("word"))
      .agg(count(lit(1)).cast("double").as("_df"))
    tf.join(broadcast(dfreq), "word")
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("_idf",
        log((col("_n") - col("_df") + 0.5) / (col("_df") + 0.5) + 1.0))
      .withColumn("_s", col("_idf") * col("_tf") * (lit(k1) + 1.0) /
        (col("_tf") + lit(k1) *
          (lit(1.0) - lit(b) + lit(b) * col("_dl") / col("_avgdl"))))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("word"), col("_s")))).as("_ws"))
      .withColumn("bm25",
        aggregate(col("_ws"), lit(0.0), (acc, x) => acc + x.getField("_s")))
      .select(col(idCol), col("bm25"))
  }

  /** Linear text-classifier inference — the fastText-quality-filter
    * shape every web-scale pipeline runs (GPT-3/LLaMA/RefinedWeb style:
    * a linear model over token features scores each document, the score
    * gates inclusion). The model is an explicit `(term, weight)`
    * relation — trained anywhere, loaded here — plus a bias; the score
    * is sigmoid(bias + Σ tf(term)·weight / doc-length), i.e. logistic
    * regression over mean term features.
    *
    * Scale: tokens join a BROADCAST weight table (vocabularies of
    * interest are small next to a corpus), per-doc sums are map-side
    * combined, and the matched-term fold runs in sorted term order so
    * the double summation is deterministic and cross-engine exact (the
    * q112 BM25 pattern). Docs with no matched term score
    * sigmoid(bias). */
  def linearScore(df: DataFrame, idCol: String, textCol: String,
                  weights: DataFrame, bias: Double): DataFrame = {
    require(Seq("term", "weight").forall(weights.columns.contains),
      "weights must have (term, weight) columns")
    val toks = tokens(df, idCol, textCol)
    val dl = toks.groupBy(col(idCol))
      .agg(count(lit(1)).cast("double").as("_dl"))
    val contrib = toks
      .join(broadcast(weights), col("word") === col("term"))
      .groupBy(col(idCol), col("term"))
      .agg((count(lit(1)).cast("double") * first(col("weight"))).as("_c"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("term"), col("_c")))).as("_cs"))
      .withColumn("_num",
        aggregate(col("_cs"), lit(0.0), (acc, x) => acc + x.getField("_c")))
      .select(col(idCol), col("_num"))
    dl.join(contrib, Seq(idCol), "left")
      .withColumn("_logit",
        lit(bias) + coalesce(col("_num"), lit(0.0)) / col("_dl"))
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("_logit"))))
      .select(col(idCol), col("score"))
  }

  /** GPT-style sequence packing metadata: documents are concatenated in
    * id order WITHIN A SHARD and chunked into training sequences of
    * `budget` tokens; each doc gets its shard-local start offset and the
    * sequence id its first token lands in. Deterministic (id-ordered),
    * and the window partitions by SHARD — there is deliberately no
    * global-order variant, because a single global cumulative sum is a
    * one-partition window that cannot scale; shards are the independent
    * writer units at 100 TB (exactly how training-data pipelines shard
    * their tokenizer output). Token count = whitespace tokens (swap in
    * any tokenizer count column upstream). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    shardCol: Column, budget: Int): DataFrame = {
    require(budget > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(idCol), shardCol.as("shard"),
        size(split(col(textCol), " ")).cast("long").as("n_tok"))
      .withColumn("start_off", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("seq_id", (col("start_off") / budget).cast("long"))
  }

  /** Overlapping document chunking — the context-window splitter every
    * embedding/RAG/training pipeline runs before vectorizing: each doc
    * becomes ⌈(n_tok − overlap) / stride⌉ chunks of up to `chunkTokens`
    * whitespace tokens, consecutive chunks sharing `overlap` tokens
    * (stride = chunkTokens − overlap). Pure per-row map + explode: no
    * shuffle, no state, embarrassingly parallel at any scale. Chunk
    * ids and boundaries are derived, not generated — deterministic and
    * oracle-replayable. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got $overlap / $chunkTokens")
    val stride = chunkTokens - overlap
    val toks = split(col(textCol), " ")
    // chunk count: 1 for short docs, else ceil((n - overlap) / stride)
    val nChunks = greatest(lit(1L),
      ceil((size(toks).cast("long") - overlap) / lit(stride.toDouble))
        .cast("long"))
    df.select(col(idCol), toks.as("_toks"), nChunks.as("_nc"))
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(0L), col("_nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("tok_start"),
        array_join(
          slice(col("_toks"), (col("chunk_id") * stride + 1).cast("int"),
            lit(chunkTokens)), " ").as("chunk_text"))
      .withColumn("n_tok",
        size(split(col("chunk_text"), " ")).cast("long"))
  }

  /** Content-defined chunking — the Rabin/rolling-hash boundary rule
    * storage dedup and dedup-friendly splitters use: a chunk boundary
    * falls wherever the hash of the n-token window starting at a
    * position is ≡ 0 (mod `divisor`), so boundaries are decided by
    * CONTENT. An edit near the top of a document shifts only its own
    * chunk, and every later chunk re-synchronizes to identical
    * fingerprints — the resync property fixed-stride chunking lacks
    * (spec-asserted), which is what makes chunk-level dedup across
    * near-identical documents work. Expected chunk length ≈ divisor
    * window starts.
    *
    * Chunks are islands of window starts between boundaries (a
    * boundary at start p closes the chunk through p). `n_tokens`
    * spans min start … max start + n − 1 — adjacent chunks share the
    * n−1 seam tokens, the shingled-coverage view a fingerprint needs.
    * `chunk_fp` = md5 of the chunk's token span (the dedup key).
    *
    * Scale shape: one window pass + one aggregation, both partitioned
    * by document; the fingerprint join back to the token array is a
    * per-id equi-join. Hashes are md5-derived → oracle-replayable. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                n: Int = 3, divisor: Int = 16): DataFrame = {
    require(n >= 1, "cdcChunks: n must be >= 1")
    require(divisor >= 2, "cdcChunks: divisor must be >= 2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val chunks = Dedup.positionalShingles(df, idCol, textCol, n)
      .withColumn("_h",
        conv(substring(md5(col("shingle")), 1, 8), 16, 10).cast("long"))
      .withColumn("_b",
        (pmod(col("_h"), lit(divisor.toLong)) === 0).cast("int"))
      .withColumn("_idx", coalesce(
        sum(col("_b")).over(w.rowsBetween(Long.MinValue, -1)), lit(0)))
      .groupBy(col(idCol), col("_idx"))
      .agg(min(col("pos")).as("start_pos"), max(col("pos")).as("_end"),
        count(lit(1)).cast("long").as("n_windows"))
    chunks
      .join(df.select(col(idCol), split(col(textCol), " ").as("_toks")),
        Seq(idCol))
      .select(col(idCol),
        col("_idx").cast("long").as("chunk_idx"),
        col("start_pos").cast("long").as("start_pos"),
        col("n_windows"),
        (col("_end") - col("start_pos") + n).cast("long").as("n_tokens"),
        md5(array_join(slice(col("_toks"), col("start_pos").cast("int"),
          (col("_end") - col("start_pos") + n).cast("int")), " "))
          .as("chunk_fp"))
  }
}
