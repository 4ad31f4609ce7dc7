package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.{Dedup, Mixture, Multimodal, Similarity, TextStats}
import Rounding.r

/** LLM-data-pipeline operators (SURVEY.md §2.8 / north star): dedup
  * (exact, MinHash+LSH, exact n-gram Jaccard, SimHash), similarity search
  * (brute-force + LSH ANN), text analysis (language-ID, quality, token
  * counts, fingerprinting) and multimodal metadata plumbing.
  *
  * Everything uses deterministic md5-derived hashing so the DuckDB oracle
  * can replicate results exactly; q46 (approximate ANN) is the one entry
  * with no oracle (rows-only check) since approximation is the point.
  */
object Llm {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def embD(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "embeddings")
      .select($"vec_id", $"label",
        transform($"embedding", x => x.cast("double")).as("v"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact dedup: hash group-by on content
    "q40_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "documents").groupBy($"text")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select($"keep_id", $"n_copies", $"text")
        .orderBy("keep_id")
    }),

    // MinHash+LSH near-dup: bigram shingles → hashed base (one md5,
    // df-pruned of ultra-common shingles) → 16-hash signature → 8 bands
    // → banded equi-join candidates → exact-Jaccard verify ≥ 0.5.
    // localCheckpoint materializes the (long,long) base once; the
    // signature and verification branches both reuse it.
    "q41_dedup_minhash" -> ((s, dir) => {
      import s.implicits._
      val sh = Dedup.shingles(T(s, dir, "documents"), "doc_id", "text", n = 2)
      val base = Dedup.hashedShingles(sh, "doc_id").localCheckpoint()
      // df-prune shingles in >25% of docs from SIGNATURES only (standard
      // minhash practice; verification below still uses the full sets).
      // No-op on this uniform-frequency fixture corpus; active on the
      // Zipfian head of a real one.
      val rare = Dedup.rareShingles(base, "doc_id", maxFrac = 0.25)
      // signatures are tiny (one row per doc); checkpointing stops the
      // banded self-join from re-aggregating the shingle base twice
      val sig = Dedup.minhashSignature(rare, "doc_id", k = 16).localCheckpoint()
      val cand = Dedup.minhashCandidates(sig, "doc_id", k = 16, bands = 8)
      Dedup.jaccardOnCandidates(base, "doc_id", cand)
        .filter($"jaccard" >= 0.5)
        .select($"id_a", $"id_b", r($"jaccard", 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // end-to-end corpus curation — the composed training-data-prep
    // pipeline the individual operators serve: token-length quality
    // gate → exact dedup (keep lowest doc_id per text) → language-ID
    // of the keepers → per-language corpus stats. One explode + three
    // key shuffles; every stage is the already-verified operator
    "q87_corpus_prep" -> ((s, dir) => {
      import s.implicits._
      val docs = T(s, dir, "documents")
      val lang = TextStats.languageId(
          TextStats.tokens(docs, "doc_id", "text"), "doc_id")
        .select($"doc_id", $"pred_lang")
      val keep = docs.withColumn("n_toks", size(split($"text", " ")).cast("long"))
        .filter($"n_toks".between(5, 1000))
        .groupBy($"text")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"),
          max($"n_toks").as("n_toks"))
      keep.join(lang, keep("keep_id") === lang("doc_id"))
        .groupBy($"pred_lang", floor($"n_toks" / 20).as("len_bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_copies" - 1).as("n_dupes_removed"),
          sum($"n_toks").as("total_tokens"))
        .orderBy($"pred_lang", $"len_bucket")
    }),

    // dedup clustering: verified near-dup pairs -> connected components
    // (min-label propagation) -> cluster id + size per doc — the step
    // that turns pairwise similarity into "keep one canonical doc"
    "q84_dup_clusters" -> ((s, dir) => {
      import s.implicits._
      val sh = Dedup.shingles(T(s, dir, "documents"), "doc_id", "text", n = 2)
      val base = Dedup.hashedShingles(sh, "doc_id").localCheckpoint()
      val rare = Dedup.rareShingles(base, "doc_id", maxFrac = 0.25)
      val sig = Dedup.minhashSignature(rare, "doc_id", k = 16).localCheckpoint()
      val cand = Dedup.minhashCandidates(sig, "doc_id", k = 16, bands = 8)
      val pairs = Dedup.jaccardOnCandidates(base, "doc_id", cand)
        .filter($"jaccard" >= 0.5).select("id_a", "id_b").localCheckpoint()
      Dedup.connectedComponents(pairs)
        .groupBy($"comp")
        .agg(count(lit(1)).as("cluster_size"),
          min($"id").as("keep_id"), max($"id").as("max_id"))
        .select($"comp", $"cluster_size", $"keep_id", $"max_id")
        .orderBy("comp")
    }),

    // exact n-gram Jaccard near-dup: prefix-filtered candidates (pairs
    // sharing one of their 3 globally-rarest shingles — PPJoin-style
    // blocking), then exact array-intersect Jaccard, verified ≥ 0.5
    "q42_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      val sh = Dedup.shingles(T(s, dir, "documents"), "doc_id", "text", n = 2)
      val base = Dedup.hashedShingles(sh, "doc_id").localCheckpoint()
      // prefixes are tiny (k rows per doc); checkpointing stops the
      // self-join from running the df-join + window twice
      val pref = Dedup.rarestPrefix(base, "doc_id", k = 3).localCheckpoint()
      val cand = pref.select($"doc_id".as("id_a"), $"_k")
        .join(pref.select($"doc_id".as("id_b"), $"_k"), Seq("_k"))
        .filter($"id_a" < $"id_b")
        .select("id_a", "id_b").distinct()
      Dedup.jaccardOnCandidates(base, "doc_id", cand)
        .filter($"jaccard" >= 0.5)
        .select($"id_a", $"id_b", r($"jaccard", 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // SimHash 16-bit fingerprint per document (token-level)
    "q43_simhash" -> ((s, dir) => {
      import s.implicits._
      val sh = Dedup.shingles(T(s, dir, "documents"), "doc_id", "text", n = 1)
      Dedup.simhash(sh, "doc_id", nBits = 16).orderBy("doc_id")
    }),

    // simhash near-dup pairs within Hamming distance 3: 48-bit
    // fingerprint, pigeonhole banding (4 bands of 12 bits — 4096 values
    // per band keeps buckets selective) -> band equi-join -> bit_count
    "q77_simhash_pairs" -> ((s, dir) => {
      import s.implicits._
      val sh = Dedup.shingles(T(s, dir, "documents"), "doc_id", "text", n = 1)
      val fp = Dedup.simhash(sh, "doc_id", nBits = 48).localCheckpoint()
      Dedup.simhashPairs(fp, "doc_id", nBits = 48, maxDist = 3)
        .orderBy("id_a", "id_b")
    }),

    // brute-force cosine top-10 against the vec_id=0 query vector
    "q44_cosine_topk" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir)
      val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
      e.crossJoin(broadcast(q))
        .withColumn("_cos", Similarity.cosine($"v", $"qv"))
        .withColumn("cos", r($"_cos", 4))
        .orderBy($"cos".desc, $"vec_id")
        .select($"vec_id", $"cos")
        .limit(10)
    }),

    // embedding near-dup pairs, blocked by label (equi-join blocking);
    // norms precomputed once per vector, pairs only pay one dot product.
    // The block join is SALTED: label blocking alone leaves one
    // un-splittable quadratic reducer per hot (Zipfian) label; salting
    // spreads each label's pair enumeration over `salt` reducers while
    // emitting the EXACT same pairs (the salt only partitions the work —
    // right side replicated per salt, each unordered pair matched once)
    "q45_embed_pairs" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).withColumn("_nrm", Similarity.norm($"v"))
      val a = e.select($"vec_id".as("vec_a"), $"label", $"v".as("va"), $"_nrm".as("_nra"))
      val b = e.select($"vec_id".as("vec_b"), $"label", $"v".as("vb"), $"_nrm".as("_nrb"))
      graft.ra.RA.saltedJoin(a, b, Seq("label"), salt = 16)
        .filter($"vec_a" < $"vec_b")
        .withColumn("_cos", Similarity.dot($"va", $"vb") / ($"_nra" * $"_nrb"))
        .filter($"_cos" >= 0.35)
        .select($"label", $"vec_a", $"vec_b", r($"_cos", 4).as("cos"))
        .orderBy("vec_a", "vec_b")
    }),

    // LSH-bucketed ANN top-10. Approximate by design, but fully
    // deterministic (md5-derived hyperplanes), so the DuckDB oracle
    // replays the exact bucket computation with the same plane literals.
    "q46_ann_lsh" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir)
      val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
      Similarity.annTopK(e, "v", q, "qv", k = 10, nPlanes = 8, dim = 64,
          tieBreak = Seq($"vec_id"))
        .select($"vec_id", r($"cos", 4).as("cos"))
    }),

    // IVF ANN top-10: deterministic coarse quantizer (16 cells, centroid
    // vectors = vec_id 0,7,...,105), probe the query's 4 nearest cells,
    // exact rank within them — the partition-pruned scale path
    "q70_ann_ivf" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir)
      val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
      val assigned = Similarity.ivfAssign(e, "vec_id", "v",
        nCentroids = 16, idStride = 7)
      Similarity.ivfTopK(assigned, "v", q, "qv", k = 10,
          nCentroids = 16, nProbe = 4, emb = e, idCol = "vec_id",
          idStride = 7, tieBreak = Seq($"vec_id"))
        .select($"vec_id", r($"cos", 4).as("cos"))
    }),

    // multi-probe LSH ANN top-10: query bucket + all Hamming-1 neighbor
    // buckets — recovers the recall single-probe loses at hyperplane
    // boundaries, still one equi-join
    "q75_ann_multiprobe" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir)
      val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
      Similarity.annTopKMultiProbe(e, "v", q, "qv", k = 10, nPlanes = 8,
          dim = 64, tieBreak = Seq($"vec_id"))
        .select($"vec_id", r($"cos", 4).as("cos"))
    }),

    // label-free embedding near-dup pairs: LSH-bucket blocking (64 sign
    // buckets) instead of the label key q45 relies on
    "q76_embed_lsh_pairs" -> ((s, dir) => {
      import s.implicits._
      Similarity.lshNearDupPairs(embD(s, dir), "vec_id", "v",
          nPlanes = 6, dim = 64, minCos = 0.35)
        .select($"id_a", $"id_b", r($"cos", 4).as("cos"))
        .orderBy("id_a", "id_b")
    }),

    // stopword-vote language ID
    "q47_langid" -> ((s, dir) => {
      val toks = TextStats.tokens(T(s, dir, "documents"), "doc_id", "text")
      TextStats.languageId(toks, "doc_id")
        .select(col("doc_id"), col("s_en").cast("long").as("s_en"),
          col("s_es").cast("long").as("s_es"), col("s_de").cast("long").as("s_de"),
          col("pred_lang"))
        .orderBy("doc_id")
    }),

    // quality scoring: token stats, type-token ratio, stopword ratio
    "q48_quality" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "documents")
        .select($"doc_id", $"n_chars", explode(split($"text", " ")).as("word"))
        .groupBy($"doc_id", $"n_chars")
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct($"word").as("n_types"),
          r(avg(length($"word")), 4).as("avg_tok_len"),
          r(sum(when($"word".isInCollection(TextStats.stopwords("en")), 1)
            .otherwise(0)) * lit(1.0) / count(lit(1)), 4).as("stop_ratio"))
        .withColumn("ttr", r($"n_types" * lit(1.0) / $"n_tokens", 4))
        .withColumn("chars_per_tok", r($"n_chars" * lit(1.0) / $"n_tokens", 4))
        .orderBy("doc_id")
    }),

    // whitespace + regex token counting
    "q49_token_count" -> ((s, dir) => {
      TextStats.tokenCounts(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // winnowing fingerprints (rolling-hash min-in-window sketch): count
    // + min fingerprint per doc, plus docs paired by a shared fingerprint
    "q71_winnowing" -> ((s, dir) => {
      import s.implicits._
      Dedup.winnowing(T(s, dir, "documents"), "doc_id", "text", n = 2, w = 4)
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_fp"), min($"fp").as("min_fp"))
        .orderBy("doc_id")
    }),

    // tf-idf: top-3 most characteristic terms per document — tf per
    // (doc, term) and df per term are two aggregations off one explode;
    // the per-doc top-k is a window. All shuffles are on doc or term
    // keys; the df table joins back by term (AQE broadcasts when small).
    "q74_tfidf" -> ((s, dir) => {
      import s.implicits._
      val toks = T(s, dir, "documents")
        .select($"doc_id", explode(split($"text", " ")).as("term"))
        .filter(length($"term") > 0)
      val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df_ = toks.select($"doc_id", $"term").distinct()
        .groupBy($"term").agg(count(lit(1)).as("df"))
      val n = T(s, dir, "documents").select(count(lit(1)).as("n_docs"))
      val scored = tf.join(df_, "term").crossJoin(n)
        .withColumn("tfidf", r($"tf" * log($"n_docs" * 1.0 / $"df"), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"tfidf".desc, $"term")
      scored.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
        .select($"doc_id", $"rk".cast("long").as("rk"), $"term", $"tfidf")
        .orderBy("doc_id", "rk")
    }),

    // canonical fingerprint dedup groups
    "q50_fingerprint" -> ((s, dir) => {
      import s.implicits._
      T(s, dir, "documents")
        .select($"doc_id", TextStats.fingerprint($"text").as("fp"))
        .groupBy($"fp")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
        .select($"keep_id", $"n_docs", $"fp")
        .orderBy("keep_id")
    }),

    // Gopher/MassiveText repetition filters: most-frequent-bigram mass +
    // duplicated-5-gram fraction — the boilerplate signals LLM pipelines
    // threshold on before training
    "q95_repetition" -> ((s, dir) => {
      import s.implicits._
      TextStats.repetition(T(s, dir, "documents"), "doc_id", "text")
        .select($"doc_id", $"n_words",
          r($"top2_frac", 4).as("top2_frac"), r($"dup5_frac", 4).as("dup5_frac"))
        .orderBy("doc_id")
    }),

    // benchmark decontamination (GPT-3/PaLM style): flag training docs
    // sharing any word n-gram with the eval set (here doc_id < 5, n=4
    // at fixture scale; production uses 13-grams). Shape: the eval
    // gram set is the SMALL side by construction -> broadcast semi-join
    // against the train grams — candidate generation is an equi-join,
    // never a scan of train x eval
    "q96_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val grams = Dedup.positionalShingles(
          T(s, dir, "documents"), "doc_id", "text", n = 4)
        .select($"doc_id", $"shingle")
      val eval = grams.filter($"doc_id" < 5).select($"shingle").distinct()
      grams.filter($"doc_id" >= 5)
        .join(broadcast(eval), Seq("shingle"), "left_semi")
        .groupBy($"doc_id")
        .agg(count_distinct($"shingle").as("n_shared"))
        .orderBy("doc_id")
    }),

    // deterministic stratified sampling for data mixing: per-language
    // keep rates (en 0.5 / es 0.25 / de 1.0) applied via an md5-derived
    // uniform in [0,1) — reproducible on any engine, no RNG state, and
    // embarrassingly parallel (pure map after the language aggregate)
    "q97_sample_stratified" -> ((s, dir) => {
      import s.implicits._
      val docs = T(s, dir, "documents")
      val lang = TextStats.languageId(
          TextStats.tokens(docs, "doc_id", "text"), "doc_id")
        .select($"doc_id", $"pred_lang")
      val rate = when($"pred_lang" === "en", 0.5)
        .when($"pred_lang" === "es", 0.25).otherwise(1.0)
      lang
        .withColumn("_u",
          conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
            .cast("double") / 4294967296.0)
        .filter($"_u" < rate)
        .select($"doc_id", $"pred_lang")
        .orderBy("doc_id")
    }),

    // curation pipeline v2 — the full modern recipe end-to-end:
    // repetition/length quality gate (q95) → benchmark decontamination
    // (q96) → exact dedup (q40) → language-ID (q47) → stratified
    // sampling (q97) → per-language corpus stats. Shuffle ledger: two
    // n-gram explodes + four key shuffles + one broadcast semi-join;
    // every stage is an independently-oracle-checked operator
    "q99_curation_v2" -> ((s, dir) => {
      import s.implicits._
      // spread ONCE at the top of the chain: the stages' own Par.spread
      // calls then no-op (input already at target parallelism) and the
      // single exchange is reused across every subtree of the final
      // plan, instead of each stage paying its own repartition
      val docs = graft.util.Par.spread(T(s, dir, "documents"), force = true)
      val rep = TextStats.repetition(docs, "doc_id", "text")
      val gated = docs.join(
        rep.filter($"n_words".between(5, 1000) &&
            coalesce($"dup5_frac", lit(0.0)) < 0.2)
          .select($"doc_id", $"n_words"), "doc_id")
      val grams = Dedup.positionalShingles(docs, "doc_id", "text", n = 4)
        .select($"doc_id", $"shingle")
      val evalG = grams.filter($"doc_id" < 5).select($"shingle").distinct()
      val contaminated = grams.filter($"doc_id" >= 5)
        .join(broadcast(evalG), Seq("shingle"), "left_semi")
        .select($"doc_id").distinct()
      val clean = gated.filter($"doc_id" >= 5)
        .join(contaminated, Seq("doc_id"), "left_anti")
      val keep = clean.groupBy($"text")
        .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"),
          max($"n_words").as("n_words"))
      val lang = TextStats.languageId(
          TextStats.tokens(keep.select($"doc_id", $"text"), "doc_id", "text"),
          "doc_id")
        .select($"doc_id", $"pred_lang")
      val sampled = keep.join(lang, "doc_id")
        .withColumn("_u",
          conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
            .cast("double") / 4294967296.0)
        .filter($"_u" < when($"pred_lang" === "en", 0.5)
          .when($"pred_lang" === "es", 0.25).otherwise(1.0))
      sampled.groupBy($"pred_lang", floor($"n_words" / 20).as("len_bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_copies").as("n_source_docs"),
          sum($"n_words").as("total_tokens"))
        .orderBy($"pred_lang", $"len_bucket")
    }),

    // PII scrubbing: email/phone masking via anchored regex replace —
    // the redaction pass training pipelines run before tokenization.
    // The fixture corpus carries no PII, so deterministic synthetic
    // contact strings are injected per doc and must all be caught
    // (patterns kept to the regex subset Java and RE2 treat alike)
    "q104_pii_scrub" -> ((s, dir) => {
      import s.implicits._
      val withPii = T(s, dir, "documents").select($"doc_id",
        concat($"text", lit(" contact user"), $"doc_id", lit("@example.com"),
          lit(" or 555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"))
          .as("text"))
      val scrubbed = withPii.select($"doc_id",
        regexp_replace(
          regexp_replace($"text",
            lit("[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+"), lit("<EMAIL>")),
          lit("[0-9]{3}-[0-9]{4}"), lit("<PHONE>")).as("text"))
      scrubbed.select($"doc_id", md5($"text").as("scrubbed_md5"),
          ($"text".contains("<EMAIL>") && $"text".contains("<PHONE>"))
            .as("masked"),
          (!$"text".rlike("@") && !$"text".rlike("[0-9]{3}-[0-9]{4}"))
            .as("clean"))
        .orderBy("doc_id")
    }),

    // SemDeDup-style semantic dedup: IVF-cell blocking + within-cell
    // cosine >= tau against lower-id vectors; summarized per cell
    // (assignment, pairwise pass and threshold all deterministic, so
    // the oracle replays them exactly)
    "q108_semantic_dedup" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      Similarity.semanticDupFlags(e, "vec_id", "v",
          nCentroids = 8, tau = 0.95)
        .groupBy($"cell")
        .agg(count(lit(1)).as("n"),
          sum(when($"is_dup", 1L).otherwise(0L)).as("n_dup"))
        .orderBy("cell")
    }),

    // GPT-style sequence packing: concat-in-id-order per shard, chunk
    // at a 512-token budget — per-doc shard-local start offset and
    // landing sequence id (window partitioned by shard: no global-order
    // single-partition window)
    "q109_sequence_pack" -> ((s, dir) => {
      import s.implicits._
      TextStats.packSequences(T(s, dir, "documents"), "doc_id", "text",
          ($"doc_id" % 8).cast("long"), budget = 512)
        .select($"doc_id", $"shard", $"n_tok", $"start_off", $"seq_id")
        .orderBy("doc_id")
    }),

    // product quantization encode: 8 subspaces x 16 borrowed codewords
    // over the 64-dim embeddings; per-vector code string (argmin ties
    // to the lower codeword — deterministic, oracle replays it)
    "q110_pq_encode" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      Similarity.pqEncode(e, "vec_id", "v", m = 8, k = 16, subDim = 8)
        .groupBy($"vec_id")
        .agg(array_join(
          transform(array_sort(collect_list(struct($"j", $"code"))),
            x => x.getField("code").cast("string")), ",").as("codes"))
        .orderBy("vec_id")
    }),

    // ADC search over the PQ codes: query 0's m x k distance table,
    // per-vector approximate distance summed in subspace order
    // (deterministic fold -> bit-exact vs the oracle), top 10
    "q111_pq_adc_topk" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
      Similarity.pqAdcTopK(e, "vec_id", "v", q, "qv", topK = 10,
          m = 8, k = 16, subDim = 8)
        .select($"vec_id", r($"adist", 6).as("adist"))
    }),

    // TRAINED IVF: 2 fixed Lloyd's iterations (spherical k-means —
    // assign by cosine, recentre on the round-6 element-wise mean) from
    // the borrowed init, then the same probe/rank read path as q70.
    // Training is deterministic end to end, so the oracle replays every
    // iteration; round-6 means make the centroid literals identical
    // across engines despite aggregation-order float noise
    "q114_ivf_trained" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
      val cents = Similarity.ivfTrain(e, "vec_id", "v",
        nCentroids = 8, dim = 64, iters = 2, idStride = 7)
      val assigned = Similarity.ivfAssign(e, "vec_id", "v", cents)
      Similarity.ivfTopK(assigned, "v", q, "qv", k = 10, nProbe = 3,
          cents, tieBreak = Seq($"vec_id"))
        .select($"vec_id", r($"cos", 4).as("cos"))
    }),

    // TRAINED PQ: 2 fixed Lloyd's iterations per subspace (all
    // subspaces train in the same two aggregations — j is a grouping
    // key) from the borrowed codebook, then the q111 ADC read path
    // against the trained codebook
    "q115_pq_trained" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
      val cb = Similarity.pqTrain(e, "vec_id", "v",
        m = 8, k = 16, subDim = 8, iters = 2)
      Similarity.pqAdcTopK(e, "vec_id", "v", q, "qv", topK = 10,
          codebook = cb, subDim = 8)
        .select($"vec_id", r($"adist", 6).as("adist"))
    }),

    // overlapping context-window chunking (64-token chunks, 16-token
    // overlap) — the splitter run before embedding/RAG/vectorizing;
    // pure map + explode, no shuffle
    "q127_doc_chunking" -> ((s, dir) => {
      import s.implicits._
      TextStats.chunkDocuments(T(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 64, overlap = 16)
        .orderBy("doc_id", "chunk_id")
    }),

    // batch ANN serving: 3 queries answered in ONE pass — per-query
    // top-5 via a window partitioned by query id (parallel across
    // queries), not 3 separate jobs
    "q124_ann_batch" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      val qs = e.filter($"vec_id".isin(0L, 1L, 2L))
        .select($"vec_id".as("qid"), $"v".as("qv"))
      Similarity.bruteForceTopKBatch(e, "vec_id", "v", qs, "qid", "qv", k = 5)
        .select($"qid", $"vec_id", r($"cos", 4).as("cos"))
        .orderBy($"qid", $"cos".desc, $"vec_id")
    }),

    // batch IVF: each query probes its own 4 nearest cells; one
    // equi-join serves the whole batch
    "q125_ann_batch_ivf" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      val qs = e.filter($"vec_id".isin(0L, 1L, 2L))
        .select($"vec_id".as("qid"), $"v".as("qv"))
      val cents = Similarity.ivfCentroids(e, "vec_id", "v",
        nCentroids = 16, idStride = 7)
      val assigned = Similarity.ivfAssign(e, "vec_id", "v", cents)
        .select($"vec_id", $"v", $"cell")
      Similarity.ivfTopKBatch(assigned, "vec_id", "v", qs, "qid", "qv",
          k = 5, nProbe = 4, cents)
        .select($"qid", $"vec_id", r($"cos", 4).as("cos"))
        .orderBy($"qid", $"cos".desc, $"vec_id")
    }),

    // batch ADC: the PQ read path for a 3-query batch — qid-keyed
    // distance table, one codes join, per-query window rank
    "q126_pq_adc_batch" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      val qs = e.filter($"vec_id".isin(0L, 1L, 2L))
        .select($"vec_id".as("qid"), $"v".as("qv"))
      val cb = Similarity.pqCodebook(e, "vec_id", "v",
        m = 8, k = 16, subDim = 8)
      val codes = Similarity.pqEncode(e, "vec_id", "v", cb, subDim = 8)
      Similarity.pqAdcTopKBatch(codes, "vec_id", qs, "qid", "qv",
          topK = 5, cb, subDim = 8)
        .select($"qid", $"vec_id", r($"adist", 6).as("adist"))
        .orderBy($"qid", $"adist", $"vec_id")
    }),

    // batch REFINE serving: the q126 qid-keyed ADC shortlist (30 per
    // query) + ONE point-lookup of the union of shortlists + per-query
    // exact re-rank — the full production serving path for a request
    // batch, recall bounded by shortlist membership per query
    "q132_pq_refine_batch" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      val qs = e.filter($"vec_id".isin(0L, 1L, 2L))
        .select($"vec_id".as("qid"), $"v".as("qv"))
      val cb = Similarity.pqCodebook(e, "vec_id", "v",
        m = 8, k = 16, subDim = 8)
      val codes = Similarity.pqEncode(e, "vec_id", "v", cb, subDim = 8)
      Similarity.pqAdcRefineTopKBatch(codes, "vec_id", e, "v",
          qs, "qid", "qv", topK = 5, shortlist = 30, cb, subDim = 8)
        .select($"qid", $"vec_id", r($"cos", 4).as("cos"))
        .orderBy($"qid", $"cos".desc, $"vec_id")
    }),

    // semantic decontamination: embedding-space contamination audit
    // against a held-out eval set (every 50th vector) — the paraphrase-
    // catching complement of q96's exact n-gram decontamination. Exact
    // by design (broadcast the small eval side, full comparison), flag
    // on the rounded cosine so the verdict is cross-engine stable
    "q123_semantic_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      val ev = e.filter($"vec_id" % 50 === 0).select($"v".as("ev"))
      val train = e.filter($"vec_id" % 50 =!= 0)
      Similarity.semanticContamination(train, "vec_id", "v", ev, "ev",
          tau = 0.35)
        .orderBy("vec_id")
    }),

    // COMPOSED IVF-PQ search (the FAISS-IVFPQ read path): coarse
    // quantizer restricts the scan to 4 probed cells, PQ-ADC ranks the
    // candidates from their precomputed byte codes — raw vectors never
    // read at query time. Index structures (cell assignment + codes)
    // built once from the deterministic quantizers
    "q121_ivfpq_search" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
      val cents = Similarity.ivfCentroids(e, "vec_id", "v",
        nCentroids = 16, idStride = 7)
      val assigned = Similarity.ivfAssign(e, "vec_id", "v", cents)
        .select($"vec_id", $"cell")
      val cb = Similarity.pqCodebook(e, "vec_id", "v",
        m = 8, k = 16, subDim = 8)
      val codes = Similarity.pqEncode(e, "vec_id", "v", cb, subDim = 8)
      Similarity.ivfPqTopK(assigned, "vec_id", codes, q, "qv",
          topK = 10, nProbe = 4, cents, cb, subDim = 8)
        .select($"vec_id", r($"adist", 6).as("adist"))
    }),

    // ADC shortlist + EXACT re-rank (the FAISS refine / ScaNN reorder
    // read shape): the quantized scan proposes 30 candidates, the true
    // cosine re-ranks them and keeps 10 — recall is bounded by
    // shortlist membership, not code resolution (raw ADC tops out at
    // ~0.70 recall@10 on the recall-spec corpus; refine measures 1.0).
    // Raw vectors are point-looked-up for the 30 ids only
    "q129_pq_refine" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
      val cb = Similarity.pqCodebook(e, "vec_id", "v",
        m = 8, k = 16, subDim = 8)
      Similarity.pqAdcRefineTopK(e, "vec_id", "v", q, "qv", topK = 10,
          shortlist = 30, codebook = cb, subDim = 8)
        .select($"vec_id", r($"cos", 4).as("cos"))
    }),

    // the FULL production ANN read path: IVF cell restriction → PQ-ADC
    // shortlist from byte codes → exact refine of 30 candidates
    "q130_ivfpq_refine" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
      val cents = Similarity.ivfCentroids(e, "vec_id", "v",
        nCentroids = 16, idStride = 7)
      val assigned = Similarity.ivfAssign(e, "vec_id", "v", cents)
        .select($"vec_id", $"cell")
      val cb = Similarity.pqCodebook(e, "vec_id", "v",
        m = 8, k = 16, subDim = 8)
      val codes = Similarity.pqEncode(e, "vec_id", "v", cb, subDim = 8)
      Similarity.ivfPqRefineTopK(assigned, "vec_id", codes, e, "v",
          q, "qv", topK = 10, shortlist = 30, nProbe = 4,
          cents, cb, subDim = 8)
        .select($"vec_id", r($"cos", 4).as("cos"))
    }),

    // RESIDUAL IVF-PQ (the FAISS IVFPQ encoding proper): PQ over
    // v − centroid instead of v. Residuals within a cell are centered
    // near zero, so the same 8×16 code budget quantizes them with far
    // less error — measured raw-ADC recall@10 rises 0.70 → 0.80 on the
    // recall-spec corpus with no extra read cost (the ADC table grows
    // to nProbe×m×k rows, still broadcast-sized). Borrowed quantizers
    // so the oracle replays the index build exactly
    "q140_ivfpq_residual" -> ((s, dir) => {
      import s.implicits._
      val e = embD(s, dir).select($"vec_id", $"v")
      val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
      val cents = Similarity.ivfCentroids(e, "vec_id", "v",
        nCentroids = 16, idStride = 7)
      val assigned = Similarity.ivfAssign(e, "vec_id", "v", cents)
      val res = Similarity.ivfResiduals(assigned, "v", cents)
      val cb = Similarity.pqCodebook(res, "vec_id", "_rv",
        m = 8, k = 16, subDim = 8)
      val codes = Similarity.pqEncode(res, "vec_id", "_rv", cb, subDim = 8)
        .join(res.select($"vec_id", $"cell"), "vec_id")
      Similarity.ivfPqResidualTopK(codes, "vec_id", q, "qv",
          topK = 10, nProbe = 4, cents, cb, subDim = 8)
        .select($"vec_id", r($"adist", 6).as("adist"))
    }),

    // BM25 ranking against a literal query ("hash join scan") — the
    // classic sparse retrieval scorer on top of the tf-idf machinery;
    // per-doc term scores folded in term order for a deterministic sum
    "q112_bm25" -> ((s, dir) => {
      import s.implicits._
      TextStats.bm25(T(s, dir, "documents"), "doc_id", "text",
          terms = Seq("hash", "join", "scan"))
        .select($"doc_id", r($"bm25", 6).as("bm25"))
        .orderBy("doc_id")
    }),

    // heavy hitters with EXACT counts via Misra-Gries candidate
    // prefilter: the shuffle carries only plausible-heavy keys, the
    // verify pass keeps results exact (guarantee holds: minCount 940 >=
    // N/sketchSize ~ 27k/64)
    "q147_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val words = T(s, dir, "documents")
        .select(explode(split($"text", " ")).as("word"))
      graft.operators.Frequency.heavyHitters(words, "word",
          sketchSize = 64, minCount = 940)
        .orderBy($"word")
    }),

    // linear classifier inference (the fastText quality-filter shape):
    // logistic regression over mean term features, model = an explicit
    // broadcast (term, weight) relation + bias; matched-term fold in
    // sorted term order for a deterministic double sum
    "q145_quality_classifier" -> ((s, dir) => {
      import s.implicits._
      val model = Seq(
        ("table", 0.8), ("query", 0.6), ("data", 0.5), ("join", 0.7),
        ("slow", -1.2), ("error", -1.5), ("a", -0.3), ("the", -0.2))
        .toDF("term", "weight")
      TextStats.linearScore(T(s, dir, "documents"), "doc_id", "text",
          model, bias = -0.1)
        .select($"doc_id", r($"score", 6).as("score"))
        .orderBy("doc_id")
    }),

    // multimodal metadata extraction over binary payloads. The payloads
    // are REAL format bytes (spec-valid PNG/JPEG/GIF built executor-side
    // with doc_id-derived dimensions — the only way a SQL oracle can
    // know the expected answer), and extractMeta parses their container
    // headers with the real magic-byte decoder.
    "q51_multimodal" -> ((s, dir) => {
      Multimodal.extractMeta(mediaFixture(s, dir)).toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("n_frames"))
        .orderBy("doc_id")
    }),

    // frame sampling: one media row explodes into every 2nd frame, the
    // frame count parsed from the real container header (APNG acTL /
    // GIF image descriptors). flatMap — rows-out ∝ frames, no driver loop
    "q68_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(mediaFixture(s, dir), stride = 2).toDF()
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"))
        .orderBy("doc_id", "frame_idx")
    }),

    // aspect-preserving resize geometry over header-parsed dimensions
    // (integer-exact, so the oracle replicates the clamping math)
    "q69_resize" -> ((s, dir) => {
      Multimodal.resizeMeta(mediaFixture(s, dir), maxW = 40, maxH = 30).toDF()
        .orderBy("doc_id")
    }),

    // audio metadata: real RIFF/WAVE chunk-walk over spec-valid PCM
    // payloads (doc_id-derived layout so the oracle is arithmetic)
    "q133_audio_meta" -> ((s, dir) => {
      Multimodal.extractAudioMeta(wavFixture(s, dir)).toDF()
        .select(col("doc_id"), col("format"), col("sample_rate"),
          col("channels"), col("n_samples"), col("duration_ms"))
        .orderBy("doc_id")
    }),

    // video metadata: real ISO BMFF box-walk (moov/mvhd/trak) — header
    // boxes only, mdat never read, the 100 TB metadata-pass shape
    "q134_video_meta" -> ((s, dir) => {
      Multimodal.extractVideoMeta(mp4Fixture(s, dir)).toDF()
        .select(col("doc_id"), col("format"), col("duration_ms"),
          col("n_tracks"))
        .orderBy("doc_id")
    }),

    // corpus-LM perplexity scoring (CCNet shape): add-one unigram LM
    // trained on the corpus in the same job, per-doc cross-entropy +
    // perplexity — the head/middle/tail quality bucketing signal
    "q137_lm_perplexity" -> ((s, dir) => {
      import s.implicits._
      TextStats.lmScore(T(s, dir, "documents"), "doc_id", "text")
        .select($"doc_id", $"n_tokens",
          r($"cross_entropy", 6).as("cross_entropy"), r($"ppl", 4).as("ppl"))
        .orderBy("doc_id")
    }),

    // bloom-prefiltered decontamination: the eval gram set is sketched
    // into one bloom filter (Spark's own sketch aggregate, registered by
    // BloomFunctions) that rides the plan as a scalar-subquery CONSTANT,
    // so the corpus side is probed map-side — no shuffle, no broadcast
    // of the gram table for the prefilter. The exact semi-join then
    // removes bloom false positives, so results are IDENTICAL to the
    // exact join (blooms have no false negatives); at 100 TB the sketch
    // cuts the join input to the contaminated sliver.
    "q135_bloom_decontaminate" -> ((s, dir) => {
      graft.functions.BloomFunctions.register(s)
      Dedup.positionalShingles(
          T(s, dir, "documents"), "doc_id", "text", n = 3)
        .select(col("doc_id"), col("shingle"))
        .createOrReplaceTempView("g135")
      s.sql("""
        WITH ev AS (SELECT DISTINCT shingle FROM g135 WHERE doc_id < 10),
        b AS (SELECT graft_bloom_agg(xxhash64(shingle), 16384L, 131072L) AS bf
              FROM ev)
        SELECT doc_id, CAST(count(DISTINCT g.shingle) AS BIGINT) AS n_shared
        FROM g135 g LEFT SEMI JOIN ev ON g.shingle = ev.shingle
        WHERE g.doc_id >= 10
          AND graft_might_contain((SELECT bf FROM b), xxhash64(g.shingle))
        GROUP BY doc_id ORDER BY doc_id""")
    }),

    // exact substring dedup (suffix-array family, Lee et al. 2022):
    // maximal token spans covered by 6-token windows occurring >= 2
    // times anywhere in the corpus — one gram-frequency shuffle, semi-
    // join back, per-doc island merge; never a global sort
    "q150_substring_spans" -> ((s, dir) => {
      Dedup.duplicateSpans(T(s, dir, "documents"), "doc_id", "text", k = 6)
        .orderBy("doc_id", "span_start")
    }),

    // the matching corpus rewrite: every duplicated span removed from
    // every document (aggressive variant — no canonical survivor),
    // untouched documents byte-identical, span lists joined per id
    "q151_substring_scrub" -> ((s, dir) => {
      Dedup.scrubDuplicateSpans(T(s, dir, "documents"), "doc_id", "text",
          k = 6)
        .orderBy("doc_id")
    }),

    // exact-count training mix: largest-remainder apportionment of 97
    // docs over length-bucket weights (exact binary fractions so both
    // engines' float paths agree bit-for-bit), per-domain quota filled
    // by deterministic md5 priority — output size exact (all three
    // buckets exceed their quota), unlike rate-based q97
    "q152_mixture_sample" -> ((s, dir) => {
      import s.implicits._
      val docs = T(s, dir, "documents")
        .withColumn("bucket", when($"n_chars" < 250, "short")
          .when($"n_chars" < 400, "mid").otherwise("long"))
      Mixture.mixtureSample(docs, "doc_id", "bucket",
          Map("short" -> 0.5, "mid" -> 0.3125, "long" -> 0.1875),
          total = 97)
        .select($"bucket", $"doc_id")
        .orderBy("bucket", "doc_id")
    }),

    // per-domain quantile gate: keep docs whose type-token ratio clears
    // their length bucket's exact 0.4-quantile — the per-domain quality
    // threshold a global cut gets wrong when distributions differ
    // (long docs repeat words, so their TTRs sit lower)
    "q153_quantile_gate" -> ((s, dir) => {
      import s.implicits._
      val docs = T(s, dir, "documents")
      val dom = docs.select($"doc_id",
        when($"n_chars" < 250, "short")
          .when($"n_chars" < 400, "mid").otherwise("long").as("bucket"))
      val ttr = docs
        .select($"doc_id", explode(split($"text", " ")).as("word"))
        .groupBy($"doc_id")
        .agg((countDistinct($"word") * lit(1.0) / count(lit(1))).as("ttr"))
      Mixture.quantileKeep(dom.join(ttr, "doc_id"), "bucket", "ttr",
          q = 0.4)
        .select($"bucket", $"doc_id", r($"ttr", 4).as("ttr"))
        .orderBy("bucket", "doc_id")
    }),

    // content-defined chunking: rolling-hash boundaries (3-token window
    // hash ≡ 0 mod 16) → chunks that RESYNC across edits, with md5
    // fingerprints — the dedup-friendly splitter, vs q127's fixed stride
    "q154_cdc_chunks" -> ((s, dir) => {
      TextStats.cdcChunks(T(s, dir, "documents"), "doc_id", "text",
          n = 3, divisor = 16)
        .orderBy("doc_id", "chunk_idx")
    }),

    // ——— the SQL-TEXT front door (r10): the same operators reached as
    // statements a wire client would send — graft_*(…) table-valued
    // procedures substituted pre-parse (server.GraftProcedures), then
    // planned by Catalyst exactly like the DataFrame twins. Each entry
    // goes THROUGH the text path end-to-end and shares its twin's
    // oracle, so the driver proves text == API == DuckDB.

    // q41's MinHash+LSH pipeline as one composable SQL call
    "q157_sql_minhash" -> ((s, dir) => {
      T(s, dir, "documents").createOrReplaceTempView("documents_q157")
      graft.server.GraftSql.sql(s, """
        SELECT id_a, id_b,
               floor(jaccard * 1000000 + 0.5) / 1000000 AS jaccard
        FROM graft_minhash_candidates('documents_q157', 'doc_id', 'text',
                                      k => 16, bands => 8,
                                      min_jaccard => 0.5)
        ORDER BY id_a, id_b""")
    }),

    // q44's brute-force cosine top-10 as SQL text; selection happens on
    // the RAW cosine inside the procedure (deterministic id tie-break),
    // display rounding applied by the outer statement
    "q158_sql_ann_topk" -> ((s, dir) => {
      embD(s, dir).createOrReplaceTempView("embeddings_q158")
      graft.server.GraftSql.sql(s, """
        SELECT vec_id, floor(cos * 10000 + 0.5) / 10000 AS cos
        FROM graft_ann_topk('embeddings_q158', 'vec_id', 'v', 0, 10)
        ORDER BY cos DESC, vec_id""")
    }),

    // q152's exact-count mixture as SQL text — the domain derivation
    // rides along as an inline-subquery table argument
    "q159_sql_mixture" -> ((s, dir) => {
      T(s, dir, "documents").createOrReplaceTempView("documents_q159")
      graft.server.GraftSql.sql(s, """
        SELECT bucket, doc_id
        FROM graft_mixture_sample(
          '(SELECT doc_id,
                   CASE WHEN n_chars < 250 THEN ''short''
                        WHEN n_chars < 400 THEN ''mid''
                        ELSE ''long'' END AS bucket
            FROM documents_q159)',
          'doc_id', 'bucket',
          map('short', 0.5, 'mid', 0.3125, 'long', 0.1875), 97)
        ORDER BY bucket, doc_id""")
    }),

    // q43's simhash as SQL text (unigram shingles, 16 bits)
    "q161_sql_simhash" -> ((s, dir) => {
      T(s, dir, "documents").createOrReplaceTempView("documents_q161")
      graft.server.GraftSql.sql(s, """
        SELECT doc_id, simhash
        FROM graft_simhash('documents_q161', 'doc_id', 'text',
                           n_bits => 16, shingle_n => 1)
        ORDER BY doc_id""")
    }),

    // q84's duplicate clustering as SQL text — the per-cluster summary
    // composes as plain SQL OVER the table-valued procedure
    "q162_sql_dup_clusters" -> ((s, dir) => {
      T(s, dir, "documents").createOrReplaceTempView("documents_q162")
      graft.server.GraftSql.sql(s, """
        SELECT comp, count(*) AS cluster_size,
               min(id) AS keep_id, max(id) AS max_id
        FROM graft_dup_clusters('documents_q162', 'doc_id', 'text',
                                k => 16, bands => 8, min_jaccard => 0.5)
        GROUP BY comp ORDER BY comp""")
    }),

    // q47's language ID as SQL text
    "q163_sql_langid" -> ((s, dir) => {
      T(s, dir, "documents").createOrReplaceTempView("documents_q163")
      graft.server.GraftSql.sql(s, """
        SELECT doc_id, CAST(s_en AS BIGINT) AS s_en,
               CAST(s_es AS BIGINT) AS s_es, CAST(s_de AS BIGINT) AS s_de,
               pred_lang
        FROM graft_lang_id('documents_q163', 'doc_id', 'text')
        ORDER BY doc_id""")
    })
  )

  /** Synthetic-but-real media corpus: every document gets a spec-valid
    * PNG / JPEG / GIF payload (rotating on doc_id % 3) whose dimensions
    * and frame count derive from doc_id, so DuckDB can state the
    * expected header-parse output in pure arithmetic while Spark runs
    * the honest byte-level decoder. Built executor-side via a typed map
    * — at 100 TB the media bytes would come straight off parquet binary
    * columns instead. */
  private def mediaFixture(s: SparkSession, dir: String):
      Dataset[Multimodal.MediaFile] = {
    import s.implicits._
    graft.util.Par.spread(T(s, dir, "documents").select($"doc_id", $"source"), force = true)
      .as[(Long, String)]
      .map { case (id, src) =>
        val w = (16 + id % 64).toInt
        val h = (12 + (id * 7) % 48).toInt
        val fr = (1 + id % 4).toInt
        val bytes = (id % 3) match {
          case 0 => Multimodal.makePng(w, h, fr)
          case 1 => Multimodal.makeJpeg(w, h)
          case _ => Multimodal.makeGif(w, h, fr)
        }
        Multimodal.MediaFile(id, src, bytes)
      }
  }

  /** WAV corpus, same contract as [[mediaFixture]]: spec-valid PCM
    * payloads whose layout derives from doc_id in oracle-expressible
    * arithmetic. */
  private def wavFixture(s: SparkSession, dir: String):
      Dataset[Multimodal.MediaFile] = {
    import s.implicits._
    graft.util.Par.spread(T(s, dir, "documents").select($"doc_id", $"source"), force = true)
      .as[(Long, String)]
      .map { case (id, src) =>
        val sr = (8000 + (id % 4) * 4000).toInt
        val ch = (1 + id % 2).toInt
        val n = (1600 + (id * 13) % 800).toInt
        Multimodal.MediaFile(id, src, Multimodal.makeWav(sr, ch, 16, n))
      }
  }

  /** MP4 corpus: spec-valid metadata boxes (ftyp/moov/mvhd/trak), box
    * parameters derived from doc_id. */
  private def mp4Fixture(s: SparkSession, dir: String):
      Dataset[Multimodal.MediaFile] = {
    import s.implicits._
    graft.util.Par.spread(T(s, dir, "documents").select($"doc_id", $"source"))
      .as[(Long, String)]
      .map { case (id, src) =>
        val dur = 3000L + (id * 17) % 6000
        val tracks = (1 + id % 3).toInt
        Multimodal.MediaFile(id, src, Multimodal.makeMp4(600, dur, tracks))
      }
  }

  // DuckDB bigram-shingle CTE shared by the near-dup oracles
  private val shCte = """
    sh AS (SELECT doc_id, unnest(list_distinct(
             [w[i] || ' ' || w[i+1] for i in generate_series(1, len(w)-1)])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))"""

  // hashed-shingle base + combined key (mirrors Dedup.hashedShingles /
  // Dedup.shingleKey: two 32-bit halves of one md5, 63-bit combined key)
  private val baseCte = """
    base AS (SELECT doc_id,
               CAST(concat('0x', substring(md5(s), 1, 8)) AS BIGINT) AS ha,
               CAST(concat('0x', substring(md5(s), 9, 8)) AS BIGINT) AS hb
             FROM sh),
    keyed AS (SELECT doc_id, (ha % 2147483648) * 4294967296 + hb AS k FROM base)"""

  // exact-Jaccard verification over a `cand(id_a, id_b)` CTE via
  // count-based intersection on keyed rows (shingles are distinct per doc,
  // so count == |intersection|); mirrors Dedup.jaccardOnCandidates
  private val verifyCtes = """
    sz AS (SELECT doc_id, count(*) AS n FROM keyed GROUP BY doc_id),
    inter AS (SELECT id_a, id_b, count(*) AS i
              FROM cand JOIN keyed a ON a.doc_id = id_a
                        JOIN keyed b ON b.doc_id = id_b AND b.k = a.k
              GROUP BY id_a, id_b)"""
  private val verifyTail = verifyCtes + """
    SELECT id_a, id_b,
           floor((i*1.0/(na.n + nb.n - i))*1000000 + 0.5)/1000000 AS jaccard
    FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
    WHERE i*1.0/(na.n + nb.n - i) >= 0.5
    ORDER BY id_a, id_b"""

  // connected components of the verified pair graph via recursive
  // closure + min label (fine at oracle scale; the Spark side uses
  // min-label propagation, which scales)
  // lazy: interpolates minhashCtes, which is defined further down the
  // file (strict val init order would splice a null)
  private lazy val dupClustersOracle: String = s"""
    WITH RECURSIVE $shCte, $baseCte, $minhashCtes, $verifyCtes,
    pairs AS (SELECT id_a, id_b
              FROM inter JOIN sz na ON id_a = na.doc_id
                         JOIN sz nb ON id_b = nb.doc_id
              WHERE i*1.0/(na.n + nb.n - i) >= 0.5),
    und AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS id FROM und),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT reach.id, und.b FROM reach JOIN und ON reach.r = und.a),
    comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
    SELECT comp, count(*) AS cluster_size, min(id) AS keep_id, max(id) AS max_id
    FROM comp GROUP BY comp ORDER BY comp"""

  // 16-hash signature (min(ha + i*hb)) + 8 two-row bands, mirroring
  // Dedup.minhashSignature / Dedup.minhashCandidates
  private val minhashCtes: String = {
    val k = 16; val bands = 8; val rows = k / bands
    // (ha + i*hb) % p, matching Dedup.minhashSignature's modulus (both
    // operands non-negative, so DuckDB % == Spark pmod)
    val sigCols = (0 until k)
      .map(i => s"min((ha + $i*hb) % 2147483647) AS h$i").mkString(", ")
    val banded = (0 until bands).map { b =>
      val bh = (0 until rows).map(r => s"h${b * rows + r}::VARCHAR")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($bh) AS bh FROM sig"
    }.mkString(" UNION ALL ")
    s"""
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM base),
    rare AS (SELECT b.doc_id, b.ha, b.hb
             FROM base b
             JOIN (SELECT ha, hb, count(*) AS df FROM base GROUP BY ha, hb) d
               ON b.ha = d.ha AND b.hb = d.hb, nd
             WHERE d.df <= nd.n * 0.25),
    sig AS (SELECT doc_id, $sigCols FROM rare GROUP BY doc_id),
    banded AS ($banded),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM banded a JOIN banded b
             ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)"""
  }

  // generated simhash oracle: per-bit +-1 votes from md5 nibbles
  private def simhashOracleN(nBits: Int): String = {
    val hex = "0123456789abcdef"
    val terms = (0 until nBits).map { b =>
      val j = b / 4 + 1; val k = b % 4
      s"""CASE WHEN sum(CASE WHEN (((strpos('$hex', substring(md5(s), $j, 1)) - 1) >> $k) & 1) = 1
         THEN 1 ELSE -1 END) > 0 THEN ${1L << b} ELSE 0 END"""
    }.mkString(" + ")
    s"""WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS s
        FROM documents)
       SELECT doc_id, CAST($terms AS BIGINT) AS simhash
       FROM t GROUP BY doc_id ORDER BY doc_id"""
  }
  private val simhashOracle: String = simhashOracleN(16)

  // The hyperplanes are deterministic (md5 of "plane:dim",
  // Similarity.planeWeights), so oracles ship the SAME plane weights as
  // SQL array literals and replay bucket assignment + cosine exactly
  private def bucketSql(v: String, nPlanes: Int): String = {
    val ws = Similarity.planeWeights(nPlanes, 64)
    def arr(w: Array[Double]) = w.mkString("[", ", ", "]")
    ws.zipWithIndex.map { case (w, p) =>
      s"(CASE WHEN list_dot_product($v, ${arr(w)}) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
  }

  private val annOracle: String = {
    def bucket(v: String) = bucketSql(v, 8)
    s"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    b AS (SELECT vec_id, v, ${bucket("v")} AS bucket FROM e),
    qb AS (SELECT qv, ${bucket("qv")} AS qbucket FROM q),
    cand AS (SELECT vec_id,
               list_dot_product(v, qv) /
                 (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS cos
             FROM b JOIN qb ON bucket = qbucket),
    top AS (SELECT vec_id, cos FROM cand ORDER BY cos DESC, vec_id LIMIT 10)
    SELECT vec_id, floor(cos*10000 + 0.5)/10000 AS cos FROM top"""
  }

  // IVF oracle: replays the deterministic centroid pick, cell assignment
  // (argmax cosine, ties to lower cell id), 4-cell probe, exact rank
  private val ivfOracle: String = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT CAST(vec_id // 7 AS BIGINT) AS cid, v AS cv
              FROM e WHERE vec_id % 7 = 0 AND vec_id // 7 < 16),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    assign AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, c.cv) /
                   (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
                 DESC, c.cid) AS rn
        FROM e CROSS JOIN cents c)
      WHERE rn = 1),
    probes AS (
      SELECT cid FROM (
        SELECT c.cid,
               list_dot_product(q.qv, c.cv) /
                 (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) AS ccos
        FROM q CROSS JOIN cents c
        ORDER BY ccos DESC, c.cid LIMIT 4)),
    top AS (
      SELECT a.vec_id,
             list_dot_product(a.v, q.qv) /
               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos
      FROM assign a JOIN probes p ON a.cid = p.cid CROSS JOIN q
      ORDER BY cos DESC, a.vec_id LIMIT 10)
    SELECT vec_id, floor(cos*10000 + 0.5)/10000 AS cos FROM top"""

  private val multiProbeOracle: String = {
    val flips = (0 until 8).map(p => s"xor(qb, ${1L << p})").mkString(", ")
    s"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    b AS (SELECT vec_id, v, ${bucketSql("v", 8)} AS bucket FROM e),
    qb0 AS (SELECT qv, CAST(${bucketSql("qv", 8)} AS BIGINT) AS qb FROM q),
    probes AS (SELECT qv, unnest([qb, $flips]) AS bucket FROM qb0),
    top AS (SELECT vec_id,
              list_dot_product(v, qv) /
                (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS cos
            FROM b JOIN probes ON b.bucket = probes.bucket
            ORDER BY cos DESC, vec_id LIMIT 10)
    SELECT vec_id, floor(cos*10000 + 0.5)/10000 AS cos FROM top"""
  }

  private val lshPairsOracle: String = s"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, ${bucketSql("v", 6)} AS bucket FROM e),
    pairs AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                     list_dot_product(a.v, b2.v) /
                       (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b2.v, b2.v))) AS cos
              FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
    SELECT id_a, id_b, floor(cos*10000 + 0.5)/10000 AS cos
    FROM pairs WHERE cos >= 0.35 ORDER BY id_a, id_b"""

  // simhash pair oracle: 4 bands of 12 bits over the generated 48-bit
  // simhash CTE, band equi-join, bit_count(xor) verify
  private val simhashPairsOracle: String = {
    val banded = (0 until 4).map(b =>
      s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * 12}) % 4096 AS bh FROM fp")
      .mkString(" UNION ALL ")
    s"""
    WITH fp AS (${simhashOracleN(48)}),
    banded AS ($banded),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
             FROM banded a JOIN banded b
             ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, dist FROM cand WHERE dist <= 3 ORDER BY id_a, id_b"""
  }

  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  // trained-IVF oracle: replays BOTH Lloyd's iterations — assignment
  // (argmax cosine, ties to lower cid) and the round-6 element-wise
  // mean recentre (floor(x*1e6+0.5)/1e6, the cross-engine formula) —
  // then the 3-probe top-10 read path against the trained centroids
  private val ivfTrainedOracle: String = {
    val iters = (1 to 2).map { t =>
      val prev = s"c${t - 1}"
      s"""a$t AS (SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.cid) AS rn
        FROM e CROSS JOIN $prev c) WHERE rn = 1),
      m$t AS (SELECT cid, g.pos AS pos,
                     floor(avg(v[g.pos])*1000000 + 0.5)/1000000 AS val
              FROM a$t, generate_series(1, 64) AS g(pos)
              GROUP BY cid, g.pos),
      n$t AS (SELECT cid, list(val ORDER BY pos) AS cv FROM m$t GROUP BY cid),
      c$t AS (SELECT p.cid, coalesce(n$t.cv, p.cv) AS cv
              FROM $prev p LEFT JOIN n$t USING (cid))"""
    }.mkString(",\n")
    s"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT CAST(vec_id // 7 AS BIGINT) AS cid, v AS cv
           FROM e WHERE vec_id % 7 = 0 AND vec_id // 7 < 8),
    $iters,
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    assign AS (SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.cid) AS rn
        FROM e CROSS JOIN c2 c) WHERE rn = 1),
    probes AS (SELECT cid FROM (
        SELECT c.cid, ${cosSql("q.qv", "c.cv")} AS ccos
        FROM q CROSS JOIN c2 c
        ORDER BY ccos DESC, c.cid LIMIT 3)),
    top AS (SELECT a.vec_id, ${cosSql("a.v", "q.qv")} AS cos
            FROM assign a JOIN probes p ON a.cid = p.cid CROSS JOIN q
            ORDER BY cos DESC, a.vec_id LIMIT 10)
    SELECT vec_id, floor(cos*10000 + 0.5)/10000 AS cos FROM top"""
  }

  // trained-PQ oracle: replays the hash-sampled init (k seeds = the k
  // smallest md5(id) — DuckDB's md5 of the decimal string agrees with
  // Spark's) and both per-subspace Lloyd's iterations (argmin squared
  // distance via the dot identity, ties to lower codeword; round-6
  // mean recentre), then the q111 ADC read path against the trained
  // codebook
  private val pqTrainedOracle: String = {
    def d2(a: String, b: String) =
      s"list_dot_product($a, $a) - 2*list_dot_product($a, $b) + list_dot_product($b, $b)"
    val iters = (1 to 2).map { t =>
      val prev = s"cb${t - 1}"
      s"""enc$t AS (SELECT vec_id, j, c, sv FROM (
        SELECT sub.vec_id, sub.j, p.c, sub.sv,
               row_number() OVER (PARTITION BY sub.vec_id, sub.j
                 ORDER BY ${d2("sub.sv", "p.w")}, p.c) AS rn
        FROM sub JOIN $prev p ON sub.j = p.j) WHERE rn = 1),
      m$t AS (SELECT j, c, g.pos AS pos,
                     floor(avg(sv[g.pos])*1000000 + 0.5)/1000000 AS val
              FROM enc$t, generate_series(1, 8) AS g(pos)
              GROUP BY j, c, g.pos),
      n$t AS (SELECT j, c, list(val ORDER BY pos) AS w
              FROM m$t GROUP BY j, c),
      cb$t AS (SELECT p.j, p.c, coalesce(n$t.w, p.w) AS w
               FROM $prev p LEFT JOIN n$t ON p.j = n$t.j AND p.c = n$t.c)"""
    }.mkString(",\n")
    s"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb0 AS (SELECT t.j, s.rn - 1 AS c, list_slice(s.v, t.j*8+1, (t.j+1)*8) AS w
            FROM (SELECT v, row_number() OVER (
                    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
                  FROM e) s,
                 generate_series(0, 7) AS t(j)
            WHERE s.rn <= 16),
    sub AS (SELECT e.vec_id, t.j, list_slice(e.v, t.j*8+1, (t.j+1)*8) AS sv
            FROM e, generate_series(0, 7) AS t(j)),
    $iters,
    enc AS (SELECT vec_id, j, c FROM (
        SELECT sub.vec_id, sub.j, p.c,
               row_number() OVER (PARTITION BY sub.vec_id, sub.j
                 ORDER BY ${d2("sub.sv", "p.w")}, p.c) AS rn
        FROM sub JOIN cb2 p ON sub.j = p.j) WHERE rn = 1),
    dt AS (SELECT p.j, p.c, ${d2("list_slice(q.qv, p.j*8+1, (p.j+1)*8)", "p.w")} AS dj
           FROM cb2 p, (SELECT v AS qv FROM e WHERE vec_id = 0) q),
    a AS (SELECT enc.vec_id,
                 list_sum(array_agg(dt.dj ORDER BY enc.j)) AS adist
          FROM enc JOIN dt ON enc.j = dt.j AND enc.c = dt.c
          GROUP BY enc.vec_id),
    top AS (SELECT vec_id, adist FROM a ORDER BY adist, vec_id LIMIT 10)
    SELECT vec_id, floor(adist*1000000 + 0.5)/1000000 AS adist FROM top"""
  }

  private val langidOracle = """
      WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      a AS (SELECT doc_id,
              CAST(sum(CASE WHEN word IN ('the','a','of','and','to') THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
              CAST(sum(CASE WHEN word IN ('el','la','de','y','que') THEN 1 ELSE 0 END) AS BIGINT) AS s_es,
              CAST(sum(CASE WHEN word IN ('der','die','das','und','ist') THEN 1 ELSE 0 END) AS BIGINT) AS s_de
            FROM t GROUP BY doc_id)
      SELECT doc_id, s_en, s_es, s_de,
             CASE WHEN s_en >= greatest(s_es, s_de) THEN 'en'
                  WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS pred_lang
      FROM a ORDER BY doc_id"""

  val oracle: Map[String, String] = Map(
    "q114_ivf_trained" -> ivfTrainedOracle,
    "q115_pq_trained" -> pqTrainedOracle,
    "q84_dup_clusters" -> dupClustersOracle,

    // same tokenization/tie rules as q47; sums cast to BIGINT (DuckDB
    // sum() is HUGEINT) to keep dtype parity with Spark's longs
    "q87_corpus_prep" -> """
      WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      a AS (SELECT doc_id,
              sum(CASE WHEN word IN ('the','a','of','and','to') THEN 1 ELSE 0 END) AS s_en,
              sum(CASE WHEN word IN ('el','la','de','y','que') THEN 1 ELSE 0 END) AS s_es,
              sum(CASE WHEN word IN ('der','die','das','und','ist') THEN 1 ELSE 0 END) AS s_de
            FROM t GROUP BY doc_id),
      lang AS (SELECT doc_id,
                 CASE WHEN s_en >= greatest(s_es, s_de) THEN 'en'
                      WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS pred_lang
               FROM a),
      keep AS (SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
                      max(n_toks) AS n_toks
               FROM (SELECT doc_id, text,
                            len(string_split(text, ' ')) AS n_toks
                     FROM documents)
               WHERE n_toks BETWEEN 5 AND 1000
               GROUP BY text)
      SELECT pred_lang,
             n_toks // 20 AS len_bucket,
             count(*) AS n_docs,
             CAST(sum(n_copies - 1) AS BIGINT) AS n_dupes_removed,
             CAST(sum(n_toks) AS BIGINT) AS total_tokens
      FROM keep JOIN lang ON keep.keep_id = lang.doc_id
      GROUP BY pred_lang, len_bucket ORDER BY pred_lang, len_bucket""",
    "q77_simhash_pairs" -> simhashPairsOracle,
    "q46_ann_lsh" -> annOracle,
    "q70_ann_ivf" -> ivfOracle,
    "q75_ann_multiprobe" -> multiProbeOracle,
    "q76_embed_lsh_pairs" -> lshPairsOracle,
    "q40_dedup_exact" -> """
      SELECT min(doc_id) AS keep_id, count(*) AS n_copies, text
      FROM documents GROUP BY text ORDER BY keep_id""",

    "q41_dedup_minhash" -> s"""
      WITH $shCte, $baseCte, $minhashCtes, $verifyTail""",

    "q42_ngram_jaccard" -> s"""
      WITH $shCte, $baseCte,
      dfreq AS (SELECT k, count(*) AS df FROM keyed GROUP BY k),
      pref AS (SELECT doc_id, k FROM (
                 SELECT keyed.doc_id, keyed.k,
                        row_number() OVER (PARTITION BY keyed.doc_id ORDER BY d.df, keyed.k) AS rn
                 FROM keyed JOIN dfreq d ON keyed.k = d.k)
               WHERE rn <= 3),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM pref a JOIN pref b ON a.k = b.k AND a.doc_id < b.doc_id),
      $verifyTail""",

    "q43_simhash" -> simhashOracle,

    "q44_cosine_topk" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
      SELECT vec_id,
             floor((list_dot_product(v, qv) /
                    (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))))*10000 + 0.5)/10000 AS cos
      FROM e, q
      ORDER BY cos DESC, vec_id LIMIT 10""",

    "q45_embed_pairs" -> """
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
             floor((list_dot_product(a.v, b.v) /
                    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))))*10000 + 0.5)/10000 AS cos
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35
      ORDER BY vec_a, vec_b""",

    "q104_pii_scrub" -> """
      WITH p AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                    || ' or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        FROM documents),
      s AS (
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+\.[a-z]+', '<EMAIL>', 'g'),
                 '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS text
        FROM p)
      SELECT doc_id, md5(text) AS scrubbed_md5,
             (contains(text, '<EMAIL>') AND contains(text, '<PHONE>')) AS masked,
             (NOT regexp_matches(text, '@')
              AND NOT regexp_matches(text, '[0-9]{3}-[0-9]{4}')) AS clean
      FROM s ORDER BY doc_id""",

    // the composed pipeline re-derived stage by stage in SQL
    "q99_curation_v2" -> """
      WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      fv AS (SELECT doc_id,
               unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
                       for i in generate_series(1, len(w) - 4)]) AS g FROM w),
      rep AS (SELECT doc_id, 1.0 - count(DISTINCT g) * 1.0 / count(*) AS dup5_frac
              FROM fv GROUP BY doc_id),
      gated AS (
        SELECT w.doc_id, w.text, CAST(len(w.w) AS BIGINT) AS n_words
        FROM w LEFT JOIN rep ON w.doc_id = rep.doc_id
        WHERE len(w.w) BETWEEN 5 AND 1000
          AND coalesce(rep.dup5_frac, 0.0) < 0.2),
      g4 AS (SELECT doc_id,
               unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                       for i in generate_series(1, len(w) - 3)]) AS g FROM w),
      ev AS (SELECT DISTINCT g FROM g4 WHERE doc_id < 5),
      contaminated AS (SELECT DISTINCT g4.doc_id FROM g4 JOIN ev ON g4.g = ev.g
                       WHERE g4.doc_id >= 5),
      clean AS (SELECT * FROM gated
                WHERE doc_id >= 5
                  AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
      keep AS (SELECT min(doc_id) AS doc_id, count(*) AS n_copies,
                      max(n_words) AS n_words
               FROM clean GROUP BY text),
      t AS (SELECT k.doc_id, unnest(string_split(d.text, ' ')) AS word
            FROM keep k JOIN documents d ON k.doc_id = d.doc_id),
      a AS (SELECT doc_id,
              sum(CASE WHEN word IN ('the','a','of','and','to') THEN 1 ELSE 0 END) AS s_en,
              sum(CASE WHEN word IN ('el','la','de','y','que') THEN 1 ELSE 0 END) AS s_es,
              sum(CASE WHEN word IN ('der','die','das','und','ist') THEN 1 ELSE 0 END) AS s_de
            FROM t GROUP BY doc_id),
      lang AS (SELECT doc_id,
                 CASE WHEN s_en >= greatest(s_es, s_de) THEN 'en'
                      WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS pred_lang
               FROM a),
      sampled AS (
        SELECT k.doc_id, k.n_copies, k.n_words, l.pred_lang
        FROM keep k JOIN lang l ON k.doc_id = l.doc_id
        WHERE CAST(concat('0x', substring(md5(CAST(k.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                / 4294967296.0
              < CASE l.pred_lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.25 ELSE 1.0 END)
      SELECT pred_lang, n_words // 20 AS len_bucket, count(*) AS n_docs,
             CAST(sum(n_copies) AS BIGINT) AS n_source_docs,
             CAST(sum(n_words) AS BIGINT) AS total_tokens
      FROM sampled GROUP BY pred_lang, len_bucket
      ORDER BY pred_lang, len_bucket""",

    // positional n-grams via DuckDB list comprehension (same pattern as
    // the q71 winnowing oracle); identical floor-rounding to 4 digits
    "q95_repetition" -> """
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      bi AS (SELECT doc_id,
               unnest([w[i] || ' ' || w[i+1]
                       for i in generate_series(1, len(w) - 1)]) AS g FROM w),
      bc AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g),
      bagg AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS top2_frac
               FROM bc GROUP BY doc_id),
      fv AS (SELECT doc_id,
               unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
                       for i in generate_series(1, len(w) - 4)]) AS g FROM w),
      fagg AS (SELECT doc_id, 1.0 - count(DISTINCT g) * 1.0 / count(*) AS dup5_frac
               FROM fv GROUP BY doc_id),
      base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words FROM w)
      SELECT base.doc_id, n_words,
             floor(top2_frac*10000 + 0.5)/10000 AS top2_frac,
             floor(dup5_frac*10000 + 0.5)/10000 AS dup5_frac
      FROM base LEFT JOIN bagg USING (doc_id) LEFT JOIN fagg USING (doc_id)
      ORDER BY doc_id""",

    "q96_decontaminate" -> """
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      g AS (SELECT doc_id,
              unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                      for i in generate_series(1, len(w) - 3)]) AS g FROM w),
      ev AS (SELECT DISTINCT g FROM g WHERE doc_id < 5)
      SELECT doc_id, CAST(count(DISTINCT g.g) AS BIGINT) AS n_shared
      FROM g JOIN ev ON g.g = ev.g
      WHERE doc_id >= 5 GROUP BY doc_id ORDER BY doc_id""",

    "q97_sample_stratified" -> """
      WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      a AS (SELECT doc_id,
              sum(CASE WHEN word IN ('the','a','of','and','to') THEN 1 ELSE 0 END) AS s_en,
              sum(CASE WHEN word IN ('el','la','de','y','que') THEN 1 ELSE 0 END) AS s_es,
              sum(CASE WHEN word IN ('der','die','das','und','ist') THEN 1 ELSE 0 END) AS s_de
            FROM t GROUP BY doc_id),
      lang AS (SELECT doc_id,
                 CASE WHEN s_en >= greatest(s_es, s_de) THEN 'en'
                      WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS pred_lang
               FROM a),
      s AS (SELECT doc_id, pred_lang,
              CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                / 4294967296.0 AS u
            FROM lang)
      SELECT doc_id, pred_lang FROM s
      WHERE u < CASE pred_lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.25 ELSE 1.0 END
      ORDER BY doc_id""",

    "q47_langid" -> langidOracle,

    "q48_quality" -> """
      SELECT doc_id, n_chars,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT word) AS BIGINT) AS n_types,
             floor((avg(length(word)))*10000 + 0.5)/10000 AS avg_tok_len,
             floor((sum(CASE WHEN word IN ('the','a','of','and','to') THEN 1 ELSE 0 END)*1.0
                    / count(*))*10000 + 0.5)/10000 AS stop_ratio,
             floor((count(DISTINCT word)*1.0 / count(*))*10000 + 0.5)/10000 AS ttr,
             floor((n_chars*1.0 / count(*))*10000 + 0.5)/10000 AS chars_per_tok
      FROM (SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY doc_id, n_chars ORDER BY doc_id""",

    "q49_token_count" -> """
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re_tokens
      FROM documents ORDER BY doc_id""",

    "q71_winnowing" -> """
      WITH pos AS (
        SELECT doc_id,
               unnest([struct_pack(pos := i,
                        h := CAST(concat('0x', substring(md5(w[i] || ' ' || w[i+1]), 1, 8)) AS BIGINT))
                       for i in generate_series(1, len(w) - 1)],
                      recursive := true)
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      wins AS (
        SELECT doc_id,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
               count(*) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
        FROM pos),
      fp AS (SELECT DISTINCT doc_id, wmin AS fp FROM wins WHERE wn = 4)
      SELECT doc_id, count(*) AS n_fp, min(fp) AS min_fp
      FROM fp GROUP BY doc_id ORDER BY doc_id""",

    "q74_tfidf" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                    FROM documents),
      t AS (SELECT * FROM toks WHERE length(term) > 0),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
      df AS (SELECT term, count(*) AS df
             FROM (SELECT DISTINCT doc_id, term FROM t) GROUP BY term),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (SELECT doc_id, term,
                        floor((tf * ln(n_docs * 1.0 / df))*1000000 + 0.5)/1000000 AS tfidf
                 FROM tf JOIN df USING (term), n),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY tfidf DESC, term) AS rk FROM scored)
      SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tfidf
      FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""",

    "q50_fingerprint" -> """
      SELECT min(doc_id) AS keep_id, count(*) AS n_docs,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
      FROM documents GROUP BY fp ORDER BY keep_id""",

    // replays the deterministic quantizer: centroids = vec_id < 8, each
    // vector argmax-assigned by cosine (ties -> lower centroid id), then
    // the same lower-id-witness pairwise threshold within cells
    "q108_semantic_dedup" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
      asg AS (
        SELECT vec_id, v,
               (SELECT cid FROM c
                ORDER BY list_dot_product(e.v, c.cv) /
                         (sqrt(list_dot_product(e.v, e.v)) *
                          sqrt(list_dot_product(c.cv, c.cv))) DESC, cid
                LIMIT 1) AS cell
        FROM e),
      dups AS (
        SELECT DISTINCT a.vec_id FROM asg a JOIN asg b USING (cell)
        WHERE b.vec_id < a.vec_id
          AND list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) *
               sqrt(list_dot_product(b.v, b.v))) >= 0.95)
      SELECT cell, count(*) AS n,
             CAST(count(*) FILTER (WHERE vec_id IN (SELECT vec_id FROM dups))
                  AS BIGINT) AS n_dup
      FROM asg GROUP BY cell ORDER BY cell""",

    "q109_sequence_pack" -> """
      WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                 FROM documents)
      SELECT doc_id, shard, n_tok,
             CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tok
                  AS BIGINT) AS start_off,
             CAST(floor((sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) - n_tok)
                        / 512) AS BIGINT) AS seq_id
      FROM t ORDER BY doc_id""",

    "q112_bm25" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                    FROM documents),
      dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
             FROM toks GROUP BY doc_id),
      stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
      tf AS (SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS tf
             FROM toks WHERE word IN ('hash', 'join', 'scan')
             GROUP BY doc_id, word),
      dfreq AS (SELECT word, CAST(count(*) AS DOUBLE) AS df
                FROM tf GROUP BY word),
      s AS (SELECT tf.doc_id, tf.word,
                   ln((n - df + 0.5)/(df + 0.5) + 1.0) * tf * (1.2 + 1.0)
                     / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS s
            FROM tf JOIN dfreq USING (word) JOIN dl USING (doc_id), stats)
      SELECT doc_id,
             floor(list_sum(array_agg(s ORDER BY word))*1000000 + 0.5)/1000000
               AS bm25
      FROM s GROUP BY doc_id ORDER BY doc_id""",

    // plain exact GROUP BY HAVING — the sketch is invisible to results
    "q147_heavy_hitters" -> """
      SELECT word, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word HAVING count(*) >= 940
      ORDER BY word""",

    // same model weights as VALUES, same term-ordered fold, same
    // sigmoid; unmatched docs score sigmoid(bias) via the left join
    "q145_quality_classifier" -> """
      WITH w(term, weight) AS (VALUES
        ('table', 0.8), ('query', 0.6), ('data', 0.5), ('join', 0.7),
        ('slow', -1.2), ('error', -1.5), ('a', -0.3), ('the', -0.2)),
      toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
               FROM documents),
      dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
             FROM toks GROUP BY doc_id),
      c AS (SELECT doc_id, term,
                   CAST(count(*) AS DOUBLE) * first(weight) AS c
            FROM toks JOIN w ON word = term
            GROUP BY doc_id, term),
      num AS (SELECT doc_id, list_sum(array_agg(c ORDER BY term)) AS num
              FROM c GROUP BY doc_id)
      SELECT dl.doc_id,
             floor((1.0 / (1.0 + exp(-(-0.1 + coalesce(num, 0.0) / dl))))
                   * 1000000 + 0.5) / 1000000 AS score
      FROM dl LEFT JOIN num ON dl.doc_id = num.doc_id
      ORDER BY dl.doc_id""",

    // PQ oracle: same borrowed codebook (vec_id < 16), same subvector
    // slices, same dot-identity squared distance, same tie-break
    "q110_pq_encode" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cb AS (SELECT t.j, c.vec_id AS c,
                    list_slice(c.v, t.j*8+1, (t.j+1)*8) AS w
             FROM (SELECT vec_id, v FROM e WHERE vec_id < 16) c,
                  generate_series(0, 7) AS t(j)),
      d AS (SELECT vec_id, j, c,
                   list_dot_product(sv, sv) - 2*list_dot_product(sv, w)
                     + list_dot_product(w, w) AS dist
            FROM (SELECT e.vec_id, cb.j, cb.c, cb.w,
                         list_slice(e.v, cb.j*8+1, (cb.j+1)*8) AS sv
                  FROM e, cb) AS sub),
      best AS (SELECT vec_id, j, c,
                      row_number() OVER (PARTITION BY vec_id, j
                                         ORDER BY dist, c) AS rn
               FROM d)
      SELECT vec_id, string_agg(c::VARCHAR, ',' ORDER BY j) AS codes
      FROM best WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""",

    "q111_pq_adc_topk" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cb AS (SELECT t.j, c.vec_id AS c,
                    list_slice(c.v, t.j*8+1, (t.j+1)*8) AS w
             FROM (SELECT vec_id, v FROM e WHERE vec_id < 16) c,
                  generate_series(0, 7) AS t(j)),
      d AS (SELECT vec_id, j, c,
                   list_dot_product(sv, sv) - 2*list_dot_product(sv, w)
                     + list_dot_product(w, w) AS dist
            FROM (SELECT e.vec_id, cb.j, cb.c, cb.w,
                         list_slice(e.v, cb.j*8+1, (cb.j+1)*8) AS sv
                  FROM e, cb) AS sub),
      enc AS (SELECT vec_id, j, c FROM (
                SELECT vec_id, j, c,
                       row_number() OVER (PARTITION BY vec_id, j
                                          ORDER BY dist, c) AS rn
                FROM d) WHERE rn = 1),
      dt AS (SELECT j, c,
                    list_dot_product(sq, sq) - 2*list_dot_product(sq, w)
                      + list_dot_product(w, w) AS dj
             FROM (SELECT cb.j, cb.c, cb.w,
                          list_slice(q.qv, cb.j*8+1, (cb.j+1)*8) AS sq
                   FROM cb, (SELECT v AS qv FROM e WHERE vec_id = 0) q)
                  AS qsub),
      a AS (SELECT enc.vec_id,
                   list_sum(array_agg(dt.dj ORDER BY enc.j)) AS adist
            FROM enc JOIN dt ON enc.j = dt.j AND enc.c = dt.c
            GROUP BY enc.vec_id)
      SELECT vec_id, floor(adist*1000000 + 0.5)/1000000 AS adist
      FROM a ORDER BY a.adist, vec_id LIMIT 10""",

    // list_slice is END-inclusive in DuckDB (Spark's slice takes a
    // LENGTH) — hence start+1 .. start+64
    "q127_doc_chunking" -> """
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      n AS (SELECT doc_id, toks,
                   greatest(1, CAST(ceil((len(toks) - 16) / 48.0) AS BIGINT))
                     AS nc
            FROM d),
      c AS (SELECT doc_id, toks,
                   unnest(generate_series(0, nc - 1)) AS chunk_id
            FROM n),
      x AS (SELECT doc_id, chunk_id, chunk_id * 48 AS tok_start,
                   array_to_string(
                     list_slice(toks, chunk_id*48 + 1, chunk_id*48 + 64),
                     ' ') AS chunk_text
            FROM c)
      SELECT doc_id, chunk_id, tok_start, chunk_text,
             len(string_split(chunk_text, ' ')) AS n_tok
      FROM x ORDER BY doc_id, chunk_id""",

    // q111's encode/ADC CTEs with a qid-keyed distance table
    "q126_pq_adc_batch" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
      cb AS (SELECT t.j, c.vec_id AS c,
                    list_slice(c.v, t.j*8+1, (t.j+1)*8) AS w
             FROM (SELECT vec_id, v FROM e WHERE vec_id < 16) c,
                  generate_series(0, 7) AS t(j)),
      d AS (SELECT vec_id, j, c,
                   list_dot_product(sv, sv) - 2*list_dot_product(sv, w)
                     + list_dot_product(w, w) AS dist
            FROM (SELECT e.vec_id, cb.j, cb.c, cb.w,
                         list_slice(e.v, cb.j*8+1, (cb.j+1)*8) AS sv
                  FROM e, cb) AS sub),
      enc AS (SELECT vec_id, j, c FROM (
                SELECT vec_id, j, c,
                       row_number() OVER (PARTITION BY vec_id, j
                                          ORDER BY dist, c) AS rn
                FROM d) WHERE rn = 1),
      dt AS (SELECT qid, j, c,
                    list_dot_product(sq, sq) - 2*list_dot_product(sq, w)
                      + list_dot_product(w, w) AS dj
             FROM (SELECT qs.qid, cb.j, cb.c, cb.w,
                          list_slice(qs.qv, cb.j*8+1, (cb.j+1)*8) AS sq
                   FROM cb, qs) AS qsub),
      a AS (SELECT dt.qid, enc.vec_id,
                   list_sum(array_agg(dt.dj ORDER BY enc.j)) AS adist
            FROM enc JOIN dt ON enc.j = dt.j AND enc.c = dt.c
            GROUP BY dt.qid, enc.vec_id),
      rk AS (SELECT qid, vec_id, adist,
                    row_number() OVER (PARTITION BY qid
                                       ORDER BY adist, vec_id) AS rn
             FROM a)
      SELECT qid, vec_id, floor(adist*1000000 + 0.5)/1000000 AS adist
      FROM rk WHERE rn <= 5
      ORDER BY qid, adist, vec_id""",

    // q126's CTEs with a per-qid LIMIT-30 shortlist, re-ranked exactly
    "q132_pq_refine_batch" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
      cb AS (SELECT t.j, c.vec_id AS c,
                    list_slice(c.v, t.j*8+1, (t.j+1)*8) AS w
             FROM (SELECT vec_id, v FROM e WHERE vec_id < 16) c,
                  generate_series(0, 7) AS t(j)),
      d AS (SELECT vec_id, j, c,
                   list_dot_product(sv, sv) - 2*list_dot_product(sv, w)
                     + list_dot_product(w, w) AS dist
            FROM (SELECT e.vec_id, cb.j, cb.c, cb.w,
                         list_slice(e.v, cb.j*8+1, (cb.j+1)*8) AS sv
                  FROM e, cb) AS sub),
      enc AS (SELECT vec_id, j, c FROM (
                SELECT vec_id, j, c,
                       row_number() OVER (PARTITION BY vec_id, j
                                          ORDER BY dist, c) AS rn
                FROM d) WHERE rn = 1),
      dt AS (SELECT qid, j, c,
                    list_dot_product(sq, sq) - 2*list_dot_product(sq, w)
                      + list_dot_product(w, w) AS dj
             FROM (SELECT qs.qid, cb.j, cb.c, cb.w,
                          list_slice(qs.qv, cb.j*8+1, (cb.j+1)*8) AS sq
                   FROM cb, qs) AS qsub),
      a AS (SELECT dt.qid, enc.vec_id,
                   list_sum(array_agg(dt.dj ORDER BY enc.j)) AS adist
            FROM enc JOIN dt ON enc.j = dt.j AND enc.c = dt.c
            GROUP BY dt.qid, enc.vec_id),
      short AS (SELECT qid, vec_id FROM (
                  SELECT qid, vec_id,
                         row_number() OVER (PARTITION BY qid
                                            ORDER BY adist, vec_id) AS rn
                  FROM a) WHERE rn <= 30),
      sc AS (SELECT s.qid, s.vec_id,
                    list_dot_product(e.v, qs.qv) /
                      (sqrt(list_dot_product(e.v, e.v)) *
                       sqrt(list_dot_product(qs.qv, qs.qv))) AS cos
             FROM short s JOIN e ON e.vec_id = s.vec_id
                          JOIN qs ON qs.qid = s.qid),
      rk AS (SELECT qid, vec_id, cos,
                    row_number() OVER (PARTITION BY qid
                                       ORDER BY cos DESC, vec_id) AS rn
             FROM sc)
      SELECT qid, vec_id, floor(cos*10000 + 0.5)/10000 AS cos
      FROM rk WHERE rn <= 5
      ORDER BY qid, cos DESC, vec_id""",

    "q124_ann_batch" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
      sc AS (SELECT qs.qid, e.vec_id,
                    list_dot_product(e.v, qs.qv) /
                      (sqrt(list_dot_product(e.v, e.v)) *
                       sqrt(list_dot_product(qs.qv, qs.qv))) AS cos
             FROM e CROSS JOIN qs),
      rk AS (SELECT qid, vec_id, cos,
                    row_number() OVER (PARTITION BY qid
                                       ORDER BY cos DESC, vec_id) AS rn
             FROM sc)
      SELECT qid, vec_id, floor(cos*10000 + 0.5)/10000 AS cos
      FROM rk WHERE rn <= 5
      ORDER BY qid, cos DESC, vec_id""",

    "q125_ann_batch_ivf" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cents AS (SELECT CAST(vec_id // 7 AS BIGINT) AS cid, v AS cv
                FROM e WHERE vec_id % 7 = 0 AND vec_id // 7 < 16),
      qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
      assign AS (
        SELECT vec_id, v, cid FROM (
          SELECT e.vec_id, e.v, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   list_dot_product(e.v, c.cv) /
                     (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
                   DESC, c.cid) AS rn
          FROM e CROSS JOIN cents c)
        WHERE rn = 1),
      pc AS (SELECT qs.qid, c.cid,
                    list_dot_product(qs.qv, c.cv) /
                      (sqrt(list_dot_product(qs.qv, qs.qv)) *
                       sqrt(list_dot_product(c.cv, c.cv))) AS ccos
             FROM qs CROSS JOIN cents c),
      probes AS (SELECT qid, cid FROM (
                   SELECT qid, cid,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY ccos DESC, cid) AS rn
                   FROM pc) WHERE rn <= 4),
      sc AS (SELECT p.qid, a.vec_id,
                    list_dot_product(a.v, qs.qv) /
                      (sqrt(list_dot_product(a.v, a.v)) *
                       sqrt(list_dot_product(qs.qv, qs.qv))) AS cos
             FROM assign a JOIN probes p ON a.cid = p.cid
                  JOIN qs ON qs.qid = p.qid),
      rk AS (SELECT qid, vec_id, cos,
                    row_number() OVER (PARTITION BY qid
                                       ORDER BY cos DESC, vec_id) AS rn
             FROM sc)
      SELECT qid, vec_id, floor(cos*10000 + 0.5)/10000 AS cos
      FROM rk WHERE rn <= 5
      ORDER BY qid, cos DESC, vec_id""",

    "q123_semantic_decontaminate" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ev AS (SELECT v AS evv FROM e WHERE vec_id % 50 = 0),
      tr AS (SELECT vec_id, v FROM e WHERE vec_id % 50 <> 0),
      m AS (SELECT tr.vec_id,
                   max(list_dot_product(tr.v, ev.evv) /
                     (sqrt(list_dot_product(tr.v, tr.v)) *
                      sqrt(list_dot_product(ev.evv, ev.evv)))) AS mc
            FROM tr CROSS JOIN ev GROUP BY tr.vec_id),
      rmax AS (SELECT vec_id,
                      floor(mc*10000 + 0.5)/10000 AS max_eval_cos
               FROM m)
      SELECT vec_id, max_eval_cos, max_eval_cos >= 0.35 AS contaminated
      FROM rmax ORDER BY vec_id""",

    // q70's probe CTEs composed with q111's ADC CTEs: encode only the
    // candidates (identical rows to encoding all then filtering — the
    // codes are per-vector constants)
    "q121_ivfpq_search" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cents AS (SELECT CAST(vec_id // 7 AS BIGINT) AS cid, v AS cv
                FROM e WHERE vec_id % 7 = 0 AND vec_id // 7 < 16),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      assign AS (
        SELECT vec_id, v, cid FROM (
          SELECT e.vec_id, e.v, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   list_dot_product(e.v, c.cv) /
                     (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
                   DESC, c.cid) AS rn
          FROM e CROSS JOIN cents c)
        WHERE rn = 1),
      probes AS (
        SELECT cid FROM (
          SELECT c.cid,
                 list_dot_product(q.qv, c.cv) /
                   (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) AS ccos
          FROM q CROSS JOIN cents c
          ORDER BY ccos DESC, c.cid LIMIT 4)),
      cand AS (SELECT a.vec_id, a.v FROM assign a JOIN probes p ON a.cid = p.cid),
      cb AS (SELECT t.j, c.vec_id AS c,
                    list_slice(c.v, t.j*8+1, (t.j+1)*8) AS w
             FROM (SELECT vec_id, v FROM e WHERE vec_id < 16) c,
                  generate_series(0, 7) AS t(j)),
      d AS (SELECT vec_id, j, c,
                   list_dot_product(sv, sv) - 2*list_dot_product(sv, w)
                     + list_dot_product(w, w) AS dist
            FROM (SELECT cand.vec_id, cb.j, cb.c, cb.w,
                         list_slice(cand.v, cb.j*8+1, (cb.j+1)*8) AS sv
                  FROM cand, cb) AS sub),
      enc AS (SELECT vec_id, j, c FROM (
                SELECT vec_id, j, c,
                       row_number() OVER (PARTITION BY vec_id, j
                                          ORDER BY dist, c) AS rn
                FROM d) WHERE rn = 1),
      dt AS (SELECT j, c,
                    list_dot_product(sq, sq) - 2*list_dot_product(sq, w)
                      + list_dot_product(w, w) AS dj
             FROM (SELECT cb.j, cb.c, cb.w,
                          list_slice(q.qv, cb.j*8+1, (cb.j+1)*8) AS sq
                   FROM cb, q) AS qsub),
      a AS (SELECT enc.vec_id,
                   list_sum(array_agg(dt.dj ORDER BY enc.j)) AS adist
            FROM enc JOIN dt ON enc.j = dt.j AND enc.c = dt.c
            GROUP BY enc.vec_id)
      SELECT vec_id, floor(adist*1000000 + 0.5)/1000000 AS adist
      FROM a ORDER BY a.adist, vec_id LIMIT 10""",

    // q111's ADC CTEs with LIMIT 30 → exact cosine re-rank of the
    // shortlist (the refine tail)
    "q129_pq_refine" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cb AS (SELECT t.j, c.vec_id AS c,
                    list_slice(c.v, t.j*8+1, (t.j+1)*8) AS w
             FROM (SELECT vec_id, v FROM e WHERE vec_id < 16) c,
                  generate_series(0, 7) AS t(j)),
      d AS (SELECT vec_id, j, c,
                   list_dot_product(sv, sv) - 2*list_dot_product(sv, w)
                     + list_dot_product(w, w) AS dist
            FROM (SELECT e.vec_id, cb.j, cb.c, cb.w,
                         list_slice(e.v, cb.j*8+1, (cb.j+1)*8) AS sv
                  FROM e, cb) AS sub),
      enc AS (SELECT vec_id, j, c FROM (
                SELECT vec_id, j, c,
                       row_number() OVER (PARTITION BY vec_id, j
                                          ORDER BY dist, c) AS rn
                FROM d) WHERE rn = 1),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      dt AS (SELECT j, c,
                    list_dot_product(sq, sq) - 2*list_dot_product(sq, w)
                      + list_dot_product(w, w) AS dj
             FROM (SELECT cb.j, cb.c, cb.w,
                          list_slice(q.qv, cb.j*8+1, (cb.j+1)*8) AS sq
                   FROM cb, q) AS qsub),
      a AS (SELECT enc.vec_id,
                   list_sum(array_agg(dt.dj ORDER BY enc.j)) AS adist
            FROM enc JOIN dt ON enc.j = dt.j AND enc.c = dt.c
            GROUP BY enc.vec_id),
      short AS (SELECT vec_id FROM a ORDER BY adist, vec_id LIMIT 30),
      top AS (SELECT e.vec_id,
                     list_dot_product(e.v, q.qv) /
                       (sqrt(list_dot_product(e.v, e.v)) *
                        sqrt(list_dot_product(q.qv, q.qv))) AS cos
              FROM e JOIN short USING (vec_id) CROSS JOIN q
              ORDER BY cos DESC, e.vec_id LIMIT 10)
      SELECT vec_id, floor(cos*10000 + 0.5)/10000 AS cos FROM top""",

    // q121's CTEs with LIMIT 30 → exact cosine re-rank of the shortlist
    "q130_ivfpq_refine" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cents AS (SELECT CAST(vec_id // 7 AS BIGINT) AS cid, v AS cv
                FROM e WHERE vec_id % 7 = 0 AND vec_id // 7 < 16),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      assign AS (
        SELECT vec_id, v, cid FROM (
          SELECT e.vec_id, e.v, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   list_dot_product(e.v, c.cv) /
                     (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
                   DESC, c.cid) AS rn
          FROM e CROSS JOIN cents c)
        WHERE rn = 1),
      probes AS (
        SELECT cid FROM (
          SELECT c.cid,
                 list_dot_product(q.qv, c.cv) /
                   (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) AS ccos
          FROM q CROSS JOIN cents c
          ORDER BY ccos DESC, c.cid LIMIT 4)),
      cand AS (SELECT a.vec_id, a.v FROM assign a JOIN probes p ON a.cid = p.cid),
      cb AS (SELECT t.j, c.vec_id AS c,
                    list_slice(c.v, t.j*8+1, (t.j+1)*8) AS w
             FROM (SELECT vec_id, v FROM e WHERE vec_id < 16) c,
                  generate_series(0, 7) AS t(j)),
      d AS (SELECT vec_id, j, c,
                   list_dot_product(sv, sv) - 2*list_dot_product(sv, w)
                     + list_dot_product(w, w) AS dist
            FROM (SELECT cand.vec_id, cb.j, cb.c, cb.w,
                         list_slice(cand.v, cb.j*8+1, (cb.j+1)*8) AS sv
                  FROM cand, cb) AS sub),
      enc AS (SELECT vec_id, j, c FROM (
                SELECT vec_id, j, c,
                       row_number() OVER (PARTITION BY vec_id, j
                                          ORDER BY dist, c) AS rn
                FROM d) WHERE rn = 1),
      dt AS (SELECT j, c,
                    list_dot_product(sq, sq) - 2*list_dot_product(sq, w)
                      + list_dot_product(w, w) AS dj
             FROM (SELECT cb.j, cb.c, cb.w,
                          list_slice(q.qv, cb.j*8+1, (cb.j+1)*8) AS sq
                   FROM cb, q) AS qsub),
      a AS (SELECT enc.vec_id,
                   list_sum(array_agg(dt.dj ORDER BY enc.j)) AS adist
            FROM enc JOIN dt ON enc.j = dt.j AND enc.c = dt.c
            GROUP BY enc.vec_id),
      short AS (SELECT vec_id FROM a ORDER BY adist, vec_id LIMIT 30),
      top AS (SELECT e.vec_id,
                     list_dot_product(e.v, q.qv) /
                       (sqrt(list_dot_product(e.v, e.v)) *
                        sqrt(list_dot_product(q.qv, q.qv))) AS cos
              FROM e JOIN short USING (vec_id) CROSS JOIN q
              ORDER BY cos DESC, e.vec_id LIMIT 10)
      SELECT vec_id, floor(cos*10000 + 0.5)/10000 AS cos FROM top""",

    // q121's CTEs with the RESIDUAL encoding: rv = v − cv(assigned cell),
    // codebook from the first-16 ids' residuals, per-probed-cell query
    // residual distance table keyed (cid, j, c)
    "q140_ivfpq_residual" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cents AS (SELECT CAST(vec_id // 7 AS BIGINT) AS cid, v AS cv
                FROM e WHERE vec_id % 7 = 0 AND vec_id // 7 < 16),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      assign AS (
        SELECT vec_id, v, cid, cv FROM (
          SELECT e.vec_id, e.v, c.cid, c.cv,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   list_dot_product(e.v, c.cv) /
                     (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
                   DESC, c.cid) AS rn
          FROM e CROSS JOIN cents c)
        WHERE rn = 1),
      res AS (SELECT vec_id, cid,
                     list_transform(range(1, 65), i -> v[i] - cv[i]) AS rv
              FROM assign),
      cb AS (SELECT t.j, r.vec_id AS c,
                    list_slice(r.rv, t.j*8+1, (t.j+1)*8) AS w
             FROM (SELECT vec_id, rv FROM res WHERE vec_id < 16) r,
                  generate_series(0, 7) AS t(j)),
      d AS (SELECT vec_id, cid, j, c,
                   list_dot_product(sv, sv) - 2*list_dot_product(sv, w)
                     + list_dot_product(w, w) AS dist
            FROM (SELECT res.vec_id, res.cid, cb.j, cb.c, cb.w,
                         list_slice(res.rv, cb.j*8+1, (cb.j+1)*8) AS sv
                  FROM res, cb) AS sub),
      enc AS (SELECT vec_id, cid, j, c FROM (
                SELECT vec_id, cid, j, c,
                       row_number() OVER (PARTITION BY vec_id, j
                                          ORDER BY dist, c) AS rn
                FROM d) WHERE rn = 1),
      probes AS (
        SELECT cid, cv FROM (
          SELECT c.cid, c.cv,
                 list_dot_product(q.qv, c.cv) /
                   (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) AS ccos
          FROM q CROSS JOIN cents c
          ORDER BY ccos DESC, c.cid LIMIT 4)),
      qres AS (SELECT p.cid,
                      list_transform(range(1, 65), i -> q.qv[i] - p.cv[i]) AS qr
               FROM probes p CROSS JOIN q),
      dt AS (SELECT cid, j, c,
                    list_dot_product(sq, sq) - 2*list_dot_product(sq, w)
                      + list_dot_product(w, w) AS dj
             FROM (SELECT qres.cid, cb.j, cb.c, cb.w,
                          list_slice(qres.qr, cb.j*8+1, (cb.j+1)*8) AS sq
                   FROM qres, cb) AS qsub),
      a AS (SELECT enc.vec_id,
                   list_sum(array_agg(dt.dj ORDER BY enc.j)) AS adist
            FROM enc JOIN dt ON enc.cid = dt.cid AND enc.j = dt.j
                            AND enc.c = dt.c
            GROUP BY enc.vec_id)
      SELECT vec_id, floor(adist*1000000 + 0.5)/1000000 AS adist
      FROM a ORDER BY a.adist, vec_id LIMIT 10""",

    "q51_multimodal" -> """
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                  ELSE 'gif' END AS format,
             CAST(16 + doc_id % 64 AS BIGINT) AS width,
             CAST(12 + (doc_id * 7) % 48 AS BIGINT) AS height,
             CAST(CASE WHEN doc_id % 3 = 1 THEN 1
                       ELSE 1 + doc_id % 4 END AS BIGINT) AS n_frames
      FROM documents ORDER BY doc_id""",

    "q68_frame_sample" -> """
      WITH m AS (SELECT doc_id,
                        CASE WHEN doc_id % 3 = 1 THEN 1
                             ELSE 1 + doc_id % 4 END AS fr
                 FROM documents)
      SELECT doc_id,
             CAST(unnest(generate_series(1, fr, 2)) AS BIGINT) AS frame_idx,
             CAST(16 + doc_id % 64 AS BIGINT) AS width,
             CAST(12 + (doc_id * 7) % 48 AS BIGINT) AS height
      FROM m ORDER BY doc_id, frame_idx""",

    "q69_resize" -> """
      WITH m AS (SELECT doc_id,
                        CAST(16 + doc_id % 64 AS BIGINT) AS w,
                        CAST(12 + (doc_id * 7) % 48 AS BIGINT) AS h
                 FROM documents)
      SELECT doc_id, w AS width, h AS height,
             CASE WHEN w <= 40 AND h <= 30 THEN w
                  WHEN w * 30 >= h * 40 THEN 40
                  ELSE greatest(1, (w * 30) // h) END AS out_width,
             CASE WHEN w <= 40 AND h <= 30 THEN h
                  WHEN w * 30 >= h * 40 THEN greatest(1, (h * 40) // w)
                  ELSE 30 END AS out_height
      FROM m ORDER BY doc_id""",

    "q133_audio_meta" -> """
      WITH a AS (SELECT doc_id,
                        CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sr,
                        CAST(1 + doc_id % 2 AS BIGINT) AS ch,
                        CAST(1600 + (doc_id * 13) % 800 AS BIGINT) AS n
                 FROM documents)
      SELECT doc_id, 'wav' AS format, sr AS sample_rate, ch AS channels,
             n AS n_samples, (n * 1000) // sr AS duration_ms
      FROM a ORDER BY doc_id""",

    "q134_video_meta" -> """
      WITH v AS (SELECT doc_id,
                        CAST(3000 + (doc_id * 17) % 6000 AS BIGINT) AS dur
                 FROM documents)
      SELECT doc_id, 'mp4' AS format, (dur * 1000) // 600 AS duration_ms,
             CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks
      FROM v ORDER BY doc_id""",

    // same add-one unigram LM; the per-doc sum runs over the word-
    // sorted list (list_sum(array_agg(ORDER BY word))) to mirror the
    // Spark side's sorted-struct aggregate bit for bit
    "q137_lm_perplexity" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                    FROM documents),
      counts AS (SELECT word, CAST(count(*) AS DOUBLE) AS c
                 FROM toks GROUP BY word),
      stats AS (SELECT sum(c) AS n, CAST(count(*) AS DOUBLE) AS v FROM counts),
      tf AS (SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS tf
             FROM toks GROUP BY doc_id, word),
      s AS (SELECT doc_id, word, tf, -ln((c + 1.0)/(n + v)) * tf AS b
            FROM tf JOIN counts USING (word), stats)
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             floor((list_sum(array_agg(b ORDER BY word)) / sum(tf))*1000000
                   + 0.5)/1000000 AS cross_entropy,
             floor(exp(list_sum(array_agg(b ORDER BY word)) / sum(tf))*10000
                   + 0.5)/10000 AS ppl
      FROM s GROUP BY doc_id ORDER BY doc_id""",

    // the bloom is a prefilter only (no false negatives; positives are
    // removed by the exact semi-join) — the oracle is the plain exact
    // 3-gram decontamination join
    "q135_bloom_decontaminate" -> """
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      g AS (SELECT doc_id,
              unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                      for i in generate_series(1, len(w) - 2)]) AS g FROM w),
      ev AS (SELECT DISTINCT g FROM g WHERE doc_id < 10)
      SELECT doc_id, CAST(count(DISTINCT g.g) AS BIGINT) AS n_shared
      FROM g JOIN ev ON g.g = ev.g
      WHERE doc_id >= 10 GROUP BY doc_id ORDER BY doc_id""",

    // exact substring dedup: 6-token windows duplicated anywhere in the
    // corpus (>= 2 occurrences, same doc counts), merged per doc into
    // maximal covered spans — starts p < q chain iff q <= p + k
    "q150_substring_spans" -> """
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      g AS (SELECT doc_id,
              unnest([struct_pack(pos := i,
                       gram := array_to_string(toks[i:i+5], ' '))
                      for i in generate_series(1, len(toks) - 5)],
                     recursive := true)
            FROM w),
      d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
      m AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM d)),
      b AS (SELECT doc_id, pos,
              CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                        IS NULL
                   OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                        > 6
                   THEN 1 ELSE 0 END AS brk
            FROM m),
      isl AS (SELECT doc_id, pos,
                sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
              FROM b)
      SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
             CAST(max(pos) + 6 - min(pos) AS BIGINT) AS span_len,
             count(*) AS n_windows
      FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""",

    // the corpus rewrite: tokens inside any duplicated span dropped,
    // order preserved; documents without spans byte-identical, fully-
    // covered documents come back empty (left join + coalesce)
    "q151_substring_scrub" -> """
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      g AS (SELECT doc_id,
              unnest([struct_pack(pos := i,
                       gram := array_to_string(toks[i:i+5], ' '))
                      for i in generate_series(1, len(toks) - 5)],
                     recursive := true)
            FROM w),
      d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
      m AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM d)),
      b AS (SELECT doc_id, pos,
              CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                        IS NULL
                   OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                        > 6
                   THEN 1 ELSE 0 END AS brk
            FROM m),
      isl AS (SELECT doc_id, pos,
                sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
              FROM b),
      sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 5 AS e
             FROM isl GROUP BY doc_id, grp),
      tok AS (SELECT doc_id,
                unnest([struct_pack(pos := i, tok := toks[i])
                        for i in generate_series(1, len(toks))],
                       recursive := true)
              FROM w),
      kept AS (SELECT t.doc_id, t.pos, t.tok
               FROM tok t
               WHERE NOT EXISTS (SELECT 1 FROM sp
                                 WHERE sp.doc_id = t.doc_id
                                   AND t.pos BETWEEN sp.s AND sp.e)),
      agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS ct
              FROM kept GROUP BY doc_id),
      rm AS (SELECT doc_id, sum(e - s + 1) AS nr FROM sp GROUP BY doc_id)
      SELECT d.doc_id, coalesce(agg.ct, '') AS clean_text,
             CAST(coalesce(rm.nr, 0) AS BIGINT) AS n_removed
      FROM documents d
      LEFT JOIN agg ON agg.doc_id = d.doc_id
      LEFT JOIN rm ON rm.doc_id = d.doc_id
      ORDER BY d.doc_id""",

    // largest-remainder apportionment replayed in SQL (weights are
    // exact binary fractions: every product/floor/remainder is exact,
    // so the two engines' quota math is bit-identical), then the same
    // md5-priority rank per length bucket
    "q152_mixture_sample" -> """
      WITH dom AS (SELECT doc_id,
                     CASE WHEN n_chars < 250 THEN 'short'
                          WHEN n_chars < 400 THEN 'mid'
                          ELSE 'long' END AS bucket
                   FROM documents),
      wt(bucket, w) AS (VALUES ('short', 0.5), ('mid', 0.3125),
                               ('long', 0.1875)),
      ws AS (SELECT sum(w) AS s FROM wt),
      ex AS (SELECT bucket, 97 * w / s AS ex FROM wt, ws),
      fl AS (SELECT bucket, floor(ex) AS b, ex - floor(ex) AS rem FROM ex),
      rk AS (SELECT bucket, b,
               row_number() OVER (ORDER BY rem DESC, bucket) AS r FROM fl),
      lf AS (SELECT 97 - sum(b) AS l FROM fl),
      quota AS (SELECT bucket,
                  b + CASE WHEN r <= l THEN 1 ELSE 0 END AS quota
                FROM rk, lf),
      ranked AS (SELECT doc_id, bucket,
                   row_number() OVER (PARTITION BY bucket
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS prk
                 FROM dom)
      SELECT bucket, doc_id
      FROM ranked JOIN quota USING (bucket)
      WHERE prk <= quota ORDER BY bucket, doc_id""",

    // the same length buckets + TTR, threshold = exact interpolated
    // 0.4-quantile per bucket (quantile_cont = Spark percentile)
    "q153_quantile_gate" -> """
      WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents),
      dom AS (SELECT doc_id,
                CASE WHEN n_chars < 250 THEN 'short'
                     WHEN n_chars < 400 THEN 'mid'
                     ELSE 'long' END AS bucket
              FROM documents),
      ttr AS (SELECT doc_id, count(DISTINCT word) * 1.0 / count(*) AS ttr
              FROM t GROUP BY doc_id),
      j AS (SELECT dom.doc_id, bucket, ttr
            FROM dom JOIN ttr USING (doc_id)),
      thr AS (SELECT bucket, quantile_cont(ttr, 0.4) AS th
              FROM j GROUP BY bucket)
      SELECT bucket, doc_id, floor(ttr*10000 + 0.5)/10000 AS ttr
      FROM j JOIN thr USING (bucket)
      WHERE ttr >= th ORDER BY bucket, doc_id""",

    // same rolling-hash boundary rule: 32-bit md5 prefix of each
    // 3-token window, boundary when ≡ 0 mod 16, chunk index = count of
    // boundaries strictly before the window start
    "q154_cdc_chunks" -> """
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
      g AS (SELECT doc_id,
              unnest([struct_pack(pos := i,
                       h := CAST(concat('0x', substring(md5(
                              array_to_string(toks[i:i+2], ' ')), 1, 8))
                            AS BIGINT))
                      for i in generate_series(1, len(toks) - 2)],
                     recursive := true)
            FROM w),
      b AS (SELECT doc_id, pos,
              CASE WHEN h % 16 = 0 THEN 1 ELSE 0 END AS bf FROM g),
      cix AS (SELECT doc_id, pos,
                coalesce(sum(bf) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS cidx
              FROM b),
      ch AS (SELECT doc_id, cidx, min(pos) AS s, max(pos) AS e,
               count(*) AS nw
             FROM cix GROUP BY doc_id, cidx)
      SELECT ch.doc_id, CAST(cidx AS BIGINT) AS chunk_idx,
             CAST(s AS BIGINT) AS start_pos,
             CAST(nw AS BIGINT) AS n_windows,
             CAST(e - s + 3 AS BIGINT) AS n_tokens,
             md5(array_to_string(toks[s:e+2], ' ')) AS chunk_fp
      FROM ch JOIN w ON w.doc_id = ch.doc_id
      ORDER BY ch.doc_id, chunk_idx""",

    // the SQL-text twins replay their operators' oracles: the statement
    // route must not change ANY value, so q157/q159 reuse q41/q152
    // verbatim; q158 replays the raw-cosine top-10 selection (id
    // tie-break) before display rounding, matching the procedure
    "q157_sql_minhash" -> s"""
      WITH $shCte, $baseCte, $minhashCtes, $verifyTail""",

    "q158_sql_ann_topk" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      c AS (SELECT vec_id,
              list_dot_product(v, qv) /
                (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))
                AS rc
            FROM e, q),
      top AS (SELECT vec_id, rc FROM c ORDER BY rc DESC, vec_id LIMIT 10)
      SELECT vec_id, floor(rc*10000 + 0.5)/10000 AS cos FROM top
      ORDER BY cos DESC, vec_id""",

    "q159_sql_mixture" -> """
      WITH dom AS (SELECT doc_id,
                     CASE WHEN n_chars < 250 THEN 'short'
                          WHEN n_chars < 400 THEN 'mid'
                          ELSE 'long' END AS bucket
                   FROM documents),
      wt(bucket, w) AS (VALUES ('short', 0.5), ('mid', 0.3125),
                               ('long', 0.1875)),
      ws AS (SELECT sum(w) AS s FROM wt),
      ex AS (SELECT bucket, 97 * w / s AS ex FROM wt, ws),
      fl AS (SELECT bucket, floor(ex) AS b, ex - floor(ex) AS rem FROM ex),
      rk AS (SELECT bucket, b,
               row_number() OVER (ORDER BY rem DESC, bucket) AS r FROM fl),
      lf AS (SELECT 97 - sum(b) AS l FROM fl),
      quota AS (SELECT bucket,
                  b + CASE WHEN r <= l THEN 1 ELSE 0 END AS quota
                FROM rk, lf),
      ranked AS (SELECT doc_id, bucket,
                   row_number() OVER (PARTITION BY bucket
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS prk
                 FROM dom)
      SELECT bucket, doc_id
      FROM ranked JOIN quota USING (bucket)
      WHERE prk <= quota ORDER BY bucket, doc_id""",

    // the procedure route replays the API twins' oracles exactly
    "q161_sql_simhash" -> simhashOracle,
    "q162_sql_dup_clusters" -> dupClustersOracle,
    "q163_sql_langid" -> langidOracle
  )
}
