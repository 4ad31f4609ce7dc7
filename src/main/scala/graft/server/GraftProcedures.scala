package graft.server

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.bitemporal.{BitemporalDml, SqlText}
import graft.llm.{Dedup, Mixture, Similarity, TextStats}

/** Table-valued SQL surface for the LLM-pipeline operators — the text
  * front door the reference's SQL-first clients expect (its 2.x line
  * exposes the whole engine as SQL; README.adoc:11). A wire client
  * (pgwire / HTTP / Spark Connect) writes
  *
  * {{{
  *   SELECT * FROM graft_minhash_candidates('documents', 'doc_id', 'text')
  *   WHERE jaccard >= 0.8
  * }}}
  *
  * and composes the result with ordinary SQL — joins, filters, CTEs.
  *
  * Mechanics: Spark's parser has no extension point for user
  * table-valued functions, so [[rewrite]] runs BEFORE the parse — it
  * scans the statement for `graft_*( … )` calls outside string
  * literals/comments, evaluates each to a DataFrame (library operators,
  * never an interpreter), registers it under a fresh temp-view name and
  * substitutes that name into the text. The rewritten statement is
  * plain Spark SQL; Catalyst plans the view subtree inline exactly as
  * if the caller had built it with the DataFrame API — pushdown,
  * broadcast and AQE all apply, so the wire path pays ZERO overhead
  * over the Scala path at any scale.
  *
  * Argument grammar (literal-only by design — arguments parameterize
  * operators, they are not expressions): `'string'`, integer/double,
  * `true/false`, `array(n, …)`, `map('k', v, …)`, and pg-style named
  * arguments `name => value` after the positionals. A table argument
  * names a graft-registered table (served at its current basis), any
  * catalog/temp view, or an inline subquery `'( SELECT … )'`.
  */
object GraftProcedures {

  sealed trait PArg
  final case class PStr(s: String) extends PArg
  final case class PNum(d: Double, integral: Boolean) extends PArg
  final case class PBool(b: Boolean) extends PArg
  final case class PArr(xs: Seq[Double]) extends PArg
  final case class PMapArg(m: Map[String, Double]) extends PArg

  final case class Proc(params: Seq[(String, Option[PArg])],
                        fn: (SparkSession, Map[String, PArg]) => DataFrame,
                        // false only where building the PLAN inherently
                        // executes (a data-dependent fixpoint): EXPLAIN
                        // refuses those by name instead of running jobs
                        explainable: Boolean = true)

  // Substitution views are NAMED BY CONTENT (md5 of procedure + args):
  // a repeated statement — dashboards, client retries — re-binds ONE
  // view instead of minting a new catalog entry per execution, and the
  // replaced DataFrame's checkpoint blocks become unreferenced (the
  // ContextCleaner unpins them). Distinct statements are additionally
  // LRU-capped so a long-lived server's catalog stays bounded.
  private val MaxTrackedViews = 128
  private val viewLru = new java.util.LinkedHashMap[String, String](
    64, 0.75f, true)

  // ---------------------------------------------------------------- args

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  private val numRe = """^[-+]?[0-9]+(\.[0-9]+)?([eE][-+]?[0-9]+)?$""".r
  private val nameRe = """^([A-Za-z_][A-Za-z0-9_]*)\s*=>([\s\S]*)$""".r

  /** One literal argument. */
  private[server] def parseArg(raw0: String): PArg = {
    val raw = raw0.trim
    val low = raw.toLowerCase
    if (raw.startsWith("'") && raw.endsWith("'") && raw.length >= 2)
      PStr(raw.substring(1, raw.length - 1).replace("''", "'"))
    else if (low == "true" || low == "false") PBool(low == "true")
    else if (numRe.findFirstIn(raw).isDefined)
      PNum(raw.toDouble, !raw.exists(c => c == '.' || c == 'e' || c == 'E'))
    else if (low.startsWith("array") && raw.endsWith(")")) {
      val inner = raw.substring(raw.indexOf('(') + 1, raw.length - 1)
      val parts = BitemporalDml.splitTopLevel(inner).map(_.trim)
        .filter(_.nonEmpty)
      PArr(parts.map(p => parseArg(p) match {
        case PNum(d, _) => d
        case other => fail(s"array element must be numeric, got '$p'")
      }))
    } else if (low.startsWith("map") && raw.endsWith(")")) {
      val inner = raw.substring(raw.indexOf('(') + 1, raw.length - 1)
      val parts = BitemporalDml.splitTopLevel(inner).map(_.trim)
        .filter(_.nonEmpty)
      if (parts.size % 2 != 0)
        fail(s"map(...) needs alternating 'key', value pairs")
      PMapArg(parts.grouped(2).map { case Seq(k, v) =>
        (parseArg(k), parseArg(v)) match {
          case (PStr(ks), PNum(vd, _)) => ks -> vd
          case _ => fail(s"map entries must be 'string', number — got $k, $v")
        }
      }.toMap)
    } else fail(s"cannot parse procedure argument '$raw' " +
      "(literals only: 'str', number, true/false, array(...), map('k', v))")
  }

  /** Bind an arg-list string against declared params (positional, then
    * `name => value` named, then defaults). */
  private[server] def bind(procName: String, argText: String,
                           params: Seq[(String, Option[PArg])])
      : Map[String, PArg] = {
    val pieces = BitemporalDml.splitTopLevel(argText).map(_.trim)
      .filter(_.nonEmpty)
    var positionalDone = false
    val bound = scala.collection.mutable.Map.empty[String, PArg]
    pieces.zipWithIndex.foreach { case (piece, i) =>
      piece match {
        case nameRe(n, v) if params.exists(_._1 == n.toLowerCase) =>
          positionalDone = true
          val key = n.toLowerCase
          if (bound.contains(key)) fail(s"$procName: duplicate argument $key")
          bound(key) = parseArg(v)
        case _ =>
          if (positionalDone)
            fail(s"$procName: positional argument after named arguments")
          if (i >= params.size)
            fail(s"$procName: too many arguments (max ${params.size})")
          bound(params(i)._1) = parseArg(piece)
      }
    }
    params.foreach { case (n, default) =>
      if (!bound.contains(n)) default match {
        case Some(d) => bound(n) = d
        case None => fail(s"$procName: missing required argument '$n'")
      }
    }
    bound.toMap
  }

  private def str(a: Map[String, PArg], k: String): String = a(k) match {
    case PStr(s) => s
    case other => fail(s"argument $k must be a 'string', got $other")
  }
  private def int(a: Map[String, PArg], k: String): Int = a(k) match {
    case PNum(d, true) => d.toInt
    case other => fail(s"argument $k must be an integer, got $other")
  }
  private def lng(a: Map[String, PArg], k: String): Long = a(k) match {
    case PNum(d, true) => d.toLong
    case other => fail(s"argument $k must be an integer, got $other")
  }
  private def dbl(a: Map[String, PArg], k: String): Double = a(k) match {
    case PNum(d, _) => d
    case other => fail(s"argument $k must be numeric, got $other")
  }
  private def bool(a: Map[String, PArg], k: String): Boolean = a(k) match {
    case PBool(b) => b
    case other => fail(s"argument $k must be true/false, got $other")
  }

  /** A table argument: graft-registered table (current basis) first,
    * then the session catalog (temp views, tables), then an inline
    * `'( SELECT … )'` subquery. */
  private[server] def resolveTable(spark: SparkSession, name: String)
      : DataFrame = {
    val trimmed = name.trim
    if (trimmed.startsWith("(")) {
      // an inline subquery is its OWN statement text: graft_* calls —
      // and MATVIEW NAMES — inside it were masked (string literal)
      // during the outer statement's processing, so give the subquery
      // the same front-door treatment here: re-bind referenced matviews
      // to their CURRENT state (a stale or dropped registration must
      // not serve from inside an argument), then substitute nested
      // procedure calls — one SQL text chains procedures (a quantile
      // gate OVER repetition metrics) without materializing an
      // intermediate view by hand. Under EXPLAIN the nested
      // substitution inherits plans-only mode, so the unexplainable
      // fixpoint must refuse here too — not silently run its jobs from
      // inside a nested argument.
      if (graft.util.PlansOnly.active) refuseUnexplainable(trimmed)
      GraftMatviews.refreshReferenced(spark, trimmed)
      spark.sql(rewrite(spark, trimmed))
    }
    else GraftServer.registered.collectFirst {
      // current(spark), NOT current(): the caller is the PARSING session
      // (a Connect client gets an isolated clone), and the substitution
      // temp view registers in the session that owns the DataFrame — a
      // root-session DataFrame would put the _graft_p_* view where the
      // client's parse can never resolve it
      case (n, t) if n.equalsIgnoreCase(trimmed) => t.current(spark)
    }.getOrElse {
      try spark.table(trimmed)
      catch { case e: org.apache.spark.sql.AnalysisException =>
        fail(s"table '$trimmed' is neither graft-registered nor in the " +
          s"session catalog: ${e.getMessage}")
      }
    }
  }

  // ---------------------------------------------------------- procedures

  /** Query-vector argument: an integer looks the vector up by id in the
    * served table; an array is the vector itself. Either way the result
    * is a 1-row broadcastable relation `(_qv array<double>)`. */
  private def queryVec(spark: SparkSession, emb: DataFrame, idCol: String,
                       vCol: String, q: PArg): DataFrame = q match {
    case PNum(d, true) =>
      emb.filter(col(idCol) === d.toLong).select(col(vCol).as("_qv"))
    case PArr(xs) =>
      spark.range(1).select(
        array(xs.map(x => lit(x)): _*).cast("array<double>").as("_qv"))
    case other => fail(s"query must be an id (integer) or array(...), got $other")
  }

  private def vecD(df: DataFrame, vCol: String): DataFrame =
    df.withColumn(vCol, transform(col(vCol), x => x.cast("double")))

  val procedures: Map[String, Proc] = Map(
    // MinHash+LSH near-duplicate candidate pairs with exact-Jaccard
    // verification — the full q41 pipeline as one call. Banded
    // equi-join, never all-pairs; df-pruning caps the Zipfian head.
    "graft_minhash_candidates" -> Proc(
      Seq("table" -> None, "id_col" -> None, "text_col" -> None,
        "k" -> Some(PNum(16, true)), "bands" -> Some(PNum(8, true)),
        "min_jaccard" -> Some(PNum(0.5, false)),
        "shingle_n" -> Some(PNum(2, true)),
        "max_df" -> Some(PNum(0.25, false))),
      (spark, a) => {
        val (id, k, bands) = (str(a, "id_col"), int(a, "k"), int(a, "bands"))
        if (k <= 0 || bands <= 0 || k % bands != 0)
          fail(s"graft_minhash_candidates: k ($k) must be a positive " +
            s"multiple of bands ($bands)")
        val df = resolveTable(spark, str(a, "table"))
        val sh = Dedup.shingles(df, id, str(a, "text_col"), int(a, "shingle_n"))
        val base = graft.util.PlansOnly.cp(Dedup.hashedShingles(sh, id))
        val rare = Dedup.rareShingles(base, id, dbl(a, "max_df"))
        val sig =
          graft.util.PlansOnly.cp(Dedup.minhashSignature(rare, id, k))
        val cand = Dedup.minhashCandidates(sig, id, k, bands)
        Dedup.jaccardOnCandidates(base, id, cand)
          .filter(col("jaccard") >= dbl(a, "min_jaccard"))
      }),

    // Exact dedup summary: one row per distinct text with the kept
    // (lowest) id and the copy count — hash group-by, one shuffle.
    "graft_exact_dedup" -> Proc(
      Seq("table" -> None, "id_col" -> None, "text_col" -> None),
      (spark, a) => {
        val (id, tc) = (str(a, "id_col"), str(a, "text_col"))
        resolveTable(spark, str(a, "table"))
          .groupBy(col(tc))
          .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))
          .select(col("keep_id"), col("n_copies"), col(tc))
      }),

    // Exact brute-force cosine top-k — the ANN correctness baseline.
    // One broadcast of the query vector, one codegen'd scan, ties
    // broken by id so the result is deterministic.
    "graft_ann_topk" -> Proc(
      Seq("table" -> None, "id_col" -> None, "vec_col" -> None,
        "query" -> None, "k" -> Some(PNum(10, true))),
      (spark, a) => {
        val (id, vc) = (str(a, "id_col"), str(a, "vec_col"))
        val emb = vecD(resolveTable(spark, str(a, "table")), vc)
        val q = queryVec(spark, emb, id, vc, a("query"))
        emb.crossJoin(broadcast(q))
          .withColumn("cos", Similarity.cosine(col(vc), col("_qv")))
          .orderBy(col("cos").desc, col(id))
          .select(col(id), col("cos"))
          .limit(int(a, "k"))
      }),

    // IVF ANN top-k: probe only the n_probe nearest centroid cells
    // (borrowed centroids — deterministic, stride-indexed) — the scale
    // path; at 100 TB the assigned table is partitioned by cell so a
    // query touches n_probe partitions, never the corpus.
    "graft_ann_topk_ivf" -> Proc(
      Seq("table" -> None, "id_col" -> None, "vec_col" -> None,
        "query" -> None, "k" -> Some(PNum(10, true)),
        "n_centroids" -> Some(PNum(16, true)),
        "n_probe" -> Some(PNum(4, true)),
        "id_stride" -> Some(PNum(1, true))),
      (spark, a) => {
        val (id, vc) = (str(a, "id_col"), str(a, "vec_col"))
        val emb = vecD(resolveTable(spark, str(a, "table")), vc)
        // ivfCentroids already yields the (_cid, _cv) centroid relation
        val cents = Similarity.ivfCentroids(emb, id, vc,
          int(a, "n_centroids"), lng(a, "id_stride"))
        val assigned = Similarity.ivfAssign(emb, id, vc, cents)
        val q = queryVec(spark, emb, id, vc, a("query"))
        Similarity.ivfTopK(assigned, vc, q, "_qv", int(a, "k"),
            int(a, "n_probe"), cents, tieBreak = Seq(col(id)))
          .select(col(id), col("cos"))
      }),

    // Exact-count mixture sample: largest-remainder quotas over the
    // weight map, per-domain md5-priority fill — reproducible, size
    // exact. One domain-keyed rank shuffle + a broadcast quota join.
    "graft_mixture_sample" -> Proc(
      Seq("table" -> None, "id_col" -> None, "domain_col" -> None,
        "weights" -> None, "total" -> None,
        "strict" -> Some(PBool(true))),
      (spark, a) => {
        val w = a("weights") match {
          case PMapArg(m) => m
          case other => fail(s"weights must be map('domain', w, …), got $other")
        }
        Mixture.mixtureSample(resolveTable(spark, str(a, "table")),
          str(a, "id_col"), str(a, "domain_col"), w, lng(a, "total"),
          bool(a, "strict"))
      }),

    // Per-domain exact-quantile gate: keep rows whose score clears
    // their domain's q-quantile — one agg shuffle, broadcast back.
    "graft_quantile_keep" -> Proc(
      Seq("table" -> None, "domain_col" -> None, "score_col" -> None,
        "q" -> None),
      (spark, a) =>
        Mixture.quantileKeep(resolveTable(spark, str(a, "table")),
          str(a, "domain_col"), str(a, "score_col"), dbl(a, "q"))),

    // SimHash fingerprint per doc — one aggregation shuffle, no pairs.
    "graft_simhash" -> Proc(
      Seq("table" -> None, "id_col" -> None, "text_col" -> None,
        "n_bits" -> Some(PNum(16, true)), "shingle_n" -> Some(PNum(2, true))),
      (spark, a) => {
        val (id, nBits) = (str(a, "id_col"), int(a, "n_bits"))
        if (nBits < 1 || nBits > 63)
          fail(s"graft_simhash: n_bits must be in [1, 63], got $nBits")
        Dedup.simhash(Dedup.shingles(resolveTable(spark, str(a, "table")),
          id, str(a, "text_col"), int(a, "shingle_n")), id, nBits)
      }),

    // Banded Hamming-distance pairs over SimHash fingerprints —
    // equi-join blocking, never all-pairs.
    "graft_simhash_pairs" -> Proc(
      Seq("table" -> None, "id_col" -> None, "text_col" -> None,
        "n_bits" -> Some(PNum(48, true)), "max_dist" -> Some(PNum(3, true)),
        "shingle_n" -> Some(PNum(2, true))),
      (spark, a) => {
        val (id, nBits, maxDist) =
          (str(a, "id_col"), int(a, "n_bits"), int(a, "max_dist"))
        if (nBits < 1 || nBits > 63)
          fail(s"graft_simhash_pairs: n_bits must be in [1, 63], got $nBits")
        if (maxDist < 0 || nBits % (maxDist + 1) != 0)
          fail(s"graft_simhash_pairs: n_bits ($nBits) must divide into " +
            s"max_dist + 1 (${maxDist + 1}) bands")
        val fp = Dedup.simhash(
          Dedup.shingles(resolveTable(spark, str(a, "table")), id,
            str(a, "text_col"), int(a, "shingle_n")), id, nBits)
        Dedup.simhashPairs(fp, id, nBits, maxDist)
      }),

    // Near-dup CLUSTERS: the q84 pipeline — minhash candidates →
    // exact-Jaccard verify → min-label connected components. Output
    // (id, comp): every doc with its duplicate-cluster label.
    "graft_dup_clusters" -> Proc(
      Seq("table" -> None, "id_col" -> None, "text_col" -> None,
        "k" -> Some(PNum(16, true)), "bands" -> Some(PNum(8, true)),
        "min_jaccard" -> Some(PNum(0.5, false)),
        "shingle_n" -> Some(PNum(2, true)),
        "max_df" -> Some(PNum(0.25, false))),
      (spark, a) => {
        val (id, k, bands) = (str(a, "id_col"), int(a, "k"), int(a, "bands"))
        if (k <= 0 || bands <= 0 || k % bands != 0)
          fail(s"graft_dup_clusters: k ($k) must be a positive multiple " +
            s"of bands ($bands)")
        val df = resolveTable(spark, str(a, "table"))
        val sh = Dedup.shingles(df, id, str(a, "text_col"), int(a, "shingle_n"))
        val base = graft.util.PlansOnly.cp(Dedup.hashedShingles(sh, id))
        val rare = Dedup.rareShingles(base, id, dbl(a, "max_df"))
        val sig =
          graft.util.PlansOnly.cp(Dedup.minhashSignature(rare, id, k))
        val cand = Dedup.minhashCandidates(sig, id, k, bands)
        val pairs = Dedup.jaccardOnCandidates(base, id, cand)
          .filter(col("jaccard") >= dbl(a, "min_jaccard"))
          .select("id_a", "id_b").localCheckpoint()
        Dedup.connectedComponents(pairs)
      },
      // the components fixpoint ITERATES until labels stop moving: the
      // plan's shape is a function of the data (rounds = graph
      // diameter), unknowable without executing — EXPLAIN refuses this
      // one procedure rather than silently running its jobs
      explainable = false),

    // Stopword-profile language ID per doc — keyed agg, broadcast lists.
    "graft_lang_id" -> Proc(
      Seq("table" -> None, "id_col" -> None, "text_col" -> None),
      (spark, a) => {
        val id = str(a, "id_col")
        TextStats.languageId(TextStats.tokens(
          resolveTable(spark, str(a, "table")), id, str(a, "text_col")), id)
      }),

    // Whitespace + BPE-ish regex token counts — map-only.
    "graft_token_stats" -> Proc(
      Seq("table" -> None, "id_col" -> None, "text_col" -> None),
      (spark, a) => TextStats.tokenCounts(
        resolveTable(spark, str(a, "table")), str(a, "id_col"),
        str(a, "text_col"))),

    // Gopher-style repetition metrics per doc.
    "graft_repetition" -> Proc(
      Seq("table" -> None, "id_col" -> None, "text_col" -> None),
      (spark, a) => TextStats.repetition(
        resolveTable(spark, str(a, "table")), str(a, "id_col"),
        str(a, "text_col"))),

    // Exact substring dedup, rewrite form: duplicated k-token spans
    // scrubbed from every doc (suffix-array family, distributed).
    "graft_scrub_duplicate_spans" -> Proc(
      Seq("table" -> None, "id_col" -> None, "text_col" -> None,
        "k" -> Some(PNum(16, true))),
      (spark, a) => {
        val k = int(a, "k")
        if (k < 2) fail(s"graft_scrub_duplicate_spans: k must be >= 2, got $k")
        Dedup.scrubDuplicateSpans(resolveTable(spark, str(a, "table")),
          str(a, "id_col"), str(a, "text_col"), k)
      }),

    // Content-defined chunking: rolling-hash boundaries that RESYNC
    // across edits, with md5 chunk fingerprints.
    "graft_cdc_chunks" -> Proc(
      Seq("table" -> None, "id_col" -> None, "text_col" -> None,
        "n" -> Some(PNum(3, true)), "divisor" -> Some(PNum(16, true))),
      (spark, a) => TextStats.cdcChunks(
        resolveTable(spark, str(a, "table")), str(a, "id_col"),
        str(a, "text_col"), int(a, "n"), int(a, "divisor"))))

  // ------------------------------------------------------------- rewrite

  private val callRe =
    java.util.regex.Pattern.compile("(?i)\\b(graft_[a-z0-9_]+)\\s*\\(")

  /** The procedure names `sql` actually CALLS: word-boundary name
    * followed by `(`, outside string literals/comments, and known to
    * [[procedures]]. An identifier merely CONTAINING a procedure name
    * (`my_graft_simhash_results`) never matches — `_` is a word
    * character, so there is no boundary inside it. This is the same
    * detection [[rewrite]] substitutes on, so "would EXPLAIN
    * substitute?" and "does rewrite substitute?" can never disagree. */
  def calledProcedures(sql: String): Set[String] = {
    val spans = SqlText.maskedSpans(sql)
    val m = callRe.matcher(sql)
    val found = Set.newBuilder[String]
    while (m.find()) {
      val n = m.group(1).toLowerCase
      if (!SqlText.masked(spans, m.start()) && procedures.contains(n))
        found += n
    }
    found.result()
  }

  /** EXPLAIN-path guard shared by every front door: refuse the
    * procedures whose PLAN cannot be built without executing (the
    * data-dependent fixpoint) — everything else substitutes in
    * plans-only mode under EXPLAIN. */
  def refuseUnexplainable(sql: String): Unit =
    calledProcedures(sql).find(n => !procedures(n).explainable).foreach { n =>
      throw new IllegalArgumentException(
        s"cannot EXPLAIN $n: its connected-components fixpoint runs a " +
          "data-dependent number of rounds (the plan's shape is only " +
          "knowable by executing); EXPLAIN the candidate-pair stage " +
          "(graft_minhash_candidates) instead, or run the statement")
    }

  /** Substitute every `graft_*( … )` call outside literals/comments
    * with a temp view holding its result; returns the rewritten text
    * (identity when no known procedure appears). */
  def rewrite(spark: SparkSession, sql: String): String = {
    var text = sql
    var guard = 0
    var changed = true
    while (changed) {
      changed = false
      guard += 1
      if (guard > 64) fail("graft procedure rewrite did not terminate")
      val spans = SqlText.maskedSpans(text)
      val m = callRe.matcher(text)
      var found = false
      while (!found && m.find()) {
        val name = m.group(1).toLowerCase
        if (!SqlText.masked(spans, m.start()) &&
            procedures.contains(name)) {
          val open = text.indexOf('(', m.end(1))
          var depth = 1
          var i = open + 1
          while (depth > 0 && i < text.length) {
            if (!SqlText.masked(spans, i)) {
              text.charAt(i) match {
                case '(' => depth += 1
                case ')' => depth -= 1
                case _ =>
              }
            }
            if (depth > 0) i += 1
          }
          if (depth != 0) fail(s"$name: unbalanced parentheses")
          val argText = text.substring(open + 1, i)
          val proc = procedures(name)
          val df = proc.fn(spark, bind(name, argText, proc.params))
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$name($argText)".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // plans-only (EXPLAIN) substitutions get their OWN namespace:
          // re-binding the shared content-named view to an unpinned,
          // probe-skipped plan would hand that plan to a concurrent
          // EXECUTION of the same statement on the same session (the
          // HTTP front door shares one session across handler threads)
          val view =
            (if (graft.util.PlansOnly.active) "_graft_px_"
             else "_graft_p_") + digest.take(8).map(b => f"$b%02x").mkString
          df.createOrReplaceTempView(view)
          viewLru.synchronized {
            viewLru.put(view, name)
            while (viewLru.size > MaxTrackedViews) {
              val oldest = viewLru.keySet.iterator.next()
              viewLru.remove(oldest)
              try spark.catalog.dropTempView(oldest)
              catch { case _: Exception => }
            }
          }
          text = text.substring(0, m.start()) + view + text.substring(i + 1)
          found = true
          changed = true
        }
      }
    }
    text
  }
}
