package graft.server

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.{Dedup, Mixture, Similarity}
import graft.server.GraftProcedures._

/** The SQL-text surface for the LLM-pipeline operators: argument
  * grammar, the literal-aware rewrite, table resolution, and result
  * parity of every procedure against its Scala-API twin. */
class GraftProceduresSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  import org.apache.spark.sql.{DataFrame, Row}

  // a small corpus with real near-dups (same generator family the
  // DedupSpec properties use: base sentences + light mutations)
  private lazy val docs: DataFrame = {
    val s = spark
    import s.implicits._
    val base = (0 until 30).map(i =>
      (i.toLong, (0 until 12).map(j => s"w${(i * 7 + j * 3) % 40}").mkString(" ")))
    val dups = (0 until 10).map(i =>
      (100L + i, base(i)._2.replace("w0", "wX")))
    val df = (base ++ dups).toDF("doc_id", "text")
    df.createOrReplaceTempView("pdocs")
    df
  }

  private lazy val embs: DataFrame = {
    val s = spark
    import s.implicits._
    val df = (0 until 40).map { i =>
      (i.toLong, (0 until 8).map(j =>
        math.sin(i * 0.7 + j * 1.3)).toArray)
    }.toDF("vec_id", "v")
    df.createOrReplaceTempView("pembs")
    df
  }

  test("parseArg: every literal form") {
    assert(parseArg("'abc'") == PStr("abc"))
    assert(parseArg("'it''s'") == PStr("it's"))
    assert(parseArg("42") == PNum(42, true))
    assert(parseArg("-0.5") == PNum(-0.5, false))
    assert(parseArg("1e3") == PNum(1000.0, false))
    assert(parseArg("true") == PBool(true))
    assert(parseArg("FALSE") == PBool(false))
    assert(parseArg("array(1, 2.5, -3)") == PArr(Seq(1.0, 2.5, -3.0)))
    assert(parseArg("map('a', 0.5, 'b', 0.5)") ==
      PMapArg(Map("a" -> 0.5, "b" -> 0.5)))
    val e = intercept[IllegalArgumentException](parseArg("ident"))
    assert(e.getMessage.contains("literals only"))
    assert(intercept[IllegalArgumentException](parseArg("map('a')"))
      .getMessage.contains("alternating"))
  }

  test("bind: positional, named, defaults, errors") {
    val params = Seq("a" -> None, "b" -> Some[PArg](PNum(7, true)),
      "c" -> Some[PArg](PBool(false)))
    assert(bind("p", "'x'", params) ==
      Map("a" -> PStr("x"), "b" -> PNum(7, true), "c" -> PBool(false)))
    assert(bind("p", "'x', 9, c => true", params)("c") == PBool(true))
    assert(bind("p", "'x', c => true, b => 1", params)("b") == PNum(1, true))
    assert(intercept[IllegalArgumentException](bind("p", "", params))
      .getMessage.contains("missing required"))
    assert(intercept[IllegalArgumentException](
      bind("p", "'x', c => true, 9", params))
      .getMessage.contains("positional argument after named"))
    assert(intercept[IllegalArgumentException](
      bind("p", "'x', b => 1, b => 2", params))
      .getMessage.contains("duplicate"))
    assert(intercept[IllegalArgumentException](
      bind("p", "'x', 1, true, 9", params))
      .getMessage.contains("too many"))
  }

  test("rewrite: substitutes outside literals only, leaves unknown names") {
    docs
    // a string literal mentioning a procedure name must NOT rewrite
    val sql = "SELECT 'graft_exact_dedup(fake)' AS s, n_copies " +
      "FROM graft_exact_dedup('pdocs', 'doc_id', 'text') WHERE keep_id = 0"
    val out = GraftProcedures.rewrite(spark, sql)
    assert(out.contains("'graft_exact_dedup(fake)'"), out)
    assert(out.contains("FROM _graft_p_"), out)
    // unknown graft_ names pass through for Spark to reject
    assert(GraftProcedures.rewrite(spark, "SELECT graft_nope(1)") ==
      "SELECT graft_nope(1)")
    // runs end-to-end and composes with WHERE
    val rows = spark.sql(out).collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 1L)
  }

  test("repeated statements re-bind ONE content-named view (no catalog growth)") {
    docs
    def viewCount() = spark.catalog.listTables()
      .filter(col("name").startsWith("_graft_p_")).count()
    val sql = "SELECT count(*) AS n FROM graft_exact_dedup('pdocs','doc_id','text')"
    GraftSql.sql(spark, sql).collect()
    val after1 = viewCount()
    (0 until 5).foreach(_ => GraftSql.sql(spark, sql).collect())
    assert(viewCount() == after1,
      "re-running the same statement must not mint new temp views")
  }

  test("graft_minhash_candidates == the q41 Scala pipeline") {
    docs
    val viaSql = GraftSql.sql(spark,
      "SELECT id_a, id_b, jaccard FROM graft_minhash_candidates(" +
        "'pdocs', 'doc_id', 'text', k => 16, bands => 8, " +
        "min_jaccard => 0.5) ORDER BY id_a, id_b").collect().toSeq
    val sh = Dedup.shingles(docs, "doc_id", "text", 2)
    val base = Dedup.hashedShingles(sh, "doc_id").localCheckpoint()
    val rare = Dedup.rareShingles(base, "doc_id", 0.25)
    val sig = Dedup.minhashSignature(rare, "doc_id", 16).localCheckpoint()
    val cand = Dedup.minhashCandidates(sig, "doc_id", 16, 8)
    val viaApi = Dedup.jaccardOnCandidates(base, "doc_id", cand)
      .filter(col("jaccard") >= 0.5)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(viaSql == viaApi)
    assert(viaSql.nonEmpty, "fixture must actually produce near-dups")
    // k not a multiple of bands fails loudly at parse time
    val e = intercept[Exception](GraftSql.sql(spark,
      "SELECT * FROM graft_minhash_candidates('pdocs','doc_id','text', 15, 4)"))
    assert(e.getMessage.contains("multiple of bands"))
  }

  test("graft_ann_topk: by-id query, array query, tie-broken, exact") {
    embs
    val viaSql = GraftSql.sql(spark,
      "SELECT vec_id, cos FROM graft_ann_topk('pembs','vec_id','v', 0, 5)")
      .collect().toSeq
    val e = embs.withColumn("v", transform(col("v"), x => x.cast("double")))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("_qv"))
    val viaApi = e.crossJoin(broadcast(q))
      .withColumn("cos", Similarity.cosine(col("v"), col("_qv")))
      .orderBy(col("cos").desc, col("vec_id"))
      .select(col("vec_id"), col("cos")).limit(5).collect().toSeq
    assert(viaSql == viaApi)
    assert(viaSql.head.getLong(0) == 0L) // self-match first
    // explicit array query: top-1 is the equal vector
    val lits = (0 until 8).map(j => math.sin(3 * 0.7 + j * 1.3))
    val arr = GraftSql.sql(spark,
      s"SELECT vec_id FROM graft_ann_topk('pembs','vec_id','v', " +
        s"array(${lits.mkString(", ")}), 1)").collect()
    assert(arr.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("graft_ann_topk_ivf: probes cells, recalls the true neighbor") {
    embs
    val ivf = GraftSql.sql(spark,
      "SELECT vec_id, cos FROM graft_ann_topk_ivf('pembs','vec_id','v', " +
        "0, 5, n_centroids => 8, n_probe => 8)").collect().toSeq
    // probing ALL cells == brute force
    val bf = GraftSql.sql(spark,
      "SELECT vec_id, cos FROM graft_ann_topk('pembs','vec_id','v', 0, 5)")
      .collect().toSeq
    assert(ivf == bf)
  }

  test("graft_mixture_sample + graft_quantile_keep == Mixture twins") {
    docs
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW pdom AS " +
      "SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END " +
      "AS dom, length(text) AS score FROM pdocs")
    val viaSql = GraftSql.sql(spark,
      "SELECT dom, doc_id FROM graft_mixture_sample('pdom','doc_id','dom'," +
        " map('even', 0.5, 'odd', 0.5), 10) ORDER BY dom, doc_id")
      .collect().toSeq
    val viaApi = Mixture.mixtureSample(spark.table("pdom"), "doc_id", "dom",
        Map("even" -> 0.5, "odd" -> 0.5), 10)
      .select(col("dom"), col("doc_id"))
      .orderBy("dom", "doc_id").collect().toSeq
    assert(viaSql == viaApi && viaSql.size == 10)
    // strict mode rejects unlisted domains THROUGH the text path
    val e = intercept[Exception](GraftSql.sql(spark,
      "SELECT * FROM graft_mixture_sample('pdom','doc_id','dom'," +
        " map('even', 1.0), 5)"))
    assert(e.getMessage.contains("not in weights"))
    // non-strict drops them
    assert(GraftSql.sql(spark,
      "SELECT * FROM graft_mixture_sample('pdom','doc_id','dom'," +
        " map('even', 1.0), 5, strict => false)").collect().length == 5)

    val qk = GraftSql.sql(spark,
      "SELECT doc_id FROM graft_quantile_keep('pdom','dom','score', 0.5) " +
        "ORDER BY doc_id").collect().toSeq
    val qkApi = Mixture.quantileKeep(spark.table("pdom"), "dom", "score", 0.5)
      .select(col("doc_id")).orderBy("doc_id").collect().toSeq
    assert(qk == qkApi && qk.nonEmpty)
  }

  test("text-analysis + fingerprint procedures == their API twins") {
    docs
    import graft.llm.{Dedup => D, TextStats => TS}
    def sqlRows(q: String) = GraftSql.sql(spark, q).collect().toSeq

    // simhash + banded Hamming pairs
    val fpApi = D.simhash(D.shingles(docs, "doc_id", "text", 2), "doc_id", 48)
    assert(sqlRows("SELECT * FROM graft_simhash('pdocs','doc_id','text', " +
      "n_bits => 48) ORDER BY doc_id") ==
      fpApi.orderBy("doc_id").collect().toSeq)
    assert(sqlRows("SELECT id_a, id_b, dist FROM graft_simhash_pairs(" +
      "'pdocs','doc_id','text', 48, 3) ORDER BY id_a, id_b") ==
      D.simhashPairs(fpApi, "doc_id", 48, 3)
        .orderBy("id_a", "id_b").collect().toSeq)
    assert(intercept[Exception](sqlRows(
      "SELECT * FROM graft_simhash_pairs('pdocs','doc_id','text', 48, 4)"))
      .getMessage.contains("bands"))

    // dup clusters: near-dup pairs land in one component (max_df => 1.0
    // keeps this fixture's arithmetically-shared bigrams in signatures)
    val clusters = sqlRows("SELECT id, comp FROM graft_dup_clusters(" +
      "'pdocs','doc_id','text', max_df => 1.0) ORDER BY id")
    assert(clusters.nonEmpty)
    val byId = clusters.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(0L) == byId(100L), "near-dup pair must share a component")

    // lang id / token stats / repetition / cdc chunks — row parity
    assert(sqlRows("SELECT doc_id, pred_lang FROM graft_lang_id(" +
      "'pdocs','doc_id','text') ORDER BY doc_id") ==
      TS.languageId(TS.tokens(docs, "doc_id", "text"), "doc_id")
        .select(col("doc_id"), col("pred_lang")).orderBy("doc_id")
        .collect().toSeq)
    assert(sqlRows("SELECT * FROM graft_token_stats('pdocs','doc_id','text')" +
      " ORDER BY doc_id") ==
      TS.tokenCounts(docs, "doc_id", "text").orderBy("doc_id").collect().toSeq)
    assert(sqlRows("SELECT * FROM graft_repetition('pdocs','doc_id','text')" +
      " ORDER BY doc_id") ==
      TS.repetition(docs, "doc_id", "text").orderBy("doc_id").collect().toSeq)
    assert(sqlRows("SELECT * FROM graft_cdc_chunks('pdocs','doc_id','text')" +
      " ORDER BY doc_id, chunk_idx") ==
      TS.cdcChunks(docs, "doc_id", "text", 3, 16)
        .orderBy("doc_id", "chunk_idx").collect().toSeq)
    assert(sqlRows("SELECT * FROM graft_scrub_duplicate_spans(" +
      "'pdocs','doc_id','text', 4) ORDER BY doc_id") ==
      D.scrubDuplicateSpans(docs, "doc_id", "text", 4)
        .orderBy("doc_id").collect().toSeq)
  }

  test("VACUUM/OPTIMIZE/COMPACT statements maintain registered tables") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("maint_tbl").toString
    val t = new graft.GraftTable(s, dir, Seq("v"))
    GraftServer.register("mainttbl", t)
    try {
      t.put(Seq((1L, 5L), (2L, 6L)).toDF("id", "x"), $"id",
        lit("2020-01-01").cast("timestamp"), None, Seq("v" -> $"x"),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      val c = GraftSql.sql(spark, "COMPACT mainttbl").collect()
      assert(c(0).getString(0) == "mainttbl" && c(0).getString(1) == "COMPACT")
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "base")), "compact must build the base")
      val v = GraftSql.sql(spark, "VACUUM mainttbl").collect()
      assert(v(0).getString(1) == "VACUUM")
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "log", "_truncated")),
        "vacuum must truncate the represented log prefix")
      assert(t.current().count() == 2, "data survives the lifecycle")
      // unregistered targets fall through to Spark's own parser
      assert(intercept[Exception](
        GraftSql.sql(spark, "VACUUM not_a_graft_table").collect())
        .getMessage.nonEmpty)
    } finally GraftServer.unregister("mainttbl")
  }

  test("inline subquery table arg: '( SELECT … )' resolves") {
    docs
    val n = GraftSql.sql(spark,
      "SELECT count(*) AS n FROM graft_exact_dedup(" +
        "'(SELECT doc_id, text FROM pdocs WHERE doc_id < 5)', " +
        "'doc_id', 'text')").collect()(0).getLong(0)
    assert(n == 5L)
  }

  test("procedure composability: graft_* calls chain through an " +
      "inline-subquery table arg (one SQL text)") {
    docs
    // a per-domain quantile gate OVER repetition metrics, as ONE
    // statement: the inner call sits inside the outer call's quoted
    // table arg (masked during the outer rewrite) and substitutes when
    // the subquery text is resolved
    val chained = GraftSql.sql(spark,
      "SELECT doc_id FROM graft_quantile_keep(" +
        "'( SELECT ''all'' AS dom, doc_id, top2_frac FROM " +
        "graft_repetition(''pdocs'', ''doc_id'', ''text'') )', " +
        "'dom', 'top2_frac', 0.5) ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    // the two-statement form it replaces
    GraftSql.sql(spark,
      "SELECT 'all' AS dom, doc_id, top2_frac FROM " +
        "graft_repetition('pdocs', 'doc_id', 'text')")
      .createOrReplaceTempView("rep_step")
    val twoStep = GraftSql.sql(spark,
      "SELECT doc_id FROM graft_quantile_keep(" +
        "'rep_step', 'dom', 'top2_frac', 0.5) ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(chained.nonEmpty && chained == twoStep,
      s"chained=$chained twoStep=$twoStep")

    // chained statements EXPLAIN too — the nested substitution
    // inherits plans-only mode (zero jobs), and an UNexplainable
    // procedure nested in an argument refuses instead of silently
    // running its fixpoint
    val before = org.apache.spark.scheduler.JobCountProbe
      .totalJobsSubmitted(spark.sparkContext)
    val plan = GraftSql.sql(spark,
      "EXPLAIN SELECT * FROM graft_quantile_keep(" +
        "'( SELECT ''all'' AS dom, doc_id, top2_frac FROM " +
        "graft_repetition(''pdocs'', ''doc_id'', ''text'') )', " +
        "'dom', 'top2_frac', 0.5)").collect()(0).getString(0)
    val after = org.apache.spark.scheduler.JobCountProbe
      .totalJobsSubmitted(spark.sparkContext)
    assert(after == before,
      s"nested EXPLAIN launched ${after - before} job(s)")
    assert(plan.contains("Physical Plan") || plan.contains("(1) "),
      plan.take(300))
    val e = intercept[Exception](GraftSql.sql(spark,
      "EXPLAIN SELECT * FROM graft_quantile_keep(" +
        "'( SELECT ''all'' AS dom, id AS doc_id, comp AS top2_frac FROM " +
        "graft_dup_clusters(''pdocs'', ''doc_id'', ''text'') )', " +
        "'dom', 'top2_frac', 0.5)"))
    assert(e.getMessage.contains("graft_dup_clusters"), e.getMessage)
  }

  test("EXPLAIN over procedure statements: full substituted plan, " +
      "ZERO jobs (plans-only substitution)") {
    docs
    // warm the name: temp view already registered, schema known — the
    // explain below has no reason to touch data at all
    val before = org.apache.spark.scheduler.JobCountProbe
      .totalJobsSubmitted(spark.sparkContext)
    val plan = GraftSql.sql(spark,
      "EXPLAIN SELECT * FROM graft_minhash_candidates(" +
        "'pdocs', 'doc_id', 'text') WHERE jaccard >= 0.8")
      .collect()(0).getString(0)
    val after = org.apache.spark.scheduler.JobCountProbe
      .totalJobsSubmitted(spark.sparkContext)
    assert(after == before,
      s"EXPLAIN launched ${after - before} job(s) — plans-only violated")
    // the rendering is the PHYSICAL substituted pipeline: the banded
    // self-join and the signature aggregation are visible, not a
    // one-line view reference
    assert(plan.contains("Physical Plan") || plan.contains("(1) "),
      plan.take(300))
    val low = plan.toLowerCase
    assert(low.contains("exchange") || low.contains("hashaggregate"),
      plan.take(2000))
    // …and the same statement still RUNS after being explained (the
    // run substitutes afresh, with its stage pins back on)
    val n = GraftSql.sql(spark,
      "SELECT count(*) AS n FROM graft_minhash_candidates(" +
        "'pdocs', 'doc_id', 'text') WHERE jaccard >= 0.8")
      .collect()(0).getLong(0)
    assert(n > 0)
  }

  test("EXPLAIN: identifiers merely containing a procedure name no " +
      "longer refuse; the data-dependent fixpoint still does") {
    val s = spark
    import s.implicits._
    // a user view whose NAME contains graft_simhash — the old substring
    // detection spuriously refused to explain this
    Seq((1L, 2L)).toDF("a", "b")
      .createOrReplaceTempView("my_graft_simhash_results")
    val plan = GraftSql.sql(spark,
      "EXPLAIN SELECT a FROM my_graft_simhash_results")
      .collect()(0).getString(0)
    assert(plan.contains("Physical Plan") || plan.contains("(1) "),
      plan.take(300))
    // a procedure name inside a STRING literal is not a call either
    val lit = GraftSql.sql(spark,
      "EXPLAIN SELECT 'graft_dup_clusters(' AS s")
      .collect()(0).getString(0)
    assert(lit.contains("Physical Plan") || lit.contains("(1) "),
      lit.take(300))
    // the components fixpoint iterates data-dependently: refused by
    // name, with the story
    docs
    val e = intercept[Exception](GraftSql.sql(spark,
      "EXPLAIN SELECT * FROM graft_dup_clusters('pdocs', 'doc_id', 'text')"))
    assert(e.getMessage.contains("graft_dup_clusters") &&
      e.getMessage.toLowerCase.contains("fixpoint"), e.getMessage)
  }

  test("resolveTable: graft-registered tables serve their CURRENT basis") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("proc_tbl").toString
    val t = new graft.GraftTable(s, dir, Seq("txt"))
    GraftServer.register("proctbl", t)
    try {
      t.put(Seq((1L, "a a"), (2L, "a a")).toDF("id", "x"), $"id",
        lit("2020-01-01").cast("timestamp"), None, Seq("txt" -> $"x"),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      val out = GraftSql.sql(spark,
        "SELECT keep_id, n_copies FROM graft_exact_dedup(" +
          "'proctbl', '_id', 'txt')").collect()
      assert(out.length == 1 && out(0).getLong(1) == 2L)
    } finally GraftServer.unregister("proctbl")
  }
}
