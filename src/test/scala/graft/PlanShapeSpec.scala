package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape regressions: these assertions lock the properties
  * that make the catalog scale — pushed-down scans, broadcast dimension
  * joins, no accidental cartesians or single-partition windows. A change
  * that silently loses one of these would still be CORRECT (and pass the
  * oracle) while dying at 100×; this spec fails instead. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q00 (TPC-H Q1): shipdate filter reaches the parquet scan") {
    val p = plan("q00_tpch_q1")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q0f (TPC-H Q10): all three dimension joins broadcast, none sort-merge") {
    val p = plan("q0f_tpch_q10")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q33 (keyless as-of): no window, no shuffle of the left side") {
    val p = plan("q33_asof_join")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // 1-row packed right side
    assert(p.contains("sorted_last_leq"), p)
  }

  test("q38 (keyed as-of): single hash-partitioned window, no cartesian") {
    val p = plan("q38_asof_event")
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q52 (append-only fold): ONE scan and ONE window — no cross-branch re-compute") {
    val p = plan("q52_bitemp_fold")
    def count(needle: String) =
      p.sliding(needle.length).count(_ == needle)
    assert(count("Scan parquet") == 1, p)
    assert(count("Window") == 1, p)
    assert(!p.contains("Union"), p)
  }

  test("q41/q42 (near-dup): candidate generation is equi-join, never cartesian") {
    Seq("q41_dedup_minhash", "q42_ngram_jaccard").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("q150-q154 (substring dedup / mixture / CDC): no cartesian; blocking shapes") {
    Seq("q150_substring_spans", "q151_substring_scrub",
        "q152_mixture_sample", "q153_quantile_gate",
        "q154_cdc_chunks").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
    // the duplicated-gram set comes back as a SEMI join on the hash key
    // (an inner join would duplicate marked positions per occurrence)
    assert(plan("q150_substring_spans").contains("LeftSemi"),
      plan("q150_substring_spans"))
    // the ≤|domains|-row quota relation broadcasts
    assert(plan("q152_mixture_sample").contains("BroadcastHashJoin"),
      plan("q152_mixture_sample"))
  }

  test("q01 (scan): column pruning — only requested columns in ReadSchema") {
    val df = SparkEntry.queries("q01_scan")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // q01 projects a column subset; the scan must not read the full row
    assert(read.nonEmpty, p)
    assert(!read.contains("l_tax") || df.columns.contains("l_tax"),
      s"unpruned scan: $read")
  }

  test("q45 (embed pairs): label block join is salted — no single-key quadratic reducer") {
    val p = plan("q45_embed_pairs")
    // the pair join must key on (label, _salt), not label alone: a hot
    // label would otherwise be one un-splittable quadratic reducer
    val joinLine = p.linesIterator.find(_.contains("Join"))
      .filter(_.contains("_salt")).orElse(
        p.linesIterator.find(l => l.contains("hashpartitioning") && l.contains("_salt")))
    assert(joinLine.nonEmpty, s"no salted join key in plan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q96 (decontaminate): eval gram set broadcasts, train side never shuffles for the join") {
    val p = plan("q96_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q46/q70 (ANN): bucket/cell probe joins are broadcasts of tiny sides") {
    Seq("q46_ann_lsh", "q70_ann_ivf").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("q98/q99/q102 (composed ops): key joins only — never cartesian") {
    Seq("q98_temporal_join", "q99_curation_v2", "q102_funnel").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      // BroadcastNestedLoopJoin appears only for the as-of packed-array
      // probe (1-row build side) — q102's filter runs on a keyed window
      // as-of, which must not degrade to a nested loop
      if (q == "q102_funnel") assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("q108 (semantic dedup): pairwise pass is an equi-join on the cell id") {
    val p = plan("q108_semantic_dedup")
    // the only nested loop allowed is the tiny broadcast centroid table
    // (8 rows); the vector-vs-vector pass must hash-join on `cell`
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q109 (sequence packing): window partitions by shard, never global") {
    val p = plan("q109_sequence_pack")
    // a global cumulative sum would plan Exchange SinglePartition before
    // the Window — the one shape that cannot scale
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("q111 (PQ ADC): distance table joins codes by hash, no cartesian") {
    val p = plan("q111_pq_adc_topk")
    // the codebook/distance-table cross joins are tiny broadcast sides
    // (m*k rows); the codes-to-table join must be a hash equi-join
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q114/q115 (trained quantizers): assignment joins broadcast the centroids") {
    // Lloyd's assigns points to centroids by broadcasting the centroid
    // set (k rows), never by shuffling the point side against it; the
    // final plans must keep every join a broadcast, no cartesian of
    // data-sized relations
    Seq("q114_ivf_trained", "q115_pq_trained").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("SortMergeJoin"), s"$q: $p")
    }
  }

  test("q121 (composed IVF-PQ): probes and ADC table broadcast, codes join by hash") {
    val p = plan("q121_ivfpq_search")
    // the only non-broadcast joins may be the candidate-id and code
    // equi-joins; the data side must never cartesian or sort-merge
    // against the quantizer relations
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q124/q125/q126 (batch ANN): per-QUERY windows, never a global sort") {
    // the serving batch must rank inside hash-partitioned per-qid
    // windows — an orderBy.limit would plan a SinglePartition exchange
    // and serialize the whole batch through one task
    Seq("q124_ann_batch", "q125_ann_batch_ivf", "q126_pq_adc_batch").foreach { q =>
      val p = plan(q)
      assert(p.contains("Window"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      // the Window must be hash-partitioned by qid, not single-partition
      assert(!p.contains("SinglePartition"), s"$q: $p")
    }
  }

  test("q129/q130 (refine): shortlist broadcasts into the point-lookup, no cartesian with the corpus") {
    // the exact tail reads raw vectors for the SHORTLIST only: the
    // shortlist relation (3k rows) must broadcast into an id-keyed hash
    // join against the corpus — a cartesian there would scan the raw
    // vectors the quantized path exists to avoid. (q130's inner
    // codes⋈candidates join may legitimately sort-merge — both sides
    // are corpus-derived and shuffle by id at scale.)
    Seq("q129_pq_refine", "q130_ivfpq_refine").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("q132 (batch refine): per-query windows, shortlist broadcast, never a global sort") {
    val p = plan("q132_pq_refine_batch")
    assert(p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q123 (semantic decontamination): eval side broadcasts, corpus never shuffles for it") {
    val p = plan("q123_semantic_decontaminate")
    // the full train×eval comparison is exact BY DESIGN (contamination
    // audit); it scales because the eval side is tiny and broadcast —
    // a non-broadcast cartesian would shuffle the corpus
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q135 (bloom decontamination): sketch probes map-side, no cartesian") {
    val p = plan("q135_bloom_decontaminate")
    // the bloom rides as a scalar-subquery constant: the corpus side is
    // filtered by might_contain BEFORE the exact confirm join — a plan
    // that instead joined corpus grams against the eval table first
    // would lose the entire point of the sketch
    assert(p.contains("might_contain(Subquery"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the confirm semi-join must be an equi-join (broadcast or shuffled)
    assert(p.contains("LeftSemi"), p)
  }

  test("q118 (period predicates in SQL): plain comparisons, no cartesian") {
    // over the fold the predicate sits above the Window (nothing can
    // push through it), but it must be ORDINARY comparisons on the
    // rectangle columns, not an opaque predicate
    val p = plan("q118_period_sql")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("_valid_from") && p.contains("_system_to"), p)
  }

  test("period predicate over a scan-backed table pushes into the scan") {
    // the expansion is sargable where sargability is possible: on a
    // parquet-backed relation the CONTAINS point comparison reaches
    // PushedFilters — proof the rewrite costs nothing at 100 TB
    import graft.bitemporal.PeriodSql
    graft.Tables.load(spark, dir, "orders").createOrReplaceTempView("psql_orders")
    try {
      val q = PeriodSql.expand(
        """SELECT o_orderkey FROM psql_orders
           WHERE PERIOD(o_orderdate, o_orderdate + INTERVAL 30 DAY)
                 CONTAINS TIMESTAMP '1996-06-01 00:00:00'""")
      val p = spark.sql(q).queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters:") &&
        p.contains("LessThanOrEqual(o_orderdate"), p)
    } finally spark.catalog.dropTempView("psql_orders")
  }

  test("q140 (residual IVF-PQ): per-cell ADC table broadcasts, codes join by hash") {
    // the (cell, j, code)-keyed distance table is nProbe*m*k rows —
    // broadcast; the codes scan must hash-join against it, never
    // cartesian, and never shuffle for a tiny side
    val p = plan("q140_ivfpq_residual")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q141 (time-weighted agg): one hash aggregation, no window, no join") {
    val p = plan("q141_time_weighted")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("q142 (timeline sweep): prefix-sum windows are per-range, never single-partition") {
    // the global timeline must NOT plan Exchange SinglePartition before
    // its Window — the two-phase offset scheme keeps every window
    // partition-local (the final presentation orderBy is a range sort)
    val p = plan("q142_timeline_sweep")
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q143 (system-time diff): basis filters sargable shapes, id equi-join only") {
    val p = plan("q143_sys_diff")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("q144 (keyless interval join): bin equi-join, NEVER a cartesian product") {
    // the entire point of the binning strategy: a keyless overlap join
    // must still plan as an equi-join on the bin id
    val p = plan("q144_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }
}
