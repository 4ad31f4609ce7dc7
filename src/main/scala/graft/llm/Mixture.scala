package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-mix composition operators: exact-count domain sampling and
  * per-domain quantile gates — the steps that turn a scored, deduped
  * corpus into the dataset a training run actually reads.
  *
  * Both are deterministic (md5 priorities / exact percentiles, no RNG)
  * so a mix is reproducible from the corpus alone.
  */
object Mixture {

  /** Largest-remainder (Hamilton) apportionment of `total` over the
    * weight map: floor the exact quotas, hand the leftover units to the
    * largest fractional remainders (ties by domain name). Pure driver
    * arithmetic on the ≤|domains|-entry map — no data touched. */
  def apportion(weights: Map[String, Double], total: Long): Map[String, Long] = {
    require(weights.nonEmpty, "apportion: empty weight map")
    require(weights.values.forall(_ >= 0) && weights.values.sum > 0,
      "apportion: weights must be non-negative with positive sum")
    require(total >= 0, "apportion: negative total")
    val wsum = weights.values.sum
    val exact = weights.toSeq.sortBy(_._1)
      .map { case (d, w) => (d, total * w / wsum) }
    val base = exact.map { case (d, q) => (d, q.toLong) }
    val left = total - base.map(_._2).sum
    val bump = exact.map { case (d, q) => (d, q - q.toLong) }
      .sortBy { case (d, r) => (-r, d) }
      .take(left.toInt).map(_._1).toSet
    base.map { case (d, q) => (d, q + (if (bump(d)) 1L else 0L)) }.toMap
  }

  /** Exact-count domain mixture sample — "the run needs `total` documents
    * at weights w_d per domain". Quotas come from [[apportion]]; within a
    * domain the quota is filled by deterministic hash priority
    * (md5 of the id, ties by id), so the output size is exact
    * (Σ min(quota_d, |domain_d|)), reproducible, and independent of
    * partitioning — unlike rate-based stratified sampling (q97) whose
    * output size is only expected. A domain smaller than its quota
    * contributes its whole population; the shortfall is NOT reallocated
    * (reallocation makes every domain's membership depend on every
    * other domain's cardinality — a second global pass at 100 TB for a
    * handful of rows; callers who care re-run with adjusted weights).
    * Domains present in the data but ABSENT from the weight map are
    * treated as weight 0 and dropped — but only deliberately:
    * `strict = true` (the default) first runs a cheap aggregate over
    * the distinct observed domains and throws if any is unlisted, so a
    * typo'd weight key fails loudly instead of silently shrinking the
    * mix. Pass `strict = false` to skip that pre-pass when unlisted
    * domains are intended (e.g. a weights map that names an explicit
    * subcorpus).
    *
    * Scale shape: one shuffle keyed by the domain for the per-domain
    * rank, plus a broadcast join against the ≤|domains|-row quota
    * relation. With FEW, HUGE domains the rank partition is the
    * hotspot; the refinement at that scale is a two-pass threshold cut
    * (estimate the quota-th smallest hash from a sample, pre-filter to
    * that sliver, rank only survivors) — same results, rank input cut
    * to ~quota rows; not wired here because it trades exactness
    * guarantees for the prefilter unless a per-domain count check
    * backs it up. */
  def mixtureSample(df: DataFrame, idCol: String, domainCol: String,
                    weights: Map[String, Double], total: Long,
                    strict: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    // the strict probe is an EXECUTION-time guard (it runs a bounded
    // job); under plans-only mode (EXPLAIN substitution) nothing may
    // execute — the check re-runs when the statement actually runs
    if (strict && !graft.util.PlansOnly.active) {
      // filter-to-offenders EXECUTOR-side, then cap the collect: the
      // happy path still collects 0 rows, but a misconfigured domain
      // column (the exact mistake strict mode exists to catch) can be
      // arbitrarily high-cardinality — an unbounded distinct-collect
      // would OOM the driver before the require ever fired
      val listed = weights.keySet
      val unlisted = df.select(col(domainCol).cast("string").as("_d"))
        .filter(col("_d").isNotNull && !col("_d").isin(listed.toSeq: _*))
        .distinct().limit(21).collect().map(_.getString(0))
      val shown =
        if (unlisted.length > 20)
          unlisted.sorted.take(20).mkString(", ") + ", … (truncated)"
        else unlisted.sorted.mkString(", ")
      require(unlisted.isEmpty,
        s"mixtureSample: domains in data but not in weights " +
          s"(pass strict=false to drop them): $shown")
    }
    val quotas = apportion(weights, total).toSeq.sortBy(_._1)
    val qdf = spark.createDataFrame(quotas).toDF(domainCol, "_quota")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(qdf), Seq(domainCol))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= col("_quota"))
      .drop("_rk", "_quota")
  }

  /** Keep rows whose score clears their domain's exact `q`-quantile
    * (linear interpolation — Spark `percentile`, DuckDB/Postgres
    * `quantile_cont`/`percentile_cont`): the per-domain quality gate
    * ("top 30% of each language by classifier score") that a global
    * threshold gets wrong when score distributions differ by domain.
    *
    * Scale shape: one aggregation shuffle for the ≤|domains|-row
    * threshold relation (exact percentile spills sorted runs — fine at
    * any domain size), broadcast back, filter map-side. Swap the agg to
    * `percentile_approx` when thresholds may be approximate. */
  def quantileKeep(df: DataFrame, domainCol: String, scoreCol: String,
                   q: Double): DataFrame = {
    require(q >= 0 && q <= 1, "quantileKeep: q must be in [0,1]")
    // backtick-quote the score references: the SQL interpolation AND
    // col() (which parses dots as struct access) both break on names
    // with spaces/dots unless quoted
    val sq = "`" + scoreCol.replace("`", "``") + "`"
    val thr = df.groupBy(col(domainCol))
      .agg(expr(s"percentile($sq, $q)").as("_thr"))
    df.join(broadcast(thr), Seq(domainCol))
      .filter(col(sq) >= col("_thr"))
      .drop("_thr")
  }
}
