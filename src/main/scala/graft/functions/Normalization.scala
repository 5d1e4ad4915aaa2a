package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DESeq2-style count normalization (reference: `DESeq()` size factors and
  * `vst()`, vital_status_DESeq.R:51,100-101 — Love et al. 2014
  * median-of-ratios), re-expressed as two shuffle-lean grouped aggregations.
  *
  * Scale: both aggregations are partial+final hash aggs keyed by columns
  * with high cardinality (gene / sample), so they parallelize across
  * executors with no skew hot-spot; the geomean dim joined back is
  * broadcast when small.
  */
object Normalization {

  /** Median-of-ratios size factors.
    *
    * @param counts long-form fact `(geneCol, sampleCol, countCol)`
    * @return one row per sample: `(sampleCol, size_factor)`
    */
  def sizeFactors(counts: DataFrame, geneCol: String, sampleCol: String,
      countCol: String, exact: Boolean = true): DataFrame = {
    // Per-gene geometric mean across samples (counts > 0, as DESeq2 does
    // with its log-based geomean).
    val geomean = counts
      .filter(col(countCol) > 0)
      .groupBy(geneCol)
      .agg(exp(avg(log(col(countCol)))).as("geomean"))
    // Per-sample median of count/geomean ratios. exact=true buffers each
    // sample's ratios for a true median (oracle-matching; fine while
    // |genes| fits a task). exact=false is the 100 TB path: a bounded-
    // memory t-digest sketch whose ~1e-4-relative-error median is
    // statistically identical for normalization purposes.
    // (A rank-window exact median — row_number + count windows + an extra
    // agg — was benched and rejected: same shuffle volume, and the added
    // window pass costs more than the off-codegen ObjectHashAggregate
    // saves at per-sample group sizes.)
    val median =
      if (exact) expr("percentile(ratio, 0.5)")
      else percentile_approx(col("ratio"), lit(0.5), lit(10000))
    counts
      .filter(col(countCol) > 0)
      .join(broadcast(geomean), geneCol)
      .withColumn("ratio", col(countCol) / col("geomean"))
      .groupBy(sampleCol)
      .agg(median.as("size_factor"))
  }

  /** Parametric dispersion-trend VST — DESeq2's closed-form variance-
    * stabilizing transform (Love et al. 2014; `vst(blind=F)` at
    * vital_status_DESeq.R:100): fit the mean-dispersion trend
    * `α(μ) = a0 + a1/μ` across genes (method-of-moments gene dispersions,
    * OLS on x = 1/μ), then apply
    * `vst(q) = log2((1 + a1 + 2·a0·q + 2·√(a0·q·(1 + a1 + a0·q))) / (4·a0))`
    * to each normalized count q = count/size_factor.
    *
    * Deviation note: DESeq2 fits the trend by gamma-family GLM with
    * outlier re-weighting; the OLS trend here keeps the same functional
    * form and closed-form transform (and is exactly reproducible in the
    * DuckDB oracle). Three aggregations total — per-gene moments, the
    * 1-row trend fit (broadcast back), then a scalar map.
    *
    * @return input plus `size_factor`, `q`, and `vst` columns
    */
  def vstTrend(counts: DataFrame, geneCol: String, sampleCol: String,
      countCol: String): DataFrame = {
    // No persist: the repeated references to `counts` end in identical
    // Exchange subtrees, so one action computes the scan + partial agg once
    // and the other branches read the reused shuffle output (Catalyst
    // ReuseExchange). A cache would add a fact-sized materialization for
    // sharing the plan already gets for free (benched: persist cost d6b
    // +56% at sf0.1). Callers composing this into multi-action pipelines
    // persist the *input* themselves.
    val c = counts
    val sf = sizeFactors(c, geneCol, sampleCol, countCol)
    val q = c.join(broadcast(sf), sampleCol)
      .withColumn("q", col(countCol) / col("size_factor"))
    val geneStats = q.groupBy(geneCol).agg(
      avg(col("q")).as("mu"),
      var_samp(col("q")).as("v"))
      .filter(col("mu") > 0 && col("v").isNotNull)
      .withColumn("disp",
        greatest((col("v") - col("mu")) / (col("mu") * col("mu")), lit(1e-8)))
      .withColumn("x", lit(1.0) / col("mu"))
    val trend = geneStats.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("disp")).as("sy"),
      sum(col("x") * col("disp")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
      .withColumn("a1", greatest(
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), lit(0.0)))
      .withColumn("a0", greatest(
        (col("sy") - col("a1") * col("sx")) / col("n"), lit(1e-8)))
      .select("a0", "a1")
    q.crossJoin(broadcast(trend))
      .withColumn("vst", log2(
        (lit(1.0) + col("a1") + lit(2.0) * col("a0") * col("q") +
          lit(2.0) * sqrt(col("a0") * col("q") *
            (lit(1.0) + col("a1") + col("a0") * col("q")))) /
          (lit(4.0) * col("a0"))))
      .drop("a0", "a1")
  }

  /** DESeq2's EXACT closed-form VST given FITTED trend parameters — the
    * fit/apply split of `vst(data, blind = F)`
    * (surv_analysis_median_exp.R:56-57): `a0` is the trend's asymptotic
    * dispersion and `a1` its extra-Poisson term (α(μ) = a0 + a1/μ, the
    * gamma-GLM trend `DiffExpression.dispersionPrior` fits), and the
    * transform is DESeq2's closed form
    * `log2((1 + a1 + 2·a0·q + 2·√(a0·q·(1 + a1 + a0·q))) / (4·a0))`
    * over q = count/size_factor. The FIT runs once at freeze time
    * (FrozenModels.vstTrendA0/A1 — the design-aware d3 dispersion trend
    * on sf0.001); given the two scalars the apply stage is deterministic
    * double arithmetic, so the catalog query (`d6c_vst_exact`) carries a
    * full DuckDB hash oracle. This closes the SURVEY §7.4/§7.5 "exact
    * VST" deviation: `vstTrend` keeps the same closed form but re-fits
    * an OLS trend in-query; `vst` is the log2(q+1) approximation.
    *
    * @return input plus `size_factor`, `q`, and `vst` columns */
  def vstClosedForm(counts: DataFrame, geneCol: String, sampleCol: String,
      countCol: String, a0: Double, a1: Double): DataFrame = {
    require(a0 > 0 && a1 >= 0, s"vstClosedForm needs a0 > 0, a1 >= 0; got ($a0, $a1)")
    // No persist — the ReuseExchange argument of vstTrend above
    val c = counts
    val sf = sizeFactors(c, geneCol, sampleCol, countCol)
    c.join(broadcast(sf), sampleCol)
      .withColumn("q", col(countCol) / col("size_factor"))
      .withColumn("vst", log2(
        (lit(1.0) + lit(a1) + lit(2.0) * lit(a0) * col("q") +
          lit(2.0) * sqrt(lit(a0) * col("q") *
            (lit(1.0) + lit(a1) + lit(a0) * col("q")))) /
          (lit(4.0) * lit(a0))))
  }

  /** VST-approximate normalized counts: `log2(count / size_factor + 1)`.
    * Documented deviation from DESeq2's exact VST (which needs the fitted
    * dispersion trend, SURVEY.md §7.5): the rlog-style transform keeps the
    * same monotone, homoskedastic-ish scale the downstream median-split and
    * boxplots need.
    *
    * @return input plus `size_factor` and `vst` columns
    */
  def vst(counts: DataFrame, geneCol: String, sampleCol: String,
      countCol: String): DataFrame = {
    // No persist — same ReuseExchange argument as vstTrend above: the three
    // references to the fact plan share one shuffle write per action.
    val c = counts
    val sf = sizeFactors(c, geneCol, sampleCol, countCol)
    c.join(broadcast(sf), sampleCol)
      .withColumn("vst", log2(col(countCol) / col("size_factor") + 1))
  }
}
