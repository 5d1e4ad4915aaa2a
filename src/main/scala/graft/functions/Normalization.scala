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
      countCol: String): DataFrame = {
    // Per-gene geometric mean across samples (counts > 0, as DESeq2 does
    // with its log-based geomean).
    val geomean = counts
      .filter(col(countCol) > 0)
      .groupBy(geneCol)
      .agg(exp(avg(log(col(countCol)))).as("geomean"))
    // Per-sample median of count/geomean ratios. Exact percentile here
    // (matches the oracle); swap to percentile_approx for the 100 TB path
    // where a 1e-4-accurate size factor is statistically identical.
    counts
      .filter(col(countCol) > 0)
      .join(broadcast(geomean), geneCol)
      .withColumn("ratio", col(countCol) / col("geomean"))
      .groupBy(sampleCol)
      .agg(expr("percentile(ratio, 0.5)").as("size_factor"))
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
    val sf = sizeFactors(counts, geneCol, sampleCol, countCol)
    counts
      .join(broadcast(sf), sampleCol)
      .withColumn("vst", log2(col(countCol) / col("size_factor") + 1))
  }
}
