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
    // the fact plan feeds the geomean agg, the ratio join, and the final
    // normalize join — persist so Spark computes it once instead of 3x
    // (the in-memory form of the reference's saveRDS checkpoint, A3)
    val c = counts.persist()
    val sf = sizeFactors(c, geneCol, sampleCol, countCol)
    c.join(broadcast(sf), sampleCol)
      .withColumn("vst", log2(col(countCol) / col("size_factor") + 1))
  }
}
