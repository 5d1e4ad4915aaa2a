package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable corpus sampling.
  *
  * Training-data pipelines need samples that are REPRODUCIBLE — the same
  * rows at every rerun, on every cluster layout, from every engine that
  * reads the table. `df.sample()` gives none of that (it is seeded per
  * partition, so a different file split changes the sample). Here the
  * keep/drop decision is a pure function of each row's key: keep iff
  * `hash60(key) < rate · 2^60`, where hash60 is the md5-prefix hash used
  * across the library (`Dedup.hash60`). Properties:
  *
  *  - deterministic under any repartitioning, file layout, or engine
  *    (md5 is the portability anchor — DuckDB spells the same predicate
  *    `CAST('0x'||substring(md5(key),1,15) AS BIGINT) < threshold`);
  *  - a narrow filter — NO shuffle, NO extra pass; it rides the scan and
  *    pushes into whole-stage codegen, the only acceptable shape for a
  *    100 TB subsample;
  *  - nested: a rate-0.1 sample is a strict subset of a rate-0.2 sample
  *    (same hash, higher threshold), which makes scaling-law data ladders
  *    (1% ⊂ 10% ⊂ 100%) consistent by construction.
  */
object Sampling {

  /** 2^60 — the hash60 value space. */
  private val Space: Double = math.pow(2.0, 60)

  /** Threshold long for a sampling rate (computed once on the driver; the
    * same literal must appear in any external mirror of the predicate). */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    if (rate >= 1.0) Long.MaxValue else math.round(rate * Space)
  }

  /** Keep rows where `hash60(key) < rate · 2^60`. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(Dedup.hash60(key.cast("string")) < lit(threshold(rate)))

  /** Stratified deterministic sample: one rate per stratum value (strata
    * not in `rates` fall back to `defaultRate`). Still a pure narrow
    * filter — the per-stratum threshold is a broadcast-free when-chain. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldRight(lit(threshold(defaultRate)): Column) {
      case ((s, r), acc) => when(stratum === s, lit(threshold(r))).otherwise(acc)
    }
    df.filter(Dedup.hash60(key.cast("string")) < thr)
  }

  /** Temperature-based mixture resampling (the multilingual sampling
    * scheme of mBERT / XLM / mT5): target share q_s ∝ n_s^α, computed
    * IN-PLAN from the stratum census itself — α = 1 reproduces the
    * natural distribution, α → 0 the uniform one; 0.5–0.8 up-weights
    * low-resource strata without drowning high-resource ones. Rates are
    * rounded to 6 dp BEFORE the keep threshold: `pow` may differ in the
    * last ulp across engines (libm vs java.lang.Math), and the rounding
    * collapses that far below the threshold granularity, keeping the
    * kept-set reproducible everywhere the hash60 predicate is.
    * Same two-narrow-pass scale shape as [[mixtureResample]]. */
  def temperatureResample(df: DataFrame, key: Column, stratum: Column,
      alpha: Double, budget: Double): DataFrame = {
    val counts = df.groupBy(stratum.as("__stratum"))
      .agg(count(lit(1)).as("__n_s"))
      .withColumn("__w", pow(col("__n_s").cast("double"), lit(alpha)))
    val total = counts.agg(sum(col("__w")).as("__z"),
      sum(col("__n_s")).as("__n_total"))
    // one fixed operation order, mirrored by the oracle
    val rates = counts.crossJoin(broadcast(total))
      .withColumn("__rate",
        round(least(lit(1.0),
          lit(budget) * col("__n_total") * (col("__w") / col("__z")) /
            col("__n_s")), 6))
      .withColumn("__thr", floor(col("__rate") * lit(Space)).cast("long"))
    // null-safe join: a null stratum is its own census group and must
    // keep its computed rate — a plain === would silently drop every
    // null-stratum row while still counting them in Z and N_total
    df.join(broadcast(rates), stratum <=> col("__stratum"))
      .filter(Dedup.hash60(key.cast("string")) < col("__thr"))
      .withColumn("sample_rate", col("__rate"))
      .drop("__stratum", "__n_s", "__w", "__z", "__n_total", "__rate", "__thr")
  }

  /** Mixture resampling — downsample each stratum so the kept corpus
    * approaches a TARGET mixture (the domain-reweighting step of a
    * training-data pipeline: "web 40%, books 30%, …" regardless of how
    * skewed the raw crawl is).
    *
    * Per stratum `s`: desired count = `budget · N_total · w_s`, so
    * rate_s = min(1, budget · N_total · w_s / n_s) — strata over their
    * target share are thinned, strata at-or-under keep everything (rates
    * are capped at 1; under-represented strata cannot be inflated, so the
    * realized mixture is exact only where the cap doesn't bind).
    *
    * Scale shape: the stratum census is ONE partial+final agg over the
    * corpus (stratum cardinality ~ tens), the rate arithmetic lives in
    * the plan (no driver collect), and the rates frame broadcast-joins
    * back — the corpus itself is touched by exactly two narrow passes.
    * The keep decision reuses the hash60 predicate, so resamples stay
    * deterministic and nested across budgets.
    *
    * @param weight  expression over the stratum column giving the target
    *                mixture weight (should sum to ~1 across strata)
    * @param budget  fraction of the total corpus to keep overall
    */
  def mixtureResample(df: DataFrame, key: Column, stratum: Column,
      weight: Column => Column, budget: Double): DataFrame = {
    val counts = df.groupBy(stratum.as("__stratum"))
      .agg(count(lit(1)).as("__n_s"))
    // N_total from the census (exact integer sum) — not a second
    // full-corpus scan
    val total = counts.agg(sum(col("__n_s")).as("__n_total"))
    // rate arithmetic in ONE fixed operation order so external mirrors
    // (the DuckDB oracle) reproduce the exact IEEE doubles
    val rates = counts.crossJoin(broadcast(total))
      .withColumn("__rate",
        least(lit(1.0),
          lit(budget) * col("__n_total") * weight(col("__stratum")) / col("__n_s")))
      .withColumn("__thr", floor(col("__rate") * lit(Space)).cast("long"))
    df.join(broadcast(rates), stratum <=> col("__stratum"))
      .filter(Dedup.hash60(key.cast("string")) < col("__thr"))
      .withColumn("sample_rate", round(col("__rate"), 6))
      .drop("__stratum", "__n_s", "__n_total", "__rate", "__thr")
  }
}
