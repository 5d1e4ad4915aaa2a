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
}
