package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) clustering — multi-dimensional data skipping
  * for the predicates [[Partitioning]] can't serve.
  *
  * Partitioning prunes on ONE low-cardinality column; sorting the files
  * by a single column gives tight parquet min/max stats on that column
  * only. A table queried by boxes over TWO+ columns (user × time,
  * gene × sample, lat × lon) wants every file to cover a small
  * hyper-rectangle of the combined space — exactly what ordering by the
  * interleaved bits of the columns produces: consecutive Morton keys are
  * spatially local, so `repartitionByRange(zvalue)` + a within-partition
  * sort leaves each FILE with narrow min/max ranges on EVERY z-column,
  * and a plain parquet scan with a box predicate skips most row groups
  * from footer stats alone, no special reader needed.
  *
  * Scale shape: the only coordination is one approx-quantile pass over
  * the z-columns (a (2^bits−1)-scalar collect per column — the same
  * bounded-broadcast shape as the VST trend) and the range-exchange's
  * sampling pass; the layout write itself is the shuffle you'd pay for
  * any clustered rewrite, paid ONCE at ingest. Ranks are QUANTILE
  * buckets, not linear min→max scaling: skew in a z-column would
  * otherwise park most rows in a few rank values and let the other
  * column's bits dominate the curve — the layout silently degrades to
  * single-column clustering exactly where the data is dense (observed:
  * a p45–p55 slab on the skewed `value` column hit 13/16 linear-scaled
  * files; quantile scaling at most half — asserted in
  * PartitioningSpec). Equal-count buckets are what
  * Delta/Iceberg OPTIMIZE ZORDER implementations use (range-partition
  * ids) for the same reason.
  *
  * Effectiveness is asserted in PartitioningSpec: a 2-D box scan over
  * the z-ordered layout reads strictly fewer files than the same scan
  * over a 1-D-sorted layout of the same data (executed-plan `numFiles`
  * metrics), with identical results.
  */
object Zorder {

  /** Morton key of pre-scaled non-negative integer ranks (each already in
    * `[0, 2^bits)`): bit i of rank j lands at interleaved position
    * `i·k + j`. Pure bitwise built-ins — codegen'd, no UDF. */
  private[graft] def interleave(ranks: Seq[Column], bits: Int): Column = {
    val k = ranks.size
    val terms = for {
      i <- 0 until bits
      (r, j) <- ranks.zipWithIndex
    } yield shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The z-value column for `df` over numeric `cols`: each column mapped
    * to its `bits`-bit QUANTILE-bucket rank (boundaries from one bounded
    * `approxQuantile` collect; rank = branchless sum of boundary
    * indicators, codegen'd), ranks bit-interleaved. NULL in any z-column
    * maps to rank 0 (sorts first, stats stay correct). */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 4): Column = {
    require(cols.nonEmpty && cols.size * bits <= 62,
      s"zvalue: ${cols.size} cols x $bits bits must fit a long")
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val doubled = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    // ONE pass computes every column's boundaries (the per-column
    // overload would rescan the input cols.size times)
    val allBounds = doubled.stat
      .approxQuantile(cols.toArray, probs, 1.0 / (buckets * 64))
    val ranks = cols.zipWithIndex.map { case (c, ci) =>
      val bounds = allBounds(ci)
      // strictly-greater indicators: duplicate boundaries (heavy ties)
      // simply collapse adjacent ranks
      bounds.distinct.foldLeft(lit(0L)) { (acc, b) =>
        acc + when(col(c).cast("double") > lit(b), 1L).otherwise(0L)
      }
    }
    interleave(ranks, bits)
  }

  /** Materialize `df` as parquet clustered on the Morton curve of `cols`:
    * `files` range partitions of the z-value, rows sorted by it inside
    * each, one file per partition. Read back with a plain
    * `spark.read.parquet` — skipping comes from footer stats. */
  def writeZordered(df: DataFrame, path: String, cols: Seq[String],
      files: Int, bits: Int = 4): Unit =
    df.withColumn("__z", zvalue(df, cols, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
