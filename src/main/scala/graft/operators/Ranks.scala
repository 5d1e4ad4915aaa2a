package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase ordered ranking — global or per-group `row_number`/`ntile`
  * without the one-task-per-group window-sort anti-pattern.
  *
  * A plain `row_number().over(Window.partitionBy(g).orderBy(k))` sorts
  * each group in ONE task; with few (or no) groups that is a scale
  * killer. Here instead: range-partition on (group, order) keys, rank
  * locally per physical partition (balanced tasks), then add each
  * partition's cumulative row-count offset. The only no-partition work
  * runs over one row per (group, partition) — bounded by groups × the
  * shuffle partition count. NOTE the offsets frame is broadcast: at
  * LOW group cardinality (the catalog's flags/langs/classes) that is a
  * few rows; a million-group caller should pre-aggregate or shard by
  * group instead — the broadcast would then scale with the group count.
  */
object Ranks {

  /** `out` = 1-based rank of each row within its `grp` group under
    * `order`, plus `outN` = the group's total row count (handy for tile
    * math). Deterministic when (grp ++ order) is a total order; rows with
    * fully-equal keys are interchangeable. */
  def rowNumber(df: DataFrame, grp: Seq[Column], order: Seq[Column],
      out: String = "rn", outN: String = "__n"): DataFrame = {
    // alias grouping keys to generated names so arbitrary EXPRESSIONS
    // (not just named columns) work as grp — the offsets join is by name
    val grpNames = grp.indices.map(i => s"__g$i")
    val prepared = grp.zip(grpNames).foldLeft(df) {
      case (d, (c, n)) => d.withColumn(n, c)
    }
    val g = grpNames.map(col)
    val keys = g ++ order
    // persist: the partition id must be identical across the offsets
    // branch and the local-rank branch; released after the caller's
    // consuming action. (The input is deliberately NOT persisted: the
    // boundary-sampling pass re-reads upstream once, which for the
    // fact-sized frames this operator targets is cheaper at scale than a
    // fact-sized cache materialization — unlike Stats.bhAdjust, whose
    // input is a hypothesis-level frame behind an expensive fit.)
    val ranged = prepared.repartitionByRange(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    graft.Caches.releaseAfterAction(ranged)
    val counts = ranged.groupBy((g :+ col("__pid")): _*)
      .agg(count(lit(1)).as("__cnt"))
    val wOff = Window.partitionBy(g: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(g: _*)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .withColumn(outN, sum(col("__cnt")).over(wAll))
      .select((g :+ col("__pid") :+ col("__off") :+ col(outN)): _*)
    val wLocal = Window.partitionBy((g :+ col("__pid")): _*).orderBy(order: _*)
    ranged
      .withColumn("__lrn", row_number().over(wLocal))
      .join(broadcast(offsets), grpNames :+ "__pid")
      .withColumn(out, (col("__off") + col("__lrn")).cast("long"))
      // using-column joins reorder the schema (and __g*/__pid/__lrn/__off
      // are internal); restore the input's column order exactly
      .select((df.columns.toIndexedSeq.map(col) :+ col(out) :+ col(outN)): _*)
  }

  /** Global (or per-group) running total of `value` under `order` — the
    * distributed prefix-scan, built like [[rowNumber]]: range partition on
    * (group, order), sum locally per physical partition under a cumulative
    * window, then add each partition's prefix-total offset (one row per
    * (group, partition) — broadcast; see the object doc's group-
    * cardinality note). `sum`
    * over integers is exactly associative, so the result is bit-identical
    * to the one-task `sum().over(Window.orderBy(...))` formulation at any
    * partitioning; over doubles the usual float-association caveat
    * applies. Deterministic when (grp ++ order) is a total order.
    *
    * This is the backbone of sequence-packing style pipelines (cumulative
    * token budgets over a 100 TB corpus) where the naive no-partition
    * window would funnel the corpus through one task. */
  def prefixSum(df: DataFrame, grp: Seq[Column], order: Seq[Column],
      value: Column, out: String = "cumsum", outTotal: String = ""): DataFrame = {
    val grpNames = grp.indices.map(i => s"__g$i")
    val prepared = grp.zip(grpNames).foldLeft(df) {
      case (d, (c, n)) => d.withColumn(n, c)
    }.withColumn("__v", value)
    val g = grpNames.map(col)
    val keys = g ++ order
    val ranged = prepared.repartitionByRange(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    graft.Caches.releaseAfterAction(ranged)
    val sums = ranged.groupBy((g :+ col("__pid")): _*)
      .agg(sum(col("__v")).as("__psum"))
    val wOff = Window.partitionBy(g: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // `outTotal` (the per-group grand total) rides the SAME tiny offsets
    // frame — consumers needing it (quantilesOfClasses' rank target)
    // would otherwise re-execute the whole scan for a separate totals agg
    val offBase = sums
      .withColumn("__off", coalesce(sum(col("__psum")).over(wOff), lit(0L)))
    val offCols = g :+ col("__pid") :+ col("__off")
    val offsets =
      if (outTotal.isEmpty) offBase.select(offCols: _*)
      else offBase
        .withColumn(outTotal, sum(col("__psum")).over(Window.partitionBy(g: _*)))
        .select(offCols :+ col(outTotal): _*)
    val wLocal = Window.partitionBy((g :+ col("__pid")): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols = df.columns.toIndexedSeq.map(col) ++
      (if (outTotal.isEmpty) Seq(col(out)) else Seq(col(out), col(outTotal)))
    ranged
      .withColumn("__lcs", sum(col("__v")).over(wLocal))
      .join(broadcast(offsets), grpNames :+ "__pid")
      .withColumn(out, col("__off") + col("__lcs"))
      .select(outCols: _*)
  }

  /** Exact per-group quantiles through the two-phase rank — the scale-safe
    * alternative to `percentile` (which buffers each group's values in one
    * aggregator) or a one-task group-window sort. Quantile q = the value
    * at 1-based rank `ceil(q·n)` (discrete, lower-rounding — DuckDB's
    * `quantile_disc`). Stick to binary-exact q (.25, .5, .75, .125…) when
    * cross-engine bit-stability of `ceil(q·n)` matters.
    *
    * @param qs (output column name, q) pairs, each q in (0, 1]
    * @return one row per group: grp ++ (`n`, qs names…)
    */
  def quantiles(df: DataFrame, grp: Seq[String], value: String,
      tieBreak: String, qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0.0 && q <= 1.0 },
      s"quantiles must be in (0,1]: $qs")
    val ranked = rowNumber(df, grp.map(col), Seq(col(value), col(tieBreak)),
      "__rnk", "__n")
    val aggs = qs.map { case (name, q) =>
      max(when(col("__rnk") === ceil(col("__n") * q), col(value))).as(name)
    }
    ranked.groupBy(grp.map(col): _*)
      .agg(max(col("__n")).as("n"), aggs: _*)
  }

  /** Same exact quantiles as [[quantiles]] (value at 1-based rank
    * `ceil(q·n)`, `quantile_disc` semantics) but computed over the
    * DISTINCT-VALUE frame: one hash agg collapses the fact to
    * (group, value, count), the two-phase prefix scan runs over tie
    * CLASSES instead of rows, and the quantile is the class whose
    * cumulative range covers the target rank. No tiebreak column needed —
    * rank-quantile values are tie-order-independent, so the result is
    * bit-identical to [[quantiles]] under any tiebreak. Strictly cheaper
    * whenever values repeat (the fact never takes a range shuffle: only
    * its distinct frame does) and never worse than ~the same cost when
    * they don't. */
  def quantilesByValue(df: DataFrame, grp: Seq[String], value: String,
      qs: Seq[(String, Double)]): DataFrame = {
    require(grp.nonEmpty, "quantilesByValue needs grouping keys (use quantiles for global)")
    val classes = df.groupBy((grp.map(col) :+ col(value)): _*)
      .agg(count(lit(1)).as("__c"))
    quantilesOfClasses(classes, grp, value, "__c", qs)
  }

  /** [[quantilesByValue]] when the caller ALREADY HOLDS the tie-class
    * histogram (one row per (group, value) with `countCol` members) —
    * e.g. a persisted class frame serving several chained quantile
    * passes. Same `ceil(q·n)`-rank semantics. */
  def quantilesOfClasses(classes: DataFrame, grp: Seq[String], value: String,
      countCol: String, qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0.0 && q <= 1.0 },
      s"quantiles must be in (0,1]: $qs")
    require(grp.nonEmpty, "quantilesOfClasses needs grouping keys")
    // ONE pass: the prefix scan emits the per-group total alongside the
    // cumulative count (it lives on the same broadcast offsets frame), so
    // the rank target needs no second scan and no totals join
    val cum = prefixSum(
      classes.withColumn("__c", col(countCol).cast("long")),
      grp.map(col), Seq(col(value)), col("__c"), "__cum", "__n")
    val aggs = qs.map { case (name, q) =>
      val target = ceil(col("__n") * q)
      max(when(col("__cum") - col("__c") < target && target <= col("__cum"),
        col(value))).as(name)
    }
    cum.groupBy(grp.map(col): _*)
      .agg(max(col("__n")).as("n"), aggs: _*)
  }

  /** [[quantilesByValue]] through the bucket-refinement path — for
    * NUMERIC value columns (wz1's shape: fact → class histogram → exact
    * per-group bands with hash aggregations only, no range exchange). */
  def quantilesByValueBucketed(df: DataFrame, grp: Seq[String], value: String,
      qs: Seq[(String, Double)], nBuckets: Int = 4096): DataFrame = {
    require(grp.nonEmpty, "quantilesByValueBucketed needs grouping keys")
    val classes = df.groupBy((grp.map(col) :+ col(value)): _*)
      .agg(count(lit(1)).as("__c"))
    quantilesOfClassesBucketed(classes, grp, value, "__c", qs, nBuckets)
  }

  /** Exact per-group quantiles over a NUMERIC tie-class histogram via
    * BUCKET REFINEMENT — an ALTERNATIVE to [[quantilesOfClasses]] for
    * numeric values. Instead of range-exchanging the whole class frame
    * (a sampling job + sort shuffle + two windows + an offsets join),
    * this runs hash aggregations only:
    *
    *  1. per-group (min, max, n) — one map-side-combined agg;
    *  2. per-group fixed `nBuckets` histogram of the class counts — one
    *     hash agg, output bounded at groups × nBuckets;
    *  3. locate each quantile's target bucket on that BOUNDED frame
    *     (groups × buckets windows — driver-scale);
    *  4. resolve the exact class inside the target buckets only: a
    *     broadcast semi-join keeps ~1/nBuckets of the classes, and the
    *     in-bucket rank window starts from the bucket's known cumulative
    *     offset.
    *
    * Same `ceil(q·n)` rank semantics. The value column is evaluated AS
    * DOUBLE (and returned as DOUBLE): for double/float inputs results are
    * bit-identical to [[quantilesOfClasses]] (the selected value is an
    * exact class value; bucket boundaries only steer WHERE the search
    * looks, so float bucket math needs no cross-engine parity) — but
    * integers above 2^53 or decimals would lose precision in the cast,
    * so non-floating value columns should stay on the range-exchange
    * form. Scale note: step 4's window is per (group, quantile) over
    * one bucket's classes — with mass spread so no bucket holds more
    * than ~1/nBuckets of a group this is tiny; a distribution that
    * concentrates a group's whole mass inside one bucket-width of an
    * extreme outlier degrades the in-bucket frame toward the group's
    * class count (still never worse than the one-task-per-group window
    * [[quantilesOfClasses]] avoids — switch back to it, or raise
    * `nBuckets`, for such data).
    *
    * REGIME (measured, local[32] @ sf0.1): at ~600k classes / 3 groups
    * the range-exchange form is ~25% FASTER — its sort shuffle is cheap
    * and this path pays an extra cache materialization plus more jobs —
    * so the catalog queries keep [[quantilesOfClasses]]. This form's
    * shape wins when the class frame is large enough that sampling +
    * sort-shuffling it dominates (hundreds of millions of classes, wide
    * group counts): everything here is a map-side-combined hash agg and
    * only ~1/nBuckets of the classes are ever sorted. */
  def quantilesOfClassesBucketed(classes: DataFrame, grp: Seq[String],
      value: String, countCol: String, qs: Seq[(String, Double)],
      nBuckets: Int = 4096): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0.0 && q <= 1.0 },
      s"quantiles must be in (0,1]: $qs")
    require(grp.nonEmpty, "quantilesOfClassesBucketed needs grouping keys")
    val g = grp.map(col)
    // persisted: three consumers read the class frame (bounds agg, bucket
    // histogram, in-bucket resolution) — unpersisted, the upstream that
    // produced the classes would execute three times (measured 13.6 s vs
    // 8.4 s on rz1's shape). Released after the caller's action.
    val cls = classes.select((g :+ col(value).cast("double").as("__v") :+
      col(countCol).cast("long").as("__c")): _*).persist()
    graft.Caches.releaseAfterAction(cls)
    val bounds = cls.groupBy(g: _*).agg(min(col("__v")).as("__mn"),
      max(col("__v")).as("__mx"), sum(col("__c")).as("__n"))
    // bucket id: equal-width over [mn, mx], constant-only-group → bucket 0
    def bucketOf(v: Column): Column =
      when(col("__mx") === col("__mn"), lit(0L))
        .otherwise(least(
          floor((v - col("__mn")) / ((col("__mx") - col("__mn")) / nBuckets)),
          lit((nBuckets - 1).toLong)).cast("long"))
    val withB = cls.join(broadcast(bounds), grp)
      .withColumn("__b", bucketOf(col("__v")))
      // project the bounds back off: the target-bucket join below carries
      // its own __n and a duplicate would make the column ambiguous
      .select((g :+ col("__v") :+ col("__c") :+ col("__b")): _*)
    val hist = withB.groupBy((g :+ col("__b")): _*)
      .agg(sum(col("__c")).as("__bc"))
    // cumulative count below each bucket — a window over the BOUNDED
    // (groups × nBuckets) histogram, then one target-bucket row per
    // (group, quantile)
    val wB = Window.partitionBy(g: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bcum = hist
      .withColumn("__below", coalesce(sum(col("__bc")).over(wB), lit(0L)))
      .join(broadcast(bounds.select((g :+ col("__n")): _*)), grp)
    val targets = qs.map { case (name, q) =>
      val t = ceil(col("__n") * q).cast("long")
      bcum.filter(col("__below") < t && t <= col("__below") + col("__bc"))
        .select((g :+ col("__b") :+ col("__below") :+ col("__n") :+
          lit(name).as("__q") :+ t.as("__t")): _*)
    }.reduce(_.unionByName(_))
    // resolve inside the target buckets only: classes there are ~1/nBuckets
    // of the group, the rank window resumes from the bucket's offset
    val inBucket = withB.join(broadcast(targets), grp :+ "__b")
    val wIn = Window.partitionBy((g :+ col("__q")): _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = inBucket
      .withColumn("__cum", col("__below") + sum(col("__c")).over(wIn))
      .filter(col("__cum") - col("__c") < col("__t") &&
        col("__t") <= col("__cum"))
      .select((g :+ col("__q") :+ col("__v") :+ col("__n")): _*)
    // pivot the (group, quantile) rows back to one row per group
    picked.groupBy(g: _*).agg(
      max(col("__n")).as("n"),
      qs.map { case (name, _) =>
        max(when(col("__q") === name, col("__v"))).as(name)
      }: _*)
  }

  /** SQL `NTILE(tiles)` semantics via the two-phase rank: the first
    * `n % tiles` tiles hold `ceil(n/tiles)` rows, the rest `floor`.
    * (`/` on Columns is double division — `floor` recovers the integer
    * quotient; values stay far below 2^53.) */
  def ntile(df: DataFrame, grp: Seq[Column], order: Seq[Column], tiles: Int,
      out: String = "tile"): DataFrame = {
    val ranked = rowNumber(df, grp, order, "__rnk", "__n")
    val small = floor(col("__n") / tiles) // floor tile size
    val bigger = col("__n") % tiles // tiles holding one extra row
    val boundary = bigger * (small + 1) // ranks covered by the big tiles
    ranked
      .withColumn(out,
        when(col("__rnk") <= boundary,
          floor((col("__rnk") - 1) / (small + 1)) + 1)
          .otherwise(bigger + floor((col("__rnk") - boundary - 1) / small) + 1)
          .cast("int"))
      .drop("__rnk", "__n")
  }
}
