package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DDSketch-style quantile sketching (Masson, Lee & Rim, "DDSketch: a
  * fast and fully-mergeable quantile sketch with relative-error
  * guarantees", VLDB 2019) — the quantile member of the repo's sketch
  * family beside HLL cardinality (`hl1`) and Misra–Gries heavy hitters
  * (`expressions/FreqSketch`).
  *
  * The sketch is a log-spaced histogram: value x > 0 lands in bucket
  * `i = ⌈ln(x)/ln(γ)⌉` with `γ = (1+α)/(1−α)`, and every value in bucket
  * i lies in (γ^(i−1), γ^i], so the midpoint-style estimator
  * `2γ^i/(γ+1)` is within relative error α of ANY member — hence within
  * α of the exact rank-q quantile. Unlike GK/t-digest, the bucket
  * histogram is a pure `groupBy(bucket).count`: deterministic,
  * merge-ORDER-INDEPENDENT (merging sketches = adding histograms), and
  * replayable in plain SQL — which is why `qd1` carries a full hash
  * oracle where other engines' quantile sketches get rows-only checks.
  *
  * Scale shape: the histogram agg is a map-side-combined hash agg over
  * the fact (the only full-data pass — no range shuffle, no sort); the
  * rank selection then runs on (groups × buckets) rows, and the bucket
  * count is bounded by the value DYNAMIC RANGE — ln(max/min)/ln(γ) ≈
  * 690·ln(max/min) buckets at α = 1% — not by the row count. A 100 TB
  * column with values spanning 12 decades still produces ≤ ~19k buckets
  * per group: the post-histogram windows are driver-free but effectively
  * constant-sized.
  *
  * Cross-engine float parity: `ln(γ)` is computed ONCE here and
  * interpolated into the oracle SQL as the same decimal literal, so both
  * engines divide by the identical double; only `ln(x)` itself is libm-
  * dependent, and a bucket flip needs x within ~1 ulp of a bucket
  * boundary (measure-zero on real data; documented, not defended).
  */
object Sketches {

  /** PORTABLE HyperLogLog (Flajolet et al. 2007) over the engine's own
    * md5-derived 60-bit hash ([[Dedup.hash60]]) — the ORACLE-ABLE sibling
    * of `approx_count_distinct` (hl1): Spark's built-in HLL++ hashes with
    * an engine-internal xxhash, so its estimate can never cross-engine
    * match; this one derives every register from a portable hash, keeps
    * the register sum in EXACT integer arithmetic (Σ 2^(maxRank−M_j)
    * ≤ m·2^49 < 2^62 — association-free, unlike the float Σ 2^(−M_j)),
    * and applies the standard estimator + linear-counting small-range
    * correction as closed-form arithmetic both engines replay
    * bit-for-bit. (The large-range correction is omitted identically on
    * both sides — it only matters beyond ~2^55 distinct values.)
    *
    * Scale shape: identical to hl1 — one narrow hash pass, a
    * (groups × m)-bounded register aggregation with map-side combine,
    * then per-group O(1) arithmetic. Registers, not values, cross the
    * wire.
    *
    * @param p register-index bits (m = 2^p registers; rsd ≈ 1.04/√m)
    * @return one row per group: grp ++ (n_buckets_used, est) */
  def portableHllDistinct(df: DataFrame, grp: Seq[String], valueCol: String,
      p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 20, s"p must be in [4,20]: $p")
    require(grp.nonEmpty, "portableHllDistinct needs grouping keys")
    val m = 1 << p
    val maxRank = 60 - p + 1 // rem has 60-p bits; rank = zeros+1 ∈ [1, maxRank]
    val g = grp.map(col)
    // NULLs are not values: drop them like approx_count_distinct does —
    // left in, hash60(NULL) would mint a phantom NULL register that
    // shrinks the empty-bucket count and biases the estimate upward
    val regs = df
      .filter(col(valueCol).isNotNull)
      .withColumn("__h", Dedup.hash60(col(valueCol)))
      .withColumn("__b", col("__h").bitwiseAND(lit((m - 1).toLong)))
      .withColumn("__rem", shiftright(col("__h"), p))
      // leading-zero rank via the minimal binary string: bin(rem) carries
      // no leading zeros, so its length IS rem's bit length (both engines)
      .withColumn("__rank", when(col("__rem") === 0L, lit(maxRank.toLong))
        .otherwise(lit(maxRank.toLong) - length(bin(col("__rem")))))
      .groupBy((g :+ col("__b")): _*).agg(max(col("__rank")).as("__reg"))
    // the whole numerator as ONE double, computed by the SAME function an
    // oracle embeds (the qd1 lnGamma convention) — a second hand-written
    // copy of the expression could drift and break bit-parity
    val num = hllNumerator(p)
    regs.groupBy(g: _*).agg(
        count(lit(1)).as("__used"),
        // the SQL ShiftLeft expression takes a column shift amount (the
        // functions-API overload only takes a literal Int)
        sum(expr(s"shiftleft(1L, cast($maxRank - __reg as int))"))
          .as("__s_used"))
      .withColumn("__sint",
        col("__s_used") + (lit(m.toLong) - col("__used")) * lit(1L << maxRank))
      .withColumn("__v", lit(m.toLong) - col("__used"))
      .withColumn("__e", lit(num) / col("__sint"))
      .withColumn("est", round(
        when(col("__v") > 0 && col("__e") <= lit(2.5 * m),
          lit(m.toDouble) * log(lit(m.toDouble) / col("__v")))
          .otherwise(col("__e")), 6))
      .select((g :+ col("__used").as("n_buckets_used") :+ col("est")): _*)
  }

  /** One Count-Min probe coordinate: h_r(key) = hash60("cm:" + r + ":" +
    * key) mod `width` — the ONE copy of the row-hash idiom shared by
    * register build and estimate so the two can never probe different
    * cells. */
  def cmColumnOf(r: Column, key: Column, width: Int): Column =
    Dedup.hash60(concat(lit("cm:"), r.cast("string"), lit(":"), key)) %
      width.toLong

  /** Portable Count-Min sketch registers (Cormode & Muthukrishnan 2005):
    * register(r, c) = Σ counts of keys with h_r(key) = c, for `depth`
    * independent rows of `width` cells. Built from a KEY-COUNT frame
    * (type-sized) rather than raw occurrences, so the depth-way fan-out
    * touches the vocabulary, not the corpus, and the register table is
    * depth·width cells REGARDLESS of data size — mergeable O(1) sketch
    * state (registers of shards add cell-wise; the update is a sum, so
    * pre-aggregated counts fold in exactly). All-integer arithmetic —
    * fully replayable cross-engine, unlike a float sketch. */
  def countMinRegisters(counts: DataFrame, keyCol: String, cntCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
    counts
      .withColumn("__r",
        explode(array((0 until depth).map(i => lit(i)): _*)))
      .withColumn("__c", cmColumnOf(col("__r"), col(keyCol), width))
      .groupBy(col("__r").as("r"), col("__c").as("c"))
      .agg(sum(col(cntCol)).as("reg"))
  }

  /** Count-Min point estimates for the keys in `keys`: est(key) =
    * min over rows r of register(r, h_r(key)) — an OVERestimate of the
    * true count with P[err > εN] ≤ δ at width = e/ε, depth = ln(1/δ).
    * A register cell no build-side key ever hashed to holds 0 (LEFT join
    * + coalesce), so CM's any-key contract holds: a never-seen probe key
    * whose cells are all unpopulated estimates 0, and a partially
    * colliding one takes the true min including empty cells — an inner
    * join would silently drop or inflate such keys. The register table
    * is depth·width rows, so it rides a broadcast join; output keeps
    * every column of `keys` plus `est`. */
  def countMinEstimate(keys: DataFrame, keyCol: String, regs: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val kcols = keys.columns.toIndexedSeq
    keys
      .withColumn("__r",
        explode(array((0 until depth).map(i => lit(i)): _*)))
      .withColumn("__c", cmColumnOf(col("__r"), col(keyCol), width))
      .join(broadcast(regs),
        col("__r") === col("r") && col("__c") === col("c"), "left")
      .groupBy(kcols.map(col): _*)
      .agg(min(coalesce(col("reg"), lit(0L))).as("est"))
  }

  /** The [[portableHllDistinct]] numerator literal for an oracle at the
    * same `p` — exposed so SQL embeds the IDENTICAL double. */
  def hllNumerator(p: Int): Double = {
    val m = 1 << p
    // the Flajolet et al. bias constants: the asymptotic form holds only
    // for m >= 128 (p >= 7); the three small-m cases have their own
    // tabulated values — using the asymptotic one at p=4..6 carries
    // avoidable bias (cross-engine parity was unaffected since both
    // sides embed this same function, but the ESTIMATE was off)
    val alphaM = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    alphaM * m * m * math.pow(2.0, (60 - p + 1).toDouble)
  }

  /** γ = (1+α)/(1−α): consecutive bucket boundaries' ratio. */
  def gamma(alpha: Double): Double = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    (1.0 + alpha) / (1.0 - alpha)
  }

  /** ln γ — the bucket-index divisor, shared verbatim with oracle SQL. */
  def lnGamma(alpha: Double): Double = math.log(gamma(alpha))

  /** Bucket index i = ⌈ln(x)/ln(γ)⌉ for x > 0 (null otherwise). */
  def ddIndex(value: Column, alpha: Double): Column =
    when(value > 0, ceil(log(value) / lit(lnGamma(alpha))).cast("long"))

  /** Key offset separating the three signed stores: |⌈ln(x)/ln(γ)⌉| is
    * bounded by ln(DoubleMax)/ln(γ) ≈ 709/ln(γ) — at α ≥ 0.1% that is
    * < 10⁶, so ±10⁶ cleanly brackets zero. */
  private val SignOffset = 1000000L

  /** ORDER-PRESERVING bucket key over the full real line (the paper's
    * two-store + zero-bucket layout folded into one orderable key):
    * x > 0 → `+10⁶ + ⌈ln(x)/ln(γ)⌉`, x = 0 → 0, x < 0 → the mirrored
    * negative store `−10⁶ − ⌈ln(−x)/ln(γ)⌉`. Key order = value order, so
    * the SAME cum-count rank selection works unchanged. */
  def ddIndexSigned(value: Column, alpha: Double): Column = {
    val lg = lit(lnGamma(alpha))
    when(value > 0, lit(SignOffset) + ceil(log(value) / lg).cast("long"))
      .when(value === 0, lit(0L))
      .otherwise(lit(-SignOffset) - ceil(log(-value) / lg).cast("long"))
  }

  /** Representative value for a signed key: ±2γ^|i|/(γ+1), exactly 0 for
    * the zero bucket — within α RELATIVE error of every member. */
  def ddEstimateSigned(bucket: Column, alpha: Double): Column = {
    val g = gamma(alpha)
    val coef = lit(2.0 / (g + 1.0))
    when(bucket > 0, coef * pow(lit(g), (bucket - lit(SignOffset)).cast("double")))
      .when(bucket === 0, lit(0.0))
      .otherwise(-coef * pow(lit(g), (-bucket - lit(SignOffset)).cast("double")))
  }

  /** Representative value for bucket i: 2γ^i/(γ+1) — within α relative
    * error of every member of (γ^(i−1), γ^i]. */
  def ddEstimate(bucket: Column, alpha: Double): Column = {
    val g = gamma(alpha)
    lit(2.0 / (g + 1.0)) * pow(lit(g), bucket.cast("double"))
  }

  /** Per-group sketch histogram: one row per (group, bucket) with the
    * member count — the mergeable sketch state itself (union of two
    * corpora = same frame unioned + re-summed). Values ≤ 0 are outside
    * the sketch's domain and are dropped (DDSketch's positive store). */
  def ddHistogram(df: DataFrame, grp: Seq[String], value: String,
      alpha: Double): DataFrame =
    df.filter(col(value) > 0 && abs(col(value)) <= lit(Double.MaxValue))
      .select(grp.map(col) :+ ddIndex(col(value), alpha).as("bucket"): _*)
      .groupBy((grp.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("c"))

  /** Per-group α-relative-error quantiles from the sketch: the estimate
    * of the bucket holding 1-based rank ⌈q·n⌉ (the same discrete-rank
    * convention as [[Ranks.quantiles]], so the α guarantee is against
    * `quantile_disc`). One fact pass (the histogram), then
    * constant-sized windows.
    *
    * @param qs (output column name, q) pairs, q in (0, 1]
    * @return one row per group: grp ++ (`n`, estimates…)
    */
  def ddQuantiles(df: DataFrame, grp: Seq[String], value: String,
      alpha: Double, qs: Seq[(String, Double)]): DataFrame =
    ddQuantilesOfHistogram(ddHistogram(df, grp, value, alpha), grp, alpha, qs)

  /** Full-real-line sketch histogram: [[ddIndexSigned]] keys, nothing
    * dropped (negative and zero values land in their own stores). */
  def ddHistogramSigned(df: DataFrame, grp: Seq[String], value: String,
      alpha: Double): DataFrame = {
    // bound uses ln of the smallest SUBNORMAL (|ln(4.9e-324)| ≈ 744.5),
    // not ln(DoubleMax) ≈ 709 — a subnormal's index magnitude is larger
    require(745.0 / lnGamma(alpha) < SignOffset,
      s"alpha $alpha too fine for the signed key offset")
    // non-finite values are outside the sketch domain on BOTH stores:
    // NaN would land in a finite bucket (Spark: NaN > 0 is true, ceil
    // maps NaN to 0) and ±Inf overflows the signed key arithmetic
    df.filter(col(value).isNotNull && abs(col(value)) <= lit(Double.MaxValue))
      .select(grp.map(col) :+ ddIndexSigned(col(value), alpha).as("bucket"): _*)
      .groupBy((grp.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** [[ddQuantiles]] over the FULL real line: signed keys are
    * order-preserving, so the identical cum-count selection applies;
    * estimates come from [[ddEstimateSigned]]. α relative error against
    * |true value|, exact for the zero bucket. */
  def ddQuantilesSigned(df: DataFrame, grp: Seq[String], value: String,
      alpha: Double, qs: Seq[(String, Double)]): DataFrame =
    selectQuantiles(ddHistogramSigned(df, grp, value, alpha), grp, qs,
      ddEstimateSigned(col("bucket"), alpha))

  /** [[ddQuantiles]]' selection stage when the caller ALREADY HOLDS the
    * sketch histogram (`grp ++ (bucket, c)` — e.g. the output of
    * [[ddHistogram]], a persisted sketch artifact, or the emitted state
    * of the streaming windowed sketch). This split is the serving
    * pattern: the histogram is the cheap mergeable thing pipelines
    * store/stream; quantile extraction is a constant-sized afterthought
    * run wherever it's needed. */
  def ddQuantilesOfHistogram(hist: DataFrame, grp: Seq[String],
      alpha: Double, qs: Seq[(String, Double)]): DataFrame =
    selectQuantiles(hist, grp, qs, ddEstimate(col("bucket"), alpha))

  /** Shared rank-selection stage: cum counts over bucket order, pick the
    * bucket covering rank ⌈q·n⌉, emit `estimate` for it. */
  private def selectQuantiles(hist: DataFrame, grp: Seq[String],
      qs: Seq[(String, Double)], estimate: Column): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0.0 && q <= 1.0 },
      s"quantiles must be in (0,1]: $qs")
    require(grp.nonEmpty, "ddQuantiles needs grouping keys")
    val g = grp.map(col)
    val byGrp = Window.partitionBy(g: _*)
    val cum = hist
      .withColumn("__cum", sum(col("c")).over(byGrp.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("c")).over(byGrp))
    val aggs = qs.map { case (name, q) =>
      val target = ceil(col("__n") * q)
      max(when(col("__cum") - col("c") < target && target <= col("__cum"),
        estimate)).as(name)
    }
    cum.groupBy(g: _*).agg(max(col("__n")).as("n"), aggs: _*)
  }
}
