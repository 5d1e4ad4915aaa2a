package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empirical-Bayes variance moderation, the limma `squeezeVar` shape
  * (Smyth 2004 "Linear models and empirical Bayes methods..."): per-gene
  * residual variances s²_g with df_g degrees of freedom are modeled as
  * scaled F draws around a prior (d0, s0²); the posterior variance
  *
  *   s²_post = (d0·s0² + df_g·s²_g) / (d0 + df_g)
  *
  * shrinks noisy per-gene variances toward the cross-gene trend, which is
  * what makes moderated tests beat per-gene Welch at small n. The PRIOR
  * fit below is Smyth's closed moment-matching on log variances (his
  * eq. 3-6): iterative only in the 1-D trigamma inversion, so it runs
  * driver-side on two collected moments — the [[DiffExpression
  * .dispersionPrior]] 1-row-broadcast shape. The APPLY stage is pure
  * column arithmetic (see the `wt2` catalog query).
  *
  * Scale shape of [[fitVariancePrior]]: ONE distributed aggregation of
  * the gene-level frame, grouped by the (bounded) distinct df values —
  * per-df sufficient statistics for the log-variance mean/var plus the
  * per-df digamma/trigamma corrections, then scalar math. Nothing
  * gene-sized ever reaches the driver.
  */
object Moderation {

  /** Digamma ψ(x) for x > 0: recurrence up to x ≥ 10, then the standard
    * asymptotic series (|err| < 5e-11 there). */
  def digamma(x0: Double): Double = {
    require(x0 > 0, s"digamma domain: $x0")
    var x = x0
    var acc = 0.0
    while (x < 10.0) { acc -= 1.0 / x; x += 1.0 }
    val inv = 1.0 / x
    val inv2 = inv * inv
    acc + math.log(x) - 0.5 * inv -
      inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0))
  }

  /** Trigamma ψ′(x) for x > 0: recurrence up to x ≥ 10, then the
    * asymptotic series (|err| < 1e-12 there). Monotone decreasing on (0, ∞). */
  def trigamma(x0: Double): Double = {
    require(x0 > 0, s"trigamma domain: $x0")
    var x = x0
    var acc = 0.0
    while (x < 10.0) { acc += 1.0 / (x * x); x += 1.0 }
    val inv = 1.0 / x
    val inv2 = inv * inv
    acc + inv * (1.0 + inv * (0.5 + inv * (1.0 / 6.0 -
      inv2 * (1.0 / 30.0 - inv2 * (1.0 / 42.0 - inv2 / 30.0)))))
  }

  /** Inverse of trigamma by bisection (trigamma is strictly decreasing,
    * range (0, ∞) → deterministic to ~1e-12 relative in ~110 halvings —
    * limma uses Newton; bisection trades a few iterations for
    * unconditional convergence and bit-stable determinism). */
  def trigammaInverse(v: Double): Double = {
    require(v > 0, s"trigammaInverse domain: $v")
    var lo = 1e-8
    var hi = 1e8
    // trigamma(1e-8) ~ 1e16, trigamma(1e8) ~ 1e-8: v outside that range
    // clamps to the bracket edge (limma's guard rails behave the same)
    var i = 0
    while (i < 120) {
      val mid = 0.5 * (lo + hi)
      if (trigamma(mid) > v) lo = mid else hi = mid
      i += 1
    }
    0.5 * (lo + hi)
  }

  /** Fit the variance prior (d0, s0²) from a gene-level frame carrying
    * `dfCol` (residual df, > 0) and `s2Col` (residual variance, > 0 —
    * zero-variance genes carry no information about the prior and are
    * excluded here, exactly like limma's `out$var.prior` path drops
    * non-positive variances before taking logs).
    *
    * Smyth's moment match on e_g = log s²_g − ψ(df_g/2) + log(df_g/2):
    * E[e] = log s0² − ψ(d0/2) + log(d0/2) (so log s0² = mean(e) +
    * ψ(d0/2) − log(d0/2), as implemented) and Var[e] ≈ ψ′(d0/2) +
    * mean ψ′(df_g/2)… rearranged: d0 = 2·ψ′⁻¹(var(e) − mean ψ′(df_g/2)),
    * then s0² from the mean equation. A non-positive corrected variance
    * means the s²_g scatter is no wider than sampling noise — the prior
    * is effectively infinite-df (complete pooling): d0 is returned as
    * 1e8 with s0² = exp(mean(e)), limma's `df.prior = Inf` branch.
    *
    * @return (d0, s0²) */
  def fitVariancePrior(geneVars: DataFrame, dfCol: String = "df",
      s2Col: String = "s2"): (Double, Double) = {
    val perDf = geneVars
      .filter(col(dfCol) > 0 && col(s2Col) > 0)
      .groupBy(col(dfCol).cast("double").as("dfv"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(log(col(s2Col))).as("sl"),
        sum(log(col(s2Col)) * log(col(s2Col))).as("sl2"))
      .collect()
    require(perDf.nonEmpty, "fitVariancePrior: no usable gene variances")
    // fold per-df sums into moments of e = log s2 + c(df), where
    // c(df) = log(df/2) − ψ(df/2) is constant within a df group:
    // Σe = Σlog s2 + n·c ; Σe² = Σlog²s2 + 2c·Σlog s2 + n·c²
    var n = 0.0; var se = 0.0; var se2 = 0.0; var str = 0.0
    perDf.foreach { r =>
      val dfv = r.getAs[Double]("dfv"); val ng = r.getAs[Double]("n")
      val sl = r.getAs[Double]("sl"); val sl2 = r.getAs[Double]("sl2")
      val c = math.log(dfv / 2.0) - digamma(dfv / 2.0)
      n += ng
      se += sl + ng * c
      se2 += sl2 + 2.0 * c * sl + ng * c * c
      str += ng * trigamma(dfv / 2.0)
    }
    val emean = se / n
    if (n < 2) return (1e8, math.exp(emean))
    // limma's n/(n-1) small-sample factor on the raw second moment
    val evar = (se2 - n * emean * emean) / (n - 1.0) - str / n
    if (evar <= 0) (1e8, math.exp(emean))
    else {
      val d0 = 2.0 * trigammaInverse(evar)
      val s02 = math.exp(emean + digamma(d0 / 2.0) - math.log(d0 / 2.0))
      (d0, s02)
    }
  }
}
