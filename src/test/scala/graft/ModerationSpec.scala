package graft

import graft.functions.Moderation
import org.scalatest.funsuite.AnyFunSuite

/** The driver-side EB variance-prior math behind `wt2`: special
  * functions against published values, the trigamma inversion, and the
  * moment fit recovering a planted prior from scaled-chi-square draws. */
class ModerationSpec extends SparkSpec {
  import spark.implicits._

  test("digamma matches published values") {
    // Abramowitz & Stegun 6.3: psi(1) = -gamma, psi(0.5) = -gamma - 2 ln 2,
    // psi(2) = 1 - gamma
    val gamma = 0.5772156649015329
    assert(math.abs(Moderation.digamma(1.0) + gamma) < 1e-10)
    assert(math.abs(Moderation.digamma(0.5) + gamma + 2 * math.log(2)) < 1e-10)
    assert(math.abs(Moderation.digamma(2.0) - (1 - gamma)) < 1e-10)
    // recurrence consistency far from the series region
    assert(math.abs(Moderation.digamma(10.5) - Moderation.digamma(9.5) - 1.0 / 9.5) < 1e-12)
  }

  test("trigamma matches published values and is monotone decreasing") {
    // psi'(1) = pi^2/6, psi'(0.5) = pi^2/2, psi'(2) = pi^2/6 - 1
    val p6 = math.Pi * math.Pi / 6.0
    assert(math.abs(Moderation.trigamma(1.0) - p6) < 1e-10)
    assert(math.abs(Moderation.trigamma(0.5) - 3 * p6) < 1e-10)
    assert(math.abs(Moderation.trigamma(2.0) - (p6 - 1)) < 1e-10)
    val xs = Seq(0.1, 0.5, 1.0, 2.0, 5.0, 10.0, 100.0)
    xs.sliding(2).foreach { case Seq(a, b) =>
      assert(Moderation.trigamma(a) > Moderation.trigamma(b))
    }
  }

  test("trigammaInverse round-trips across the practical range") {
    Seq(0.01, 0.1, 0.5, 1.0, 2.0, 10.0, 100.0).foreach { x =>
      val v = Moderation.trigamma(x)
      val back = Moderation.trigammaInverse(v)
      assert(math.abs(back - x) < 1e-6 * math.max(1.0, x), s"x=$x back=$back")
    }
  }

  test("fitVariancePrior recovers a planted (d0, s0^2) from F-distributed variances") {
    // s2_g ~ s0^2 * (chi2_df / df) / (chi2_d0 / d0) is the marginal of the
    // limma model; draw deterministically via inverse-free sum-of-squares
    // of seeded gaussians
    val rnd = new scala.util.Random(42)
    val d0 = 8.0; val s02 = 2.5; val df = 8
    def chi2(k: Int): Double =
      (1 to k).map(_ => { val g = rnd.nextGaussian(); g * g }).sum
    val s2s = (1 to 4000).map { _ =>
      s02 * (chi2(df) / df) / (chi2(d0.toInt) / d0)
    }
    val gv = s2s.map(s2 => (df.toDouble, s2)).toDF("df", "s2")
    val (fd0, fs02) = Moderation.fitVariancePrior(gv)
    assert(math.abs(fd0 - d0) / d0 < 0.25, s"d0 fitted $fd0 vs $d0")
    assert(math.abs(fs02 - s02) / s02 < 0.10, s"s0^2 fitted $fs02 vs $s02")
  }

  test("fitVariancePrior degenerates to complete pooling when variances are constant") {
    val gv = (1 to 100).map(_ => (8.0, 1.5)).toDF("df", "s2")
    val (d0, s02) = Moderation.fitVariancePrior(gv)
    assert(d0 >= 1e7, s"constant variances must give an ~infinite prior df, got $d0")
    // with zero scatter the prior scale is exp(mean(e)); for constant s2
    // it sits at s2 times the chi-square log-mean bias factor
    // exp(log(df/2) - digamma(df/2))
    val bias = math.exp(math.log(4.0) - Moderation.digamma(4.0))
    assert(math.abs(s02 - 1.5 * bias) < 1e-9, s"s0^2=$s02")
  }

  test("wt2 catalog query: moderation shrinks toward the prior and keeps z finite") {
    val out = graft.queries.QueryCatalog.byName("wt2_moderated_z")
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val s02 = graft.queries.FrozenModels.wtPriorS2
    out.foreach { r =>
      val s2p = r.getAs[Double]("s2_post")
      val p = r.getAs[Double]("pvalue")
      assert(s2p > 0, s"s2_post must be positive: $r")
      assert(p >= 0 && p <= 1, s"pvalue: $r")
    }
    // shrinkage: the spread of posterior variances must be tighter around
    // the prior than the raw pooled variances' spread (the point of EB)
    val wide = out.map(_.getAs[Double]("s2_post"))
    assert(wide.max - wide.min < 50 * s02, "posterior variances unbounded?")
  }
}
