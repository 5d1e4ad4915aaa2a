package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.slf4j.LoggerFactory

/** Distributed logistic regression — the "train a quality classifier"
  * step of a corpus-curation pipeline (fastText/C4-style: a handful of
  * cheap per-document features, a linear model, a keep/drop score).
  *
  * Scale shape: Newton–Raphson over SUFFICIENT STATISTICS. Each
  * iteration is one `treeAggregate` pass folding every partition into
  * (gradient p, upper-triangular Hessian p², log-likelihood) — O(p²)
  * state for p features (intercept included), merged tree-wise; the
  * p×p solve happens on the DRIVER (microseconds — the same
  * cluster-accumulate / driver-solve split as Pca and the k-means
  * centroid update). No per-row state leaves the executors, no
  * collect of anything data-sized, and the feature frame is persisted
  * once across the ≤ `maxIter` passes. This is the exact shape MLlib's
  * LogisticRegression aggregator uses, specialized to the small-p
  * curation case where Newton (quadratic convergence, ~5 passes)
  * beats first-order methods.
  *
  * Unlike the per-group NB-GLM in [[DiffExpression]] (many small
  * models, one per gene, fit INSIDE a groupByKey), this is ONE global
  * model over the whole corpus — the complementary distributed-GLM
  * shape.
  */
object LogisticRegression {

  private val log = LoggerFactory.getLogger(getClass)

  /** Fitted model: `weights(0)` is the intercept, `weights(i)` pairs
    * with `featCols(i-1)`. */
  final case class Fit(weights: Array[Double], iters: Int, converged: Boolean,
      logLik: Double, n: Long) {
    /** The linear score w·[1, x] as a Column over the same feature columns. */
    def scoreCol(feats: Seq[Column]): Column = {
      require(feats.size + 1 == weights.length, "feature arity mismatch")
      feats.zipWithIndex.foldLeft(lit(weights(0))) { case (acc, (f, i)) =>
        acc + f.cast("double") * weights(i + 1)
      }
    }
    /** P(label=1) as a Column. */
    def probCol(feats: Seq[Column]): Column = {
      val z = scoreCol(feats)
      lit(1.0) / (lit(1.0) + exp(negate(z)))
    }
  }

  /** Per-pass accumulator: gradient, upper-triangular Hessian, log-lik. */
  private final class Acc(val p: Int) extends Serializable {
    val grad = new Array[Double](p)
    val hess = new Array[Double](p * (p + 1) / 2)
    var ll: Double = 0.0
    var n: Long = 0L
    def add(x: Array[Double], y: Double, w: Array[Double]): Acc = {
      var z = 0.0
      var i = 0
      while (i < p) { z += w(i) * x(i); i += 1 }
      // numerically-stable log-lik: log(1+e^z) via softplus
      val mu = 1.0 / (1.0 + math.exp(-z))
      ll += y * z - (if (z > 0) z + math.log1p(math.exp(-z)) else math.log1p(math.exp(z)))
      val r = y - mu
      val v = mu * (1.0 - mu)
      var idx = 0
      i = 0
      while (i < p) {
        grad(i) += r * x(i)
        var j = i
        while (j < p) { hess(idx) += v * x(i) * x(j); j += 1; idx += 1 }
        i += 1
      }
      n += 1
      this
    }
    def merge(o: Acc): Acc = {
      var i = 0
      while (i < p) { grad(i) += o.grad(i); i += 1 }
      i = 0
      while (i < hess.length) { hess(i) += o.hess(i); i += 1 }
      ll += o.ll; n += o.n
      this
    }
  }

  /** Fit `labelCol` (0/1) on `featCols` + intercept. `ridge` is a true
    * L2 penalty on the non-intercept weights (gradient AND Hessian), so
    * the penalized MLE exists — and Newton converges — even under
    * separable or collinear features, where the plain MLE diverges. */
  def fit(df: DataFrame, featCols: Seq[String], labelCol: String,
      maxIter: Int = 25, tol: Double = 1e-9, ridge: Double = 1e-6): Fit = {
    val p = featCols.size + 1
    val rows = df.select(
        array((lit(1.0) +: featCols.map(col(_).cast("double"))): _*).as("x"),
        col(labelCol).cast("double").as("y"))
      .na.drop()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var w = new Array[Double](p)
      var iter = 0
      var converged = false
      var lastLl = Double.NaN
      var nSeen = 0L
      val t0 = System.nanoTime()
      while (iter < maxIter && !converged) {
        val iterT0 = System.nanoTime()
        val wB = w // stable capture for the closure
        val acc = rows.rdd
          .map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
          .treeAggregate(new Acc(p))(
            (a, xy) => a.add(xy._1, xy._2, wB), _.merge(_), depth = 2)
        require(acc.n > 0, "logistic fit over an empty frame")
        // expand the triangle; apply the L2 penalty to gradient and
        // Hessian (intercept unpenalized — standard), solve H delta = g
        val h = Array.ofDim[Double](p, p)
        val g = acc.grad.clone()
        var idx = 0
        var i = 0
        while (i < p) {
          var j = i
          while (j < p) { h(i)(j) = acc.hess(idx); h(j)(i) = acc.hess(idx); j += 1; idx += 1 }
          if (i > 0) { h(i)(i) += ridge; g(i) -= ridge * w(i) }
          i += 1
        }
        val delta = DiffExpression.solveInPlace(h, g)
          .getOrElse(throw new IllegalStateException(
            "singular Hessian despite ridge — degenerate features"))
        var maxStep = 0.0
        i = 0
        val w2 = w.clone()
        while (i < p) { w2(i) += delta(i); maxStep = math.max(maxStep, math.abs(delta(i))); i += 1 }
        w = w2
        lastLl = acc.ll
        nSeen = acc.n
        converged = maxStep < tol
        iter += 1
        // every iteration logs its wall time (r10 verdict #6: lr1's one
        // out-of-band driver number could not be decomposed into
        // iteration count × per-pass cost without this)
        log.info(s"logreg iter=$iter ll=${acc.ll} maxStep=$maxStep " +
          f"iterSec=${(System.nanoTime() - iterT0) / 1e9}%.3f")
        if (!converged && iter == maxIter)
          log.warn(s"logreg hit maxIter=$maxIter (maxStep=$maxStep)")
      }
      log.info(f"logreg done: iters=$iter converged=$converged " +
        f"totalSec=${(System.nanoTime() - t0) / 1e9}%.3f")
      Fit(w, iter, converged, lastLl, nSeen)
    } finally rows.unpersist(blocking = false)
  }
}
