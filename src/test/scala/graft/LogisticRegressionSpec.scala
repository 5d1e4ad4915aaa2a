package graft

import org.apache.spark.sql.functions._
import graft.functions.LogisticRegression
import graft.operators.Dedup

class LogisticRegressionSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic uniform in [0,1) from an id — the engine's portable
    * hash-noise convention (same as the sampling operators). */
  private def u(idCol: org.apache.spark.sql.Column) =
    (Dedup.hash60(idCol.cast("string")) % 1000000L).cast("double") / 1000000.0

  test("recovers planted weights on hash-noise Bernoulli labels") {
    val trueW = Array(0.5, 2.0, -1.5) // intercept, x1, x2
    val df = spark.range(4000)
      .select(col("id"),
        sin(col("id").cast("double") * 0.7).as("x1"),
        cos(col("id").cast("double") * 1.3).as("x2"))
      .withColumn("z", lit(trueW(0)) + col("x1") * trueW(1) + col("x2") * trueW(2))
      .withColumn("mu", lit(1.0) / (lit(1.0) + exp(negate(col("z")))))
      .withColumn("y", (u(col("id")) < col("mu")).cast("int"))
    val fit = LogisticRegression.fit(df, Seq("x1", "x2"), "y")
    assert(fit.converged, s"did not converge in ${fit.iters} iters")
    assert(fit.n == 4000)
    fit.weights.zip(trueW).foreach { case (w, t) =>
      assert(math.abs(w - t) < 0.25, s"weights ${fit.weights.mkString(",")} vs planted ${trueW.mkString(",")}")
    }
    // scoring round-trips: probCol agrees with a driver-side sigmoid
    val r = df.limit(5)
      .select(col("x1"), col("x2"),
        fit.probCol(Seq(col("x1"), col("x2"))).as("p")).collect()
    r.foreach { row =>
      val z = fit.weights(0) + row.getDouble(0) * fit.weights(1) +
        row.getDouble(1) * fit.weights(2)
      assert(math.abs(row.getDouble(2) - 1.0 / (1.0 + math.exp(-z))) < 1e-12)
    }
  }

  test("separable data: ridge keeps the solve finite and classification perfect") {
    val df = spark.range(200)
      .select(col("id"), (col("id") % 2).cast("double").as("x"))
      .withColumn("y", (col("x") > 0.5).cast("int"))
    val fit = LogisticRegression.fit(df, Seq("x"), "y", maxIter = 50, ridge = 1.0)
    assert(fit.weights.forall(w => !w.isNaN && !w.isInfinite))
    val acc = df.select((fit.probCol(Seq(col("x"))) > 0.5).cast("int") === col("y"))
      .collect().count(_.getBoolean(0))
    assert(acc == 200, s"separable fixture misclassified ${200 - acc} rows")
  }
}
