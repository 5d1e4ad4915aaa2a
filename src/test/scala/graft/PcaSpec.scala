package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Pca

class PcaSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("jacobiEigen solves a known symmetric system") {
    // A = [[2,1],[1,2]] → eigenvalues {1, 3}
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    vals.sorted.zip(Seq(1.0, 3.0)).foreach { case (a, b) => a shouldBe b +- 1e-12 }
    // residual ‖Av − λv‖ ≈ 0 for each pair
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    for (c <- 0 until 2) {
      val v = Array(vecs(0)(c), vecs(1)(c))
      val av = Array(dot(a(0), v), dot(a(1), v))
      av.zip(v.map(_ * vals(c))).foreach { case (x, y) => x shouldBe y +- 1e-12 }
    }
  }

  test("fit on a planted low-rank dataset recovers the structure") {
    // rank-2 signal in 8 dims + tiny deterministic jitter
    val rows = (1 to 400).map { i =>
      val t1 = math.sin(i * 0.7); val t2 = math.cos(i * 1.3)
      Array.tabulate(8)(j =>
        t1 * (j + 1) / 8.0 + t2 * (if (j % 2 == 0) 1.0 else -1.0) * 0.5 +
          1e-4 * math.sin(i * 31.0 + j)) // jitter breaks exact degeneracy
    }
    val df = rows.map(r => Tuple1(r.toSeq)).toDF("v")
    val model = Pca.fit(df, "v", 4)
    // eigenvalues descending, top-2 carry essentially all variance
    model.eigenvalues.sliding(2).foreach {
      case Array(a, b) => a should be >= b
      case _ => ()
    }
    model.explainedRatio.take(2).sum shouldBe 1.0 +- 1e-4
    // components orthonormal
    for (k <- 0 until 4; l <- k until 4) {
      val ck = model.components.slice(k * 8, k * 8 + 8)
      val cl = model.components.slice(l * 8, l * 8 + 8)
      dot(ck, cl) shouldBe (if (k == l) 1.0 else 0.0) +- 1e-9
    }
  }

  test("projected data has diagonal covariance = eigenvalues") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val model = Pca.fit(df, "embedding", 4)
    val proj = Pca.project(df, "embedding", model)
      .select(col("proj")).collect().map(_.getSeq[Double](0).toArray)
    val n = proj.length.toDouble
    val mean = Array.tabulate(4)(k => proj.map(_(k)).sum / n)
    for (k <- 0 until 4; l <- k until 4) {
      val c = proj.map(p => (p(k) - mean(k)) * (p(l) - mean(l))).sum / (n - 1)
      if (k == l) c shouldBe model.eigenvalues(k) +- 1e-6 * (1 + model.eigenvalues(k))
      else c shouldBe 0.0 +- 1e-6
    }
    // projections are centered (mean ≈ 0: mat_vec_project subtracts the mean)
    mean.foreach(_ shouldBe 0.0 +- 1e-9)
  }

  test("fit is layout-invariant up to float association") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val m7 = Pca.fit(df.repartition(7), "embedding", 3)
    val m3 = Pca.fit(df.repartition(3), "embedding", 3)
    m7.eigenvalues.zip(m3.eigenvalues).foreach { case (a, b) =>
      a shouldBe b +- 1e-8 * (1 + math.abs(a))
    }
    m7.components.zip(m3.components).foreach { case (a, b) =>
      a shouldBe b +- 1e-6
    }
  }

  test("mat_vec_project matches a hand-rolled projection, interpreted and codegen") {
    graft.expressions.GraftFunctions.register(spark)
    val df = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(-1.0, 0.5, 0.0)))
      .toDF("id", "v")
    // 2×3 matrix [[1,0,1],[0,2,-1]], center [1,1,1]
    val out = df.select(col("id"), call_function("mat_vec_project", col("v"),
        typedlit(Seq(1.0, 0.0, 1.0, 0.0, 2.0, -1.0)),
        typedlit(Seq(1.0, 1.0, 1.0))).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    out(1L) shouldBe Seq((1 - 1) * 1.0 + (3 - 1) * 1.0, (2 - 1) * 2.0 + (3 - 1) * -1.0)
    out(2L) shouldBe Seq(-2.0 + 0 - 1.0, -0.5 * 2.0 + -1.0 * -1.0)
  }
}
