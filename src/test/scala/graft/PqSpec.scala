package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Pq

class PqSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // Deterministic 16-dim vectors with planted cluster structure: 4 groups
  // around distinct anchors + small per-row jitter, so subspace k-means
  // has real centroids to find.
  private def mkVec(i: Int): Array[Double] = {
    val g = i % 4
    Array.tabulate(16) { j =>
      val anchor = math.sin((g + 1) * (j + 1) * 0.37) * 2.0
      anchor + 0.05 * math.sin(i * 13.7 + j * 2.1)
    }
  }

  private lazy val emb = (0 until 200)
    .map(i => (i.toLong, mkVec(i).toSeq))
    .toDF("vec_id", "embedding")

  private lazy val model = Pq.fit(emb, "embedding", m = 4, ksub = 8, iters = 10)

  test("fit shapes: m codebooks of ksub centroids, dsub dims each") {
    model.m shouldBe 4
    model.dsub shouldBe 4
    model.ksub shouldBe 8
    model.books.foreach { book =>
      book.length shouldBe 8
      book.foreach(_.length shouldBe 4)
    }
  }

  test("fit is deterministic across repeated runs and input layouts") {
    val again = Pq.fit(emb.repartition(7), "embedding", m = 4, ksub = 8, iters = 10)
    again.books.flatten.flatten.toSeq shouldBe model.books.flatten.flatten.toSeq
  }

  test("encode emits one in-range code per subspace, deterministically") {
    val codes = Pq.encode(emb, "embedding", model)
      .select(col("vec_id"), col("code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    codes.size shouldBe 200
    codes.values.foreach { cs =>
      cs.length shouldBe 4
      cs.foreach { c => c should be >= 0; c should be < 8 }
    }
    val again = Pq.encode(emb.repartition(5), "embedding", model)
      .select(col("vec_id"), col("code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    again shouldBe codes
  }

  test("ADC distance equals exact distance to the decoded reconstruction") {
    val q = mkVec(3)
    val codes = Pq.encode(emb, "embedding", model)
    val qLit = typedlit(q.toSeq)
    val both = Pq.adcScores(codes, model, q)
      .withColumn("recon", Pq.decode(col("code"), model))
      .withColumn("exact_d2",
        aggregate(zip_with(qLit, col("recon"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x))
      .select("adc_d2", "exact_d2").collect()
    both.length shouldBe 200
    both.foreach { r =>
      r.getDouble(0) shouldBe r.getDouble(1) +- 1e-9
    }
  }

  test("reconstruction distortion beats the 1-centroid (global mean) quantizer") {
    val vecs = (0 until 200).map(mkVec)
    val mean = Array.tabulate(16)(j => vecs.map(_(j)).sum / vecs.size)
    val baseline = vecs.map(v =>
      v.zip(mean).map { case (x, m) => (x - m) * (x - m) }.sum).sum / vecs.size
    val codes = Pq.encode(emb, "embedding", model)
    val recon = codes
      .withColumn("recon", Pq.decode(col("code"), model))
      .select(col("vec_id"), col("recon")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val mse = (0 until 200).map { i =>
      val v = mkVec(i); val rc = recon(i.toLong)
      v.zip(rc).map { case (x, y) => (x - y) * (x - y) }.sum
    }.sum / 200.0
    // planted 4-cluster structure: PQ with 8 codes/subspace must beat the
    // single-centroid quantizer by a wide margin, not ulps
    mse should be < baseline * 0.25
  }

  test("ADC top-k recalls the exact nearest neighbours on clustered data") {
    val q = mkVec(7) // group 3
    val codes = Pq.encode(emb, "embedding", model)
    val adcTop = Pq.adcTopK(codes, model, q, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exactTop = (0 until 200).map { i =>
      val v = mkVec(i)
      (v.zip(q).map { case (x, y) => (x - y) * (x - y) }.sum, i.toLong)
    }.sortBy(identity).take(10).map(_._2).toSet
    // jitter ≪ anchor separation: compressed search must keep most of
    // the true neighbourhood
    (adcTop & exactTop).size should be >= 6
  }

  test("catalog pq1 runs on the sf0.001 fixtures with bounded output") {
    val out = graft.queries.QueryCatalog.byName("pq1_product_quantize")
      .run(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    rows.length shouldBe 30 // 3 queries × top-10
    rows.map(_.getLong(0)).toSet shouldBe Set(0L, 100L, 200L)
    // the query row itself is its own nearest compressed neighbour more
    // often than not; at minimum every ADC distance is finite and ≥ 0
    rows.foreach(r => r.getDouble(2) should be >= 0.0)
  }
}
