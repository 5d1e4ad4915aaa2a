package graft

import graft.functions.Normalization

class NormalizationSpec extends SparkSpec {
  import spark.implicits._

  test("median-of-ratios size factors match hand computation") {
    // g1: s1=1, s2=4 (geomean 2); g2: s1=4, s2=16 (geomean 8)
    // ratios s1: (0.5, 0.5) -> 0.5 ; s2: (2, 2) -> 2
    val df = Seq(("g1", "s1", 1.0), ("g1", "s2", 4.0), ("g2", "s1", 4.0), ("g2", "s2", 16.0))
      .toDF("gene", "smp", "cnt")
    val sf = Normalization.sizeFactors(df, "gene", "smp", "cnt")
      .orderBy("smp").collect()
    assert(sf.map(_.getString(0)).toSeq == Seq("s1", "s2"))
    assert(math.abs(sf(0).getAs[Double]("size_factor") - 0.5) < 1e-12)
    assert(math.abs(sf(1).getAs[Double]("size_factor") - 2.0) < 1e-12)
  }

  test("zero counts are excluded from geometric means (DESeq2 semantics)") {
    val df = Seq(("g1", "s1", 0.0), ("g1", "s2", 8.0), ("g2", "s1", 2.0), ("g2", "s2", 2.0))
      .toDF("gene", "smp", "cnt")
    val sf = Normalization.sizeFactors(df, "gene", "smp", "cnt").collect()
    assert(sf.forall(r => !r.getAs[Double]("size_factor").isNaN))
  }

  test("approx size factors (100 TB path) track the exact ones") {
    // odd gene count: the exact median is a data point, so the only gap
    // left is genuine sketch error (with even n the exact path interpolates
    // between the two middle ratios, which a quantile sketch never does)
    val df = (for { g <- 1 to 41; s <- 1 to 6 }
      yield (s"g$g", s"s$s", (g * s % 23 + 1).toDouble)).toDF("gene", "smp", "cnt")
    val ex = Normalization.sizeFactors(df, "gene", "smp", "cnt")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ap = Normalization.sizeFactors(df, "gene", "smp", "cnt", exact = false)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ex.foreach { case (s, v) => assert(math.abs(ap(s) - v) / v < 0.05, s) }
  }

  test("vst is monotone in counts within a sample") {
    val df = Seq(("g1", "s1", 2.0), ("g2", "s1", 8.0), ("g1", "s2", 3.0), ("g2", "s2", 12.0))
      .toDF("gene", "smp", "cnt")
    val v = Normalization.vst(df, "gene", "smp", "cnt")
      .orderBy("smp", "cnt").select("vst").as[Double].collect()
    assert(v(0) < v(1) && v(2) < v(3))
  }
}
