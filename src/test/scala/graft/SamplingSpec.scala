package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (1 to n).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
    .toDF("id", "grp")

  test("hash sample is deterministic under any partitioning") {
    val df = ids(2000)
    val s1 = Sampling.hashSample(df.repartition(7), col("id"), 0.3)
      .select("id").as[Long].collect().sorted
    val s2 = Sampling.hashSample(df.repartition(3), col("id"), 0.3)
      .select("id").as[Long].collect().sorted
    assert(s1.sameElements(s2))
    assert(s1.nonEmpty)
  }

  test("samples nest: rate 0.1 is a subset of rate 0.3") {
    val df = ids(2000)
    val small = Sampling.hashSample(df, col("id"), 0.1)
      .select("id").as[Long].collect().toSet
    val big = Sampling.hashSample(df, col("id"), 0.3)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big))
    assert(small.nonEmpty && big.size > small.size)
  }

  test("rates land near their targets and rate 1.0 keeps everything") {
    val df = ids(5000)
    val frac = Sampling.hashSample(df, col("id"), 0.25).count().toDouble / 5000
    assert(math.abs(frac - 0.25) < 0.05, s"got $frac")
    assert(Sampling.hashSample(df, col("id"), 1.0).count() === 5000)
    assert(Sampling.hashSample(df, col("id"), 0.0).count() === 0)
  }

  test("stratified sample applies the per-stratum rate") {
    val df = ids(4000)
    val out = Sampling.stratifiedHashSample(df, col("id"), col("grp"),
      Map("a" -> 0.5, "b" -> 0.0))
    assert(out.filter(col("grp") === "b").count() === 0)
    val fracA = out.filter(col("grp") === "a").count().toDouble / 2000
    assert(math.abs(fracA - 0.5) < 0.06, s"got $fracA")
    // strata not in the map fall to defaultRate
    val withDefault = Sampling.stratifiedHashSample(df, col("id"), col("grp"),
      Map("a" -> 0.5), defaultRate = 1.0)
    assert(withDefault.filter(col("grp") === "b").count() === 2000)
  }

  test("sampling is a narrow filter: no shuffle in the plan") {
    val df = ids(100)
    val plan = Sampling.hashSample(df, col("id"), 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("resamplers keep null-stratum rows at their census rate") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // 40 rows per stratum incl. a NULL stratum: the null group is a
    // census group like any other and must survive the rate join
    val df = (1 to 120).map(i =>
      (i.toLong, if (i % 3 == 2) null else s"s${i % 3}")).toDF("id", "dom")
    val kept = Sampling.temperatureResample(df, col("id"), col("dom"),
      alpha = 1.0, budget = 1.0)
    assert(kept.count() == 120L) // budget 1.0 keeps everything, nulls included
    assert(kept.filter(col("dom").isNull).count() == 40L)
    val mixed = Sampling.mixtureResample(df, col("id"), col("dom"),
      w => when(w.isNull, lit(0.5)).otherwise(lit(0.25)), budget = 1.0)
    assert(mixed.filter(col("dom").isNull).count() === 40L)
  }

  test("temperatureResample: alpha=1 thins uniformly, alpha=0 targets equal counts") {
    // skewed strata: 1800 of "a", 200 of "b"
    val df = (1 to 2000).map(i => (i.toLong, if (i <= 1800) "a" else "b"))
      .toDF("id", "grp")
    // alpha = 1: q_s = n_s/N, so every stratum's rate is exactly the budget
    val natural = Sampling.temperatureResample(df, col("id"), col("grp"), 1.0, 0.5)
    val natRates = natural.select("grp", "sample_rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(natRates("a") == 0.5 && natRates("b") == 0.5, natRates)
    // alpha = 0: q_s uniform, expected kept counts equal across strata
    // (rate_b caps at 1.0 since budget*N/2 = 500 > n_b = 200)
    val uniform = Sampling.temperatureResample(df, col("id"), col("grp"), 0.0, 0.5)
    val uniRates = uniform.select("grp", "sample_rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(uniRates("b") == 1.0, uniRates)
    assert(math.abs(uniRates("a") - 500.0 / 1800) < 1e-6, uniRates)
    // the kept set is the hash predicate's: nested under a bigger budget
    val bigger = Sampling.temperatureResample(df, col("id"), col("grp"), 1.0, 0.8)
    assert(natural.select("id").exceptAll(bigger.select("id")).isEmpty)
    // empty input: empty output, no crash
    val empty = Sampling.temperatureResample(df.filter(col("id") < 0),
      col("id"), col("grp"), 0.7, 0.5)
    assert(empty.count() == 0)
  }
}
