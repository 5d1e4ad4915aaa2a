package graft

import graft.operators.Ranks
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase rank/ntile must be value-identical to the built-in window
  * functions under a total order — including groups smaller than the tile
  * count and group counts that don't divide evenly. */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  // 3 uneven groups (sizes 103, 40, 1) with duplicate order values so the
  // id tiebreak is load-bearing, scattered over 7 input partitions
  private lazy val df = spark.range(0, 144).repartition(7)
    .withColumn("g", when(col("id") < 103, "a").when(col("id") < 143, "b").otherwise("c"))
    .withColumn("v", (col("id") % 11).cast("int"))
    .persist()

  test("rowNumber matches row_number over (g, v, id)") {
    val expect = df.withColumn("rn",
      row_number().over(Window.partitionBy($"g").orderBy($"v", $"id")).cast("long"))
    val got = Ranks.rowNumber(df, Seq($"g"), Seq($"v", $"id")).drop("__n")
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }

  test("rowNumber with no grouping matches a global row_number") {
    val expect = df.withColumn("rn",
      row_number().over(Window.orderBy($"v", $"id")).cast("long"))
    val got = Ranks.rowNumber(df, Nil, Seq($"v", $"id")).drop("__n")
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }

  test("rowNumber handles NULL and descending order keys like the built-in") {
    val withNulls = df.withColumn("vn",
      when(col("id") % 7 === 0, lit(null)).otherwise($"v"))
    val order = Seq($"vn".desc_nulls_last, $"id".desc)
    val expect = withNulls.withColumn("rn", row_number()
      .over(Window.partitionBy($"g").orderBy(order: _*)).cast("long"))
    val got = Ranks.rowNumber(withNulls, Seq($"g"), order).drop("__n")
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }

  test("rowNumber accepts expression grouping keys, not just named columns") {
    val expect = df.withColumn("rn", row_number()
      .over(Window.partitionBy(upper($"g")).orderBy($"v", $"id")).cast("long"))
    val got = Ranks.rowNumber(df, Seq(upper($"g")), Seq($"v", $"id")).drop("__n")
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }

  test("prefixSum and quantiles handle empty input and single rows") {
    val empty = df.filter($"id" < 0)
    assert(Ranks.prefixSum(empty, Seq($"g"), Seq($"id"), $"v").count() === 0)
    assert(Ranks.quantiles(empty, Seq("g"), "v", "id", Seq("p50" -> 0.5))
      .count() === 0)
    val one = df.filter($"id" === 7)
    val cs = Ranks.prefixSum(one, Nil, Seq($"id"), $"v", "cs")
      .select("cs").as[Long].head()
    assert(cs === 7 % 11)
    val q = Ranks.quantiles(one, Seq("g"), "v", "id",
      Seq("p25" -> 0.25, "p100" -> 1.0)).collect().head
    assert(q.getAs[Int]("p25") === 7 % 11 && q.getAs[Int]("p100") === 7 % 11)
  }

  test("quantiles match the sort-and-index definition per group") {
    val got = Ranks.quantiles(df, Seq("g"), "v", "id",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p100" -> 1.0))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Int]("p25"), r.getAs[Int]("p50"),
          r.getAs[Int]("p75"), r.getAs[Int]("p100"))).toMap
    val byGroup = df.select($"g", $"v").as[(String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, vs) <- byGroup) {
      def at(q: Double) = vs(math.ceil(q * vs.length).toInt - 1)
      assert(got(g) === ((vs.length.toLong, at(0.25), at(0.5), at(0.75), at(1.0))),
        s"group $g")
    }
    // the n=1 group: every quantile is the single value
    assert(got("c")._2 === got("c")._5)
  }

  test("quantilesByValue equals the rowwise-rank quantiles on every group") {
    val qs = Seq("p01" -> 0.01, "p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99,
      "p100" -> 1.0)
    val rowwise = Ranks.quantiles(df, Seq("g"), "v", "id", qs)
    val byValue = Ranks.quantilesByValue(df, Seq("g"), "v", qs)
    assert(byValue.columns.toSeq === rowwise.columns.toSeq)
    assert(byValue.except(rowwise).isEmpty && rowwise.except(byValue).isEmpty)
    // empty input: no groups, no rows
    assert(Ranks.quantilesByValue(df.filter($"id" < 0), Seq("g"), "v",
      Seq("p50" -> 0.5)).count() === 0)
  }

  test("quantilesOfClassesBucketed equals the range-exchange form") {
    val qs = Seq("p01" -> 0.01, "p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99,
      "p100" -> 1.0)
    // heavy-tie classes from the fixture
    val cls = df.groupBy($"g", $"v".cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    val want = Ranks.quantilesOfClasses(cls, Seq("g"), "v", "c", qs)
    for (buckets <- Seq(2, 7, 4096)) {
      val got = Ranks.quantilesOfClassesBucketed(cls, Seq("g"), "v", "c",
        qs, nBuckets = buckets)
      assert(got.columns.toSeq === want.columns.toSeq, s"buckets=$buckets")
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"buckets=$buckets:\n${got.collect().mkString("\n")}\nvs\n" +
          want.collect().mkString("\n"))
    }
    // continuous values (every class count 1), skewed + negative, and a
    // constant-valued group (mn == mx) — the degenerate bucket branches
    val rnd = new scala.util.Random(7)
    val data = (1 to 500).map(i =>
      ("a", math.exp(rnd.nextGaussian() * 3) - 10.0)) ++
      (1 to 37).map(i => ("b", rnd.nextDouble())) ++
      (1 to 5).map(_ => ("k", 42.0))
    val cls2 = data.toDF("g", "v").groupBy("g", "v").agg(count(lit(1)).as("c"))
    val want2 = Ranks.quantilesOfClasses(cls2, Seq("g"), "v", "c", qs)
    val got2 = Ranks.quantilesOfClassesBucketed(cls2, Seq("g"), "v", "c", qs)
    assert(got2.except(want2).isEmpty && want2.except(got2).isEmpty)
    // empty input
    assert(Ranks.quantilesOfClassesBucketed(cls.filter(lit(false)),
      Seq("g"), "v", "c", Seq("p50" -> 0.5)).count() === 0)
    // the fact-level wrapper equals the fact-level range-exchange form
    val wantFact = Ranks.quantilesByValue(
      df.select($"g", $"v".cast("double").as("v")), Seq("g"), "v", qs)
    val gotFact = Ranks.quantilesByValueBucketed(
      df.select($"g", $"v".cast("double").as("v")), Seq("g"), "v", qs)
    assert(gotFact.except(wantFact).isEmpty && wantFact.except(gotFact).isEmpty)
  }

  test("prefixSum matches the single-window running total, grouped and global") {
    val expectGrouped = df.withColumn("cs",
      sum($"v").over(Window.partitionBy($"g").orderBy($"v", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val gotGrouped = Ranks.prefixSum(df, Seq($"g"), Seq($"v", $"id"), $"v", "cs")
    assert(gotGrouped.except(expectGrouped).isEmpty &&
      expectGrouped.except(gotGrouped).isEmpty)
    val expectGlobal = df.withColumn("cs",
      sum($"v").over(Window.orderBy($"v", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val gotGlobal = Ranks.prefixSum(df, Nil, Seq($"v", $"id"), $"v", "cs")
    assert(gotGlobal.except(expectGlobal).isEmpty &&
      expectGlobal.except(gotGlobal).isEmpty)
  }

  test("prefixSum accepts value expressions and keeps the input columns") {
    val got = Ranks.prefixSum(df, Nil, Seq($"id"), $"v" * 2, "cs")
    assert(got.columns.toSeq === df.columns.toSeq :+ "cs")
    val last = got.orderBy($"id".desc).select("cs").first().getLong(0)
    val total = df.select(sum($"v" * 2)).first().getLong(0)
    assert(last === total)
  }

  test("ntile matches NTILE(t) for t = 2, 4, 7 including groups with n < t") {
    for (t <- Seq(2, 4, 7)) {
      val expect = df.withColumn("tile",
        ntile(t).over(Window.partitionBy($"g").orderBy($"v", $"id")))
      val got = Ranks.ntile(df, Seq($"g"), Seq($"v", $"id"), t)
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        s"ntile($t) mismatch")
    }
  }

  test("only the per-partition local rank windows the full data; offsets window on agg") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec        => q +: flatten(q.plan)
      case other                    => other +: other.children.flatMap(flatten)
    }
    val out = Ranks.ntile(df, Seq($"g"), Seq($"v", $"id"), 2)
    out.collect()
    val windows = flatten(out.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    // every window that is NOT partitioned by __pid (i.e. the offsets /
    // totals windows) must sit on an aggregate: one row per (g, __pid)
    windows.filterNot(_.partitionSpec.exists(_.toString.contains("__pid"))).foreach { w =>
      val aggBelow = flatten(w.child).exists {
        case _: BaseAggregateExec => true
        case _ => false
      }
      assert(aggBelow,
        s"window input must be an aggregate, not the fact table:\n$w")
    }
  }
}
