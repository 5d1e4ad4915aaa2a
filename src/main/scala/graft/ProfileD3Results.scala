package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{CountCell, DiffExpression, Stats}

/** Interleaved same-JVM A/B of DESeq2 `results()` post-processing forms —
  * a dev tool for the r17 decision "do the two driver collects cost real
  * wall time?": OLD = collect quantiles → collect rejection counts →
  * filter by the driver-computed θ (the pre-r17 shape, inlined here);
  * NEW = the library's in-plan form (DiffExpression.results). Both run
  * over the same persisted fit frame, alternating, and print per-rep
  * seconds plus the output fingerprint (count + padj checksum) so value
  * parity is checked in the same breath. */
object ProfileD3Results {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // one fit, persisted: both arms post-process the same frame
    val cellsDf = graft.queries.DomainQueries.profileNbInput(spark, d, 2)
    val cells = cellsDf.as[CountCell]
    val prior = DiffExpression.dispersionPrior(cells, 2)
    val de = DiffExpression.waldTest(cells, Seq("NT", "TP"), Some(prior))
      .toDF().persist()
    de.count()

    val alpha = 0.1
    def oldResults(in: DataFrame): DataFrame = {
      val universe = in.filter(!col("cooks_outlier") && col("pvalue").isNotNull)
      val probs = (0 until 20).map(_ * 0.05)
      val qRow = universe
        .agg(expr(s"percentile(base_mean, array(${probs.mkString(",")}))"))
        .collect()(0)
      val theta =
        if (qRow.isNullAt(0)) 0.0
        else {
          val cands = qRow.getSeq[Double](0).distinct.sorted.zipWithIndex
            .map { case (th, i) => (i, th) }
          val candDf = in.sparkSession.createDataFrame(cands).toDF("tid", "theta")
          val wRank = Window.partitionBy(col("tid"))
            .orderBy(col("pvalue").asc, col("gene").asc)
          val wAll = Window.partitionBy(col("tid"))
          val rej = universe.select(col("gene"), col("pvalue"), col("base_mean"))
            .join(broadcast(candDf), col("base_mean") >= col("theta"))
            .withColumn("rnk", row_number().over(wRank))
            .withColumn("m", count(lit(1)).over(wAll))
            .groupBy("tid", "theta")
            .agg(max(when(col("pvalue") <= lit(alpha) * col("rnk") / col("m"),
              col("rnk")).otherwise(0L)).as("rej"))
            .collect()
          val best = rej.map(_.getAs[Long]("rej")).max
          rej.filter(_.getAs[Long]("rej") == best)
            .map(_.getAs[Double]("theta")).min
        }
      val adj = Stats.bhAdjust(universe.filter(col("base_mean") >= theta),
          "pvalue", "gene")
        .select(col("gene"), col("padj"))
      in.join(adj, Seq("gene"), "left")
        .withColumn("pvalue",
          when(col("cooks_outlier"), lit(null).cast("double"))
            .otherwise(col("pvalue")))
    }

    def fingerprint(df: DataFrame): String = {
      val r = df.agg(count(lit(1)), sum(round(col("padj"), 6)),
        sum(round(col("pvalue"), 6))).collect()(0)
      s"n=${r.get(0)} padjSum=${r.get(1)} pSum=${r.get(2)}"
    }

    def run(tag: String, f: DataFrame => DataFrame): Unit = {
      System.gc(); Thread.sleep(200); System.gc()
      val t0 = System.nanoTime()
      val out = f(de)
      val n = out.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $tag%-6s ${dt}%7.3f s  (rows $n)")
    }

    println("[prof] parity OLD: " + fingerprint(oldResults(de)))
    println("[prof] parity NEW: " + fingerprint(DiffExpression.results(de)))
    // warmup one of each, then 4 interleaved reps per arm
    run("warmO", oldResults); run("warmN", DiffExpression.results(_))
    (1 to 4).foreach { i =>
      run(s"old$i", oldResults)
      run(s"new$i", DiffExpression.results(_))
    }
    spark.stop()
  }
}
