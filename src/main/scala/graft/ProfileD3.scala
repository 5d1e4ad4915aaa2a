package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{CountCell, DiffExpression, Stats}

/** Stage-by-stage profiler for d3/d4 — a dev tool, not library surface:
  * separates the dispersion-prior job, the per-gene fit, and the BH pass
  * so regressions in any one stage are visible in isolation. */
object ProfileD3 {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

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

    def run(tag: String): Unit = {
      val cellsDf = graft.queries.DomainQueries.profileNbInput(spark, d, 2)
      val cells = cellsDf.as[CountCell]
      val prior = time(s"$tag prior (1 job, kc+sf mat)") {
        DiffExpression.dispersionPrior(cells, 2)
      }
      val de = DiffExpression.waldTest(cells, Seq("NT", "TP"), Some(prior)).toDF()
      time(s"$tag fit count (no persist)") { de.count() }
      val out = Stats.bhAdjust(de, "pvalue", "gene")
        .withColumn("p_signif", Stats.signifBand(col("padj")))
      time(s"$tag bh+band count") { out.count() }
      spark.catalog.clearCache(); System.gc()
    }
    // the real catalog query end-to-end (prior + fit + results() with its
    // independent-filtering collects + banding) — what the bench times
    def runFull(tag: String): Unit = {
      val q = graft.queries.QueryCatalog.byName("d3_nbglm_wald")
      time(s"$tag full catalog d3") { q.run(spark, d).count() }
      spark.catalog.clearCache(); System.gc()
    }
    // results() in isolation over a persisted fit frame: separates the
    // quantile collect / rejection-count collect / final join from the fit
    def runResults(tag: String): Unit = {
      val cellsDf = graft.queries.DomainQueries.profileNbInput(spark, d, 2)
      val cells = cellsDf.as[CountCell]
      val prior = DiffExpression.dispersionPrior(cells, 2)
      val de = DiffExpression.waldTest(cells, Seq("NT", "TP"), Some(prior))
        .toDF().persist()
      de.count() // fit materialized OUTSIDE the timed region
      val out = time(s"$tag results() given fit") {
        val r = DiffExpression.results(de)
          .withColumn("p_signif", Stats.signifBand(col("padj")))
        r.count()
      }
      de.unpersist()
      spark.catalog.clearCache(); System.gc()
    }
    run("warm0"); runFull("warm0"); run("warm1"); run("run A"); run("run B")
    runFull("run A"); runFull("run B")
    runResults("run A"); runResults("run B")
    spark.stop()
  }
}
