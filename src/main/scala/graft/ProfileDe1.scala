package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage profiler for the de1 pipeline — a dev tool. */
object ProfileDe1 {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
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

    (1 to 3).foreach { i =>
      val li = Tables.lineitem(spark, d)
      val cells = li.groupBy(col("l_partkey").as("gene"), col("l_suppkey").as("smp"))
        .agg(sum(col("l_quantity")).as("cnt"))
      time(s"run$i cells agg") { cells.count() }
      val kept = cells
        .withColumn("tot", sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("gene"))))
        .filter(col("tot") >= 10).drop("tot")
      time(s"run$i kept cells") { kept.count() }
      val v = graft.functions.Normalization.vst(kept, "gene", "smp", "cnt")
      time(s"run$i vst") { v.count() }
      val cond = Tables.supplier(spark, d).select(col("s_suppkey"),
        when(col("s_suppkey") % 2 === 0, "NT").otherwise("TP").as("cond"))
      val t = v.select(col("gene"), col("smp"), round(col("vst"), 6).as("val"))
        .join(broadcast(cond), col("smp") === col("s_suppkey"))
        .select(col("gene"), col("cond"), col("val"))
      val wil = graft.functions.Stats.wilcoxon(t, "gene", "cond", "val", "NT", "TP")
      time(s"run$i wilcoxon") { wil.count() }
      val bh = graft.functions.Stats.bhAdjust(wil, "pvalue", "gene")
      time(s"run$i + bh") { bh.count() }
      time(s"run$i full de1") {
        graft.queries.QueryCatalog.byName("de1_pipeline_wilcoxon").run(spark, d).count()
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
