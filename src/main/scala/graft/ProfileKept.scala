package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved A/B of the D1 prefilter (keptCells) forms — WINDOW = the
  * committed shape (per-gene running total over the cells frame: one
  * hash exchange + sort of every (gene, sample) row), JOIN = per-gene
  * totals agg + broadcast semi-join (the totals branch re-reads the
  * cells subtree; whether that costs a second fact pass depends on
  * exchange reuse, which this tool checks in the printed plan). Times
  * the bare materialization AND the de1-shaped downstream (VST +
  * Wilcoxon) so the verdict reflects a real consumer. */
object ProfileKept {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def cells: DataFrame = Tables.lineitem(spark, d)
      .groupBy(col("l_partkey").as("gene"), col("l_suppkey").as("smp"))
      .agg(sum(col("l_quantity")).as("cnt"))

    def windowForm: DataFrame = cells
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(col("gene"))))
      .filter(col("tot") >= 10)
      .drop("tot")

    def joinForm: DataFrame = {
      val c = cells
      val keep = c.groupBy("gene").agg(sum(col("cnt")).as("tot"))
        .filter(col("tot") >= 10).select("gene")
      c.join(broadcast(keep), "gene")
    }

    def fingerprint(df: DataFrame): String = {
      val r = df.agg(count(lit(1)), sum(col("gene")), sum(col("smp")),
        sum(col("cnt"))).collect()(0)
      s"n=${r.get(0)} g=${r.get(1)} s=${r.get(2)} c=${r.get(3)}"
    }

    def run(tag: String, f: => DataFrame): Unit = {
      System.gc(); Thread.sleep(200); System.gc()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[prof] $tag%-8s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    println("[prof] parity WIN : " + fingerprint(windowForm))
    println("[prof] parity JOIN: " + fingerprint(joinForm))
    val jp = joinForm.queryExecution.executedPlan.toString
    println("[prof] join-form plan has ReusedExchange: " +
      jp.contains("ReusedExchange") + "; scans: " +
      "FileScan".r.findAllIn(jp).length)
    run("warmW", windowForm); run("warmJ", joinForm)
    (1 to 4).foreach { i => run(s"win$i", windowForm); run(s"join$i", joinForm) }
    spark.stop()
  }
}
