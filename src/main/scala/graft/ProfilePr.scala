package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for PageRank: times the edge build and each
  * iteration count separately. Usage: runMain graft.ProfilePr [sfDir] */
object ProfilePr {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def edges = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
    t("edge build + distinct count")(
      println("  distinct edges: " + edges.distinct().count()))
    for (it <- Seq(1, 2, 4)) {
      t(s"pageRank iters=$it") {
        graft.operators.Graphs.pageRank(edges, it).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
