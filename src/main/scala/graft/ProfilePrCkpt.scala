package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B harness: pageRank's lazy unrolled plan (checkpointEvery ≥
  * iters — the catalog pr1 shape) vs per-round LAZY lineage truncation
  * (checkpointEvery = 1), interleaved in one JVM so box drift cannot
  * masquerade as a win. Values are bit-identical by construction; only
  * plan size per action differs. Usage: runMain graft.ProfilePrCkpt [sfDir] [reps] */
object ProfilePrCkpt {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def edges = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), (col("l_suppkey") + (1L << 40)).as("dst"))

    def t(label: String)(f: => Unit): Unit = {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200); System.gc()
      val t0 = System.nanoTime(); f
      println(f"[ab] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    (1 to reps).foreach { r =>
      t(s"rep$r lazy-unrolled (ckpt=10)") {
        graft.operators.Graphs.pageRank(edges, 4, 0.85, checkpointEvery = 10).count()
      }
      t(s"rep$r per-round-truncated (ckpt=1)") {
        graft.operators.Graphs.pageRank(edges, 4, 0.85, checkpointEvery = 1).count()
      }
    }
    spark.stop()
  }
}
